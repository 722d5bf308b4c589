package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). Parquet scans are the only physical source
  * here, so Catalyst predicate pushdown / column pruning apply to every
  * downstream query — check `.explain` for PushedFilters / ReadSchema.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet; with
    * spark.sql.legacy.parquet.nanosAsLong=true it loads as long ns —
    * normalize to a microsecond TimestampType column (lossless here: the
    * generator emits µs-precision values). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType.typeName match {
      // nanos → micros by INTEGER division: `/` on longs is double division
      // in Spark SQL, and a double cannot hold 2024-epoch nanoseconds
      // exactly (53-bit mantissa) — the ±hundreds-of-ns error shows up as
      // off-by-one-microsecond timestamps under µs-exact comparisons
      case "long" => raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
