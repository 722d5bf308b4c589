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
  /** events.ts normalized to session-zoned TimestampType whatever the
    * parquet encoding. The driver has shipped the column as
    * TIMESTAMP(NANOS) (loads as long ns under
    * spark.sql.legacy.parquet.nanosAsLong) and as timestamp[us] (loads as
    * TIMESTAMP_NTZ in Spark 4) across rounds — TimeAxis.normalize handles
    * both: ns-long via INTEGER µs division (`/` on longs is double
    * division in Spark SQL, and a double cannot hold 2024-epoch
    * nanoseconds exactly — 53-bit mantissa — so the ±hundreds-of-ns error
    * shows up as off-by-one-µs timestamps under µs-exact comparisons),
    * NTZ via an instant-preserving cast (session TZ is UTC). */
  def events(s: SparkSession, d: String): DataFrame =
    graft.ops.TimeAxis.normalize(table(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
