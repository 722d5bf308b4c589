package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import graft.core.{AtomRow, Receipt, TagRow, Transactor, ValueRow}

/** Durable tx-log tail — the change-data feed behind live subscriptions
  * (SURVEY §2.9: "Delta CDF or tx-log tail"). Each transaction's delta is
  * appended as one file batch under the feed directory; a file stream over
  * it replays transactions in order, one micro-batch per tx file
  * (`maxFilesPerTrigger=1`). GraphSubscriptions filters compose on the
  * resulting streaming DataFrames unchanged.
  *
  * Terminations are recorded as CLOSURE rows `(atom_id, atype, term_slice)`
  * in their own sub-feed: the Transactor records them as interval-column
  * rewrites, not appended atom rows, so without a closure delta a
  * termination would never reach the CDC feed and `on[terminated]`
  * subscriptions would silently produce nothing.
  */
object GraphFeed {

  val closureSchema: StructType = StructType(Seq(
    StructField("atom_id", StringType),
    StructField("atype", StringType),
    StructField("term_slice", IntegerType),
    StructField("cascaded", org.apache.spark.sql.types.BooleanType)))

  /** Append one transaction's full delta: new atoms, values, tags, and
    * termination closures (with the closed atom's type attached for
    * subscription filtering — resolved from the receipt's pre-close rows
    * when possible, else from the id scheme's `kind:atype/...` prefix). */
  def appendDelta(feedDir: String, r: Receipt, spark: SparkSession): Unit = {
    import spark.implicits._
    appendDelta(feedDir, r.newAtoms, r.newValues, spark)
    if (r.newTags.nonEmpty)
      spark.createDataset(r.newTags).toDF()
        .coalesce(1).write.mode("append").parquet(s"$feedDir/tags")
    if (r.terminatedIds.nonEmpty || r.cascadedIds.nonEmpty) {
      // explicit + cascade closures (flagged): without the cascade rows a
      // live `on[terminated]` on a relation type never fires for the
      // common case — relations closed because an endpoint died
      val rows =
        r.terminatedIds.map { id =>
          org.apache.spark.sql.Row(id, Transactor.atypeOfId(id), r.slice, false)
        } ++ r.cascadedIds.map { id =>
          org.apache.spark.sql.Row(id, Transactor.atypeOfId(id), r.slice, true)
        }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), closureSchema)
        .write.mode("append").parquet(s"$feedDir/closures")
    }
  }

  /** Atom/value-only variant (bulk encoders with no terminations). */
  def appendDelta(feedDir: String, newAtoms: Seq[AtomRow],
      newValues: Seq[ValueRow], spark: SparkSession): Unit = {
    import spark.implicits._
    if (newAtoms.nonEmpty)
      spark.createDataset(newAtoms).toDF()
        .coalesce(1).write.mode("append").parquet(s"$feedDir/atoms")
    if (newValues.nonEmpty)
      spark.createDataset(newValues).toDF()
        .coalesce(1).write.mode("append").parquet(s"$feedDir/values")
  }

  def atomFeed(spark: SparkSession, feedDir: String): DataFrame =
    spark.readStream
      .schema(Encoders.product[AtomRow].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feedDir/atoms")

  def valueFeed(spark: SparkSession, feedDir: String): DataFrame =
    spark.readStream
      .schema(Encoders.product[ValueRow].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feedDir/values")

  /** Termination-closure tail — the input for `on[terminated]` over the
    * durable feed (GraphSubscriptions.onTerminatedClosures). */
  def closureFeed(spark: SparkSession, feedDir: String): DataFrame =
    spark.readStream
      .schema(closureSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feedDir/closures")

  def tagFeed(spark: SparkSession, feedDir: String): DataFrame =
    spark.readStream
      .schema(Encoders.product[TagRow].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feedDir/tags")
}
