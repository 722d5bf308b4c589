package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import graft.core.{AtomRow, ValueRow}

/** Durable tx-log tail — the change-data feed behind live subscriptions
  * (SURVEY §2.9: "Delta CDF or tx-log tail"). Each transaction's delta is
  * appended as one file batch under the feed directory; a file stream over
  * it replays transactions in order, one micro-batch per tx file
  * (`maxFilesPerTrigger=1`). GraphSubscriptions filters compose on the
  * resulting streaming DataFrames unchanged.
  */
object GraphFeed {

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
}
