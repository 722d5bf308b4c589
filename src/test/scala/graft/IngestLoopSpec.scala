package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fx.{StreamIngest, Sync}
import graft.streaming.GraphSubscriptions

/** The CDC loop END-TO-END in one pipeline: an event stream becomes graph
  * transactions (StreamIngest, the write side), while a SECOND streaming
  * query tails the very same store's value feed and surfaces the ingested
  * assignments as subscription events (Sync.valueFeed +
  * GraphSubscriptions, the read side). This is the reference's
  * "subscribing graph process" loop — subscribe, transact, observe —
  * with both halves as Structured Streaming over shared storage. */
class IngestLoopSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("ingested assignments surface on the same store's live subscription feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft_loop")
    Sync.publish(Graph.empty(spark), dir)

    // read side: live tail of the store's value feed, Value-field
    // assignments only (onAssignedScheme — analysis-time-stable, no
    // static dimension that would go stale as atoms append)
    val sub = GraphSubscriptions
      .onAssignedScheme(Sync.valueFeed(spark, dir), "Value")
      .writeStream.format("memory").queryName("graft_loop_sub")
      .option("checkpointLocation", tmp("graft_loop_subckpt"))
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // write side: ingest two micro-batches
    val input = MemoryStream[IngEvent]
    val wq = StreamIngest.eventsToGraph(input.toDF(), dir, "User",
      key = col("user_id"), eventTs = col("ts"), tie = col("event_id"),
      fields = Seq(StreamIngest.IngestField("Value", "double", col("value"))),
      checkpointDir = tmp("graft_loop_ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try {
      input.addData(Seq(
        IngEvent(ts("2024-01-01 00:00:00"), 1, 1, 10.0, "a"),
        IngEvent(ts("2024-01-01 00:00:00"), 2, 2, 20.0, "a")))
      wq.processAllAvailable()
      input.addData(Seq(
        IngEvent(ts("2024-01-02 00:00:00"), 3, 1, 30.0, "b")))
      wq.processAllAvailable()
      sub.processAllAvailable()
    } finally { wq.stop(); sub.stop() }

    // the subscriber saw every applied assignment: u1 twice (10 then 30,
    // distinct slices), u2 once — exactly the store's committed history
    val seen = spark.table("graft_loop_sub")
      .select(col("atom_id"), col("tx_slice"), col("v_double"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(seen == Set(
      ("ae:Value/e:User/1", 1, 10.0),
      ("ae:Value/e:User/2", 1, 20.0),
      ("ae:Value/e:User/1", 2, 30.0)))
  }
}
