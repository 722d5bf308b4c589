package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{GraphSubscriptions, Streams}
import graft.core._

final case class TsEvent(ts: java.sql.Timestamp, user_id: Long, value: Double)

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("micro-batch stream result equals batch result (tumbling window)") {
    val batch = Streams.tumblingAgg(Tables.events(spark, sf), "1 day")
      .orderBy(col("window_start"), col("event_type")).collect()
    val streamed = Streams.runAsStream(spark, sf,
      df => Streams.tumblingAgg(df, "1 day"), "t_tumbling")
      .orderBy(col("window_start"), col("event_type")).collect()
    assert(batch.length == streamed.length)
    assert(batch.sameElements(streamed))
  }

  test("on-filter subscription stream equals batch") {
    val t = (df: org.apache.spark.sql.DataFrame) =>
      Streams.onEventTypes(df, Seq("error"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val batch = t(Tables.events(spark, sf))
      .orderBy(col("user_id")).collect()
    val streamed = Streams.runAsStream(spark, sf, t, "t_onfilter")
      .orderBy(col("user_id")).collect()
    assert(batch.sameElements(streamed))
  }

  test("at-least-once feed dedups to exactly-once: stream equals batch equals clean") {
    // the transform doubles a third of the feed (simulated re-delivery),
    // then restores exactly-once by id before aggregating
    val t = (df: org.apache.spark.sql.DataFrame) =>
      Streams.dedupById(df.unionAll(df.filter(col("event_id") % 3 === 0)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val clean = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type")).collect()
    val batch = t(Tables.events(spark, sf)).orderBy(col("event_type")).collect()
    val streamed = Streams.runAsStream(spark, sf, t, "t_dedup")
      .orderBy(col("event_type")).collect()
    assert(batch.sameElements(clean)) // dedup fully undoes the re-delivery
    assert(streamed.sameElements(clean))
  }

  test("count windows (chunk-n per key) over a pushable stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.KeyedEvent]
    val q = Streams.countWindows(input.toDS(), 3).writeStream
      .outputMode("append").format("memory").queryName("t_countwin").start()
    // push 7 events for user 1 → two complete windows of 3, 1 leftover
    input.addData((1 to 7).map(i =>
      Streams.KeyedEvent(1L, "click", i.toDouble)): _*)
    q.processAllAvailable()
    val out = spark.table("t_countwin").orderBy("window_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("n") == 3 && out(0).getAs[Double]("sum_value") == 6.0)
    assert(out(1).getAs[Double]("sum_value") == 15.0)
    // push 2 more → third window completes with state carried across batches
    input.addData(Streams.KeyedEvent(1L, "click", 8.0),
      Streams.KeyedEvent(1L, "click", 9.0))
    q.processAllAvailable()
    q.stop()
    val out2 = spark.table("t_countwin").orderBy("window_idx").collect()
    assert(out2.length == 3)
    assert(out2(2).getAs[Double]("sum_value") == 7.0 + 8.0 + 9.0)
  }

  test("asof enrichment: batch mode reproduces the batch as-of join") {
    import spark.implicits._
    val left = Seq(("a", 10.0, "l1"), ("a", 20.0, "l2"), ("a", 35.0, "l3"),
      ("b", 5.0, "l4"), ("c", 7.0, "l5")).toDF("k", "t", "lv")
    val right = Seq(("a", 12.0, "r1"), ("a", 20.0, "r2"), ("a", 31.0, "r3"),
      ("b", 6.0, "r4")).toDF("k", "t", "rv")
    val enriched = Streams.asofEnrich(left, right, "k", "t")
      .collect().map(e => (e.key, e.ts) -> e.matched_payload).toMap
    val batch = graft.ops.AsOfJoin.backward(left, right, Seq("k"), "t", "t")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Double]("t")) ->
        Option(r.getAs[String]("rv"))).toMap
    assert(enriched.keySet == batch.keySet)
    batch.foreach { case (key, rv) =>
      val got = enriched(key).map(j => j.contains("\"" + rv.getOrElse("") + "\""))
      assert(rv.isEmpty == enriched(key).isEmpty, s"$key: $rv vs ${enriched(key)}")
      rv.foreach(_ => assert(got.contains(true), s"$key: $rv vs ${enriched(key)}"))
    }
  }

  test("asof enrichment: right state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Double, String)]
    val rIn = MemoryStream[(String, Double, String)]
    val q = Streams.asofEnrich(
        lIn.toDF().toDF("k", "t", "lv"), rIn.toDF().toDF("k", "t", "rv"),
        "k", "t").writeStream
      .outputMode("append").format("memory").queryName("t_asof").start()
    // batch 1: reference state arrives first
    rIn.addData(("u", 10.0, "price10"), ("u", 20.0, "price20"))
    q.processAllAvailable()
    // batch 2: facts arrive later, match state from batch 1
    lIn.addData(("u", 15.0, "buy"), ("u", 25.0, "sell"), ("u", 5.0, "early"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_asof").as[Streams.AsofEnriched].collect()
      .map(e => e.payload.contains("early") match {
        case true => "early" -> e.matched_ts
        case false if e.ts == 15.0 => "buy" -> e.matched_ts
        case _ => "sell" -> e.matched_ts
      }).toMap
    assert(out("buy").contains(10.0))   // latest right <= 15 from prior batch
    assert(out("sell").contains(20.0))
    assert(out("early").isEmpty)        // nothing at-or-before 5
  }

  test("graph subscriptions: on[instantiated]/on[assigned] over the feed") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "p1"), PutEntity("Person", "p2"),
      PutEntity("Pet", "x"), PutField("p1", "Score", 5.0)))
    val inst = GraphSubscriptions.onInstantiated(g.atoms, "Person").collect()
    assert(inst.length == 2)
    val assigned = GraphSubscriptions.onAssigned(g.values, g.atoms, "Score").collect()
    assert(assigned.length == 1)
    assert(assigned(0).getAs[Double]("v_double") == 5.0)
  }

  test("graph CDC feed: tx-log tail drives live subscriptions per batch") {
    import graft.streaming.GraphFeed
    val feedDir = java.nio.file.Files.createTempDirectory("graft_feed").toString
    // two transactions, each appended to the feed as its own file batch
    val (g1, r1) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "p1"), PutField("p1", "Score", 1.0)))
    GraphFeed.appendDelta(feedDir, r1.newAtoms, r1.newValues, spark)
    val (g2, r2) = Transactor.transact(g1, Seq(
      PutEntity("Person", "p2"), PutEntity("Robot", "r1"),
      PutField("p2", "Score", 2.0)))
    GraphFeed.appendDelta(feedDir, r2.newAtoms, r2.newValues, spark)

    // live subscription: on[instantiated[Person]] over the streaming feed
    val q = GraphSubscriptions.onInstantiated(
      GraphFeed.atomFeed(spark, feedDir), "Person")
      .writeStream.outputMode("append")
      .format("memory").queryName("t_cdc").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_cdc").collect()
    assert(got.length == 2) // p1, p2 — Robot filtered by the subscription
    assert(got.map(_.getAs[String]("atom_id")).toSet ==
      Set("e:Person/p1", "e:Person/p2"))
    assert(got.map(_.getAs[Int]("tx_slice")).toSet == Set(1, 2))
    // assigned-value subscription over the value feed
    val q2 = GraphSubscriptions.onAssigned(
      GraphFeed.valueFeed(spark, feedDir), g2.atoms, "Score")
      .writeStream.outputMode("append")
      .format("memory").queryName("t_cdc_vals").start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("t_cdc_vals").count() == 2)
  }

  test("graph CDC feed: terminations reach on[terminated] via closure rows") {
    import graft.streaming.GraphFeed
    val feedDir = java.nio.file.Files.createTempDirectory("graft_feed_t").toString
    val (g1, r1) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "p1"), PutEntity("Person", "p2"),
      PutEntity("Robot", "r1")))
    GraphFeed.appendDelta(feedDir, r1, spark)
    val (_, r2) = Transactor.transact(g1, Seq(
      TerminateAtom("e:Person/p2"), TerminateAtom("e:Robot/r1")))
    GraphFeed.appendDelta(feedDir, r2, spark)

    val q = GraphSubscriptions.onTerminatedClosures(
      GraphFeed.closureFeed(spark, feedDir), "Person")
      .writeStream.outputMode("append")
      .format("memory").queryName("t_cdc_term").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_cdc_term").collect()
    assert(got.length == 1) // p2 terminated; Robot filtered by atype
    assert(got(0).getAs[String]("atom_id") == "e:Person/p2")
    assert(got(0).getAs[Int]("tx_slice") == 2)
    assert(got(0).getAs[String]("event") == "terminated")
  }

  test("session windows run streaming-native with a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    def ev(min: Int, u: Long) = TsEvent(
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), u, 1.0)
    val q = Streams.sessionAgg(
        input.toDF().withWatermark("ts", "2 hours"), "30 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("t_sessions").start()
    // u1: events at 10:00, 10:10 (merge), 11:00 (new session); u2: one
    input.addData(ev(0, 1), ev(10, 1), ev(0, 2))
    q.processAllAvailable()
    input.addData(TsEvent(java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1, 2.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_sessions")
      .orderBy("user_id", "session_start").collect()
    assert(got.length == 3) // u1 x2 sessions, u2 x1
    val s1 = got(0)
    assert(s1.getAs[Long]("user_id") == 1 && s1.getAs[Long]("n_events") == 2)
    assert(s1.getAs[java.sql.Timestamp]("session_end") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:40:00")) // last ts + gap
    assert(got(1).getAs[Long]("user_id") == 1 &&
      got(1).getAs[Long]("n_events") == 1)
    assert(got(2).getAs[Long]("user_id") == 2)
  }

  test("watermarked tumbling agg drops nothing when data is in order") {
    val wm = Streams.tumblingAggWatermarked(Tables.events(spark, sf),
      "1 day", "2 hours").agg(sum("n")).collect()(0).getLong(0)
    val plain = Tables.events(spark, sf).count()
    assert(wm == plain)
  }
}
