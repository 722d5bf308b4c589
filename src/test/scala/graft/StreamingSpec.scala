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
    // values deliberately DESCEND while ts ascends: the per-batch sort is
    // by event time, so windows fill as (7,6,5),(4,3,2) — an
    // arrival/value-ordered fold would group (1,2,3),(4,5,6)
    input.addData((1 to 7).map(i =>
      Streams.KeyedEvent(1L, "click", (8 - i).toDouble, i.toDouble)): _*)
    q.processAllAvailable()
    val out = spark.table("t_countwin").orderBy("window_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("n") == 3 && out(0).getAs[Double]("sum_value") == 18.0)
    assert(out(1).getAs[Double]("sum_value") == 9.0) // 4+3+2 in ts order
    // push 2 more → third window completes with state carried across batches
    input.addData(Streams.KeyedEvent(1L, "click", 8.0, 8.0),
      Streams.KeyedEvent(1L, "click", 9.0, 9.0))
    q.processAllAvailable()
    q.stop()
    val out2 = spark.table("t_countwin").orderBy("window_idx").collect()
    assert(out2.length == 3)
    assert(out2(2).getAs[Double]("sum_value") == 1.0 + 8.0 + 9.0)
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

  test("stream_graph_on: live CDC tail equals the registered batch face") {
    import graft.streaming.GraphFeed
    // the registered query's batch answer over its own feed directory
    val batch = graft.queries.Registry.queries("stream_graph_on")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    val (_, feedDir) = graft.queries.Streaming.graphFeedFor(spark, sf)
    // tail the SAME directory as a real micro-batch stream (one tx file
    // per trigger) through the same subscription builders
    val atomsStatic = spark.read
      .schema(org.apache.spark.sql.Encoders.product[AtomRow].schema)
      .parquet(s"$feedDir/atoms")
    val qa = GraphSubscriptions
      .onAssigned(GraphFeed.valueFeed(spark, feedDir), atomsStatic, "Spend")
      .writeStream.outputMode("append")
      .format("memory").queryName("t_sgo_assigned").start()
    qa.processAllAvailable(); qa.stop()
    val qt = GraphSubscriptions
      .onTerminatedClosures(GraphFeed.closureFeed(spark, feedDir), "User")
      .writeStream.outputMode("append")
      .format("memory").queryName("t_sgo_term").start()
    qt.processAllAvailable(); qt.stop()
    val streamed =
      spark.table("t_sgo_assigned")
        .select(col("event"), col("atom_id"),
          col("tx_slice").cast("int"), col("v_double")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          Some(r.getDouble(3)))) ++
      spark.table("t_sgo_term")
        .select(col("event"), col("atom_id"), col("tx_slice").cast("int"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          None: Option[Double]))
    assert(batch.nonEmpty)
    assert(streamed.sortBy(t => (t._1, t._2, t._3)).toSeq ==
      batch.sortBy(t => (t._1, t._2, t._3)).toSeq)
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

  // ---- Rx combinator family (merge / combine_latest / debounce) ----

  test("merge: tagged union, arrival order preserved, stream equals batch") {
    val t = (df: org.apache.spark.sql.DataFrame) =>
      Streams.merge(Seq(
        df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "purchase")))
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val batch = t(Tables.events(spark, sf))
      .orderBy("source").collect().map(r => (r.getInt(0), r.getLong(1)))
    val streamed = Streams.runAsStream(spark, sf, t, "t_merge")
      .orderBy("source").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(batch.sameElements(streamed) && batch.length == 2)
    // heterogeneous schemas union by name with null-fill
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "a_only")
    val b = Seq((2L, 9.9)).toDF("id", "b_only")
    val m = Streams.merge(Seq(a, b)).orderBy("id").collect()
    assert(m.length == 2 && m(0).getAs[Any]("b_only") == null &&
      m(1).getAs[Any]("a_only") == null)
  }

  test("combine_latest: two-slot keyed state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Double, String)]
    val rIn = MemoryStream[(String, Double, String)]
    val q = Streams.combineLatest(
        lIn.toDF().toDF("k", "t", "lv"), rIn.toDF().toDF("k", "t", "rv"),
        "k", "t").writeStream
      .outputMode("append").format("memory").queryName("t_cl").start()
    // batch 1: only the left side fires — the Rx gate holds, nothing emits
    lIn.addData(("u", 1.0, "l1"), ("u", 2.0, "l2"))
    q.processAllAvailable()
    assert(spark.table("t_cl").isEmpty)
    // batch 2: right side fires — emits with the LATEST left from batch 1
    rIn.addData(("u", 3.0, "r1"))
    q.processAllAvailable()
    val out1 = spark.table("t_cl").as[Streams.Combined].collect()
    assert(out1.length == 1)
    assert(out1(0).latest_left.contains("l2") &&
      out1(0).latest_right.contains("r1"))
    // batch 3: every further event emits a pair, either side
    lIn.addData(("u", 4.0, "l3")); q.processAllAvailable()
    rIn.addData(("u", 5.0, "r2")); q.processAllAvailable(); q.stop()
    val out = spark.table("t_cl").as[Streams.Combined].collect()
      .sortBy(_.ts)
    assert(out.length == 3)
    assert(out(1).latest_left.contains("l3") && out(1).latest_right.contains("r1"))
    assert(out(2).latest_left.contains("l3") && out(2).latest_right.contains("r2"))
  }

  test("combine_latest: batch parity vs window reference on random feeds") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(4242)
    def feed(tag: String) = (1 to 120).map { i =>
      (s"k${rnd.nextInt(7)}", rnd.nextInt(50).toDouble, s"$tag$i")
    }
    val l = feed("l").toDF("k", "t", "lv")
    val r = feed("r").toDF("k", "t", "rv")
    val got = Streams.combineLatest(l, r, "k", "t").collect()
      .map(c => (c.key, c.ts, c.side, c.latest_left, c.latest_right)).toSet
    // reference: IGNORE NULLS running last over the tagged union — the
    // same construction the DuckDB oracle uses, built independently here
    val u = l.select(col("k").cast("string").as("key"),
        col("t").cast("double").as("ts"), lit(0).as("side"),
        to_json(struct(col("lv"))).as("payload"))
      .unionByName(r.select(col("k").cast("string").as("key"),
        col("t").cast("double").as("ts"), lit(1).as("side"),
        to_json(struct(col("rv"))).as("payload")))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("side"), col("payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = u
      .withColumn("ll", last(when(col("side") === 0, col("payload")), true).over(w))
      .withColumn("lr", last(when(col("side") === 1, col("payload")), true).over(w))
      .filter(col("ll").isNotNull && col("lr").isNotNull)
      .select("key", "ts", "side", "ll", "lr").collect()
      .map(r0 => (r0.getString(0), r0.getDouble(1), r0.getInt(2),
        r0.getString(3), r0.getString(4))).toSet
    assert(got == ref, s"sizes: got=${got.size} ref=${ref.size}")
    assert(got.nonEmpty)
  }

  test("debounceStream: event-time timer flushes the quiet key's pending") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    def ev(sec: Int, u: Long) = TsEvent(
      java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d"), u, sec.toDouble)
    val q = Streams.debounceStream(
        input.toDF().withWatermark("ts", "0 seconds"),
        "user_id", "ts", quietMs = 5000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("t_deb").start()
    // burst at 0s,2s,4s (each within 5s of the next: all superseded),
    // then 30s — the 4s event emits because the 30s arrival proves the gap
    input.addData(ev(0, 1), ev(2, 1), ev(4, 1), ev(30, 1))
    q.processAllAvailable()
    val got1 = spark.table("t_deb").as[Streams.Debounced].collect()
    assert(got1.map(_.ts.getTime % 100000 / 1000).toSet == Set(4L))
    // the 30s event is pending; a later event on ANOTHER key advances the
    // watermark past 30s + 5s and the TIMER flushes it (no same-key event)
    input.addData(ev(59, 2))
    q.processAllAvailable(); q.stop()
    val got2 = spark.table("t_deb").as[Streams.Debounced].collect()
    assert(got2.exists(d => d.key == "1" && d.ts.getTime % 100000 / 1000 == 30L),
      s"timer did not flush the pending event: ${got2.mkString(",")}")
  }

  test("debounceStream batch mode = debounce minus each key's trailing event") {
    import spark.implicits._
    val df = Seq(
      ("a", 0.0, "e1"), ("a", 2.0, "e2"), ("a", 10.0, "e3"), ("a", 30.0, "e4"),
      ("b", 5.0, "e5")).toDF("k", "t", "v")
    val completed = Streams.debounce(df, "k", "t", quiet = 5.0)
      .select("v").collect().map(_.getString(0)).toSet
    assert(completed == Set("e2", "e3", "e4", "e5"))
    // batch FMGWS: timers never fire -> trailing pendings (e4, e5) held
    val streaming = Streams.debounceStream(
        df.withColumn("t", timestamp_seconds(col("t"))), "k", "t", 5000L)
      .collect().map(_.payload).toSet
    assert(streaming.map(p => Seq("e1","e2","e3","e4","e5").find(p.contains).get)
      == Set("e2", "e3"))
  }

  test("debounceStream: an out-of-order older event never evicts the pending") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    def ev(sec: Int, u: Long) = TsEvent(
      java.sql.Timestamp.valueOf(
        f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d"), u, sec.toDouble)
    val q = Streams.debounceStream(
        input.toDF().withWatermark("ts", "1 minute"),
        "user_id", "ts", quietMs = 5000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("t_deb_ooo").start()
    input.addData(ev(20, 1))
    q.processAllAvailable()
    // an in-watermark event OLDER than the pending arrives in a later
    // micro-batch: in event-time order it PRECEDES the pending, had a
    // >quiet gap after it, so it emits — and the pending (the newer 20s
    // event) must survive (the old code overwrote it: gone forever)
    input.addData(ev(10, 1))
    q.processAllAvailable()
    val secsOf = (rows: Array[Streams.Debounced]) =>
      rows.map(d => (d.ts.getTime / 1000) % 3600).toSet
    assert(secsOf(spark.table("t_deb_ooo").as[Streams.Debounced].collect())
      == Set(10L))
    // a much later same-key event proves the 20s pending is still alive
    input.addData(ev(90, 1))
    q.processAllAvailable(); q.stop()
    assert(secsOf(spark.table("t_deb_ooo").as[Streams.Debounced].collect())
      == Set(10L, 20L))
  }

  test("debounceStream: a late event is judged by its TRUE successor, not the pending") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    def ev(sec: Int, u: Long) = TsEvent(
      java.sql.Timestamp.valueOf(
        f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d"), u, sec.toDouble)
    val q = Streams.debounceStream(
        input.toDF().withWatermark("ts", "1 minute"),
        "user_id", "ts", quietMs = 5000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("t_deb_succ").start()
    input.addData(ev(10, 1), ev(50, 1)) // flush 10s (gap 40 > 5), pending 50s
    q.processAllAvailable()
    // TWO late in-watermark events: 8s's true successor is the LOGGED 10s
    // (gap 2 <= quiet -> suppressed; judging against the pending read a
    // spurious 42s gap and emitted it), 30s's true successor is the
    // pending 50s (gap 20 > quiet -> emits)
    input.addData(ev(8, 1), ev(30, 1))
    q.processAllAvailable()
    // an in-order event flushes the pending 50s (gap 70 > quiet)
    input.addData(ev(120, 1))
    q.processAllAvailable(); q.stop()
    val secs = spark.table("t_deb_succ").as[Streams.Debounced].collect()
      .map(d => (d.ts.getTime / 1000) % 3600).toSet
    assert(secs == Set(10L, 30L, 50L), s"got $secs")
  }

  test("asofEnrich: duplicate (key, ts) right rows have a deterministic winner") {
    import spark.implicits._
    val left = Seq(("a", 10.0, "l1")).toDF("k", "t", "lv")
    val right = Seq(("a", 10.0, "rB"), ("a", 10.0, "rA"), ("a", 10.0, "rC"))
      .toDF("k", "t", "rv")
    // max payload STRING wins — deterministic; diverges from the batch
    // op's typed tie keys only when string and typed order differ
    // (scoped in asofEnrich's scaladoc)
    val enriched = Streams.asofEnrich(left, right, "k", "t").collect()
    assert(enriched.length == 1)
    assert(enriched(0).matched_payload.exists(_.contains("\"rC\"")),
      s"got ${enriched(0).matched_payload}")
    val batch = graft.ops.AsOfJoin.backward(left, right, Seq("k"), "t", "t")
      .select("rv").collect()(0).getString(0)
    assert(batch == "rC")
  }

  test("runAsStream append mode runs narrow (non-aggregating) transforms") {
    val t = (df: org.apache.spark.sql.DataFrame) =>
      Streams.onEventTypes(df, Seq("error"))
    val batchN = t(Tables.events(spark, sf)).count()
    val streamed = Streams.runAsStream(spark, sf, t, "t_append_narrow",
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
    assert(streamed.count() == batchN && batchN > 0)
  }
}
