package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fx.{StreamIngest, Sync}

final case class IngEvent(ts: java.sql.Timestamp, event_id: Long,
    user_id: Long, value: Double, event_type: String)

/** Variant with a NULLABLE tie for the null-tie rejection test. */
final case class IngEventN(ts: java.sql.Timestamp, event_id: java.lang.Long,
    user_id: Long, value: Double, event_type: String)

/** Variant with a NULLABLE key for the null-key rejection test. */
final case class IngEventK(ts: java.sql.Timestamp, event_id: Long,
    user_id: java.lang.Long, value: Double, event_type: String)

/** Variant with a STRING tie for the non-numeric-tie rejection test. */
final case class IngEventS(ts: java.sql.Timestamp, event_id: String,
    user_id: Long, value: Double, event_type: String)

/** Streaming ingestion into a synced graph store: one tx per micro-batch,
  * event-time last-writer-wins, entity upsert on first sight. The load-
  * bearing property is batching-independence — the final graph state must
  * not depend on arrival order, batch boundaries, or redelivery. */
class StreamIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def ingestInto(dir: String, input: MemoryStream[IngEvent],
      rounds: Seq[Seq[IngEvent]]): Unit = {
    val q = StreamIngest.eventsToGraph(input.toDF(), dir, "User",
      key = col("user_id"), eventTs = col("ts"), tie = col("event_id"),
      fields = Seq(
        StreamIngest.IngestField("Value", "double", col("value")),
        StreamIngest.IngestField("EventType", "str", col("event_type"))),
      checkpointDir = tmp("graft_ingest_ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try rounds.foreach { r => input.addData(r); q.processAllAvailable() }
    finally q.stop()
  }

  private def state(dir: String): Map[String, (Double, String)] = {
    val g = Sync.open(spark, dir).graph
    val vals = g.now.all("User").fieldValue("Value", "v_double", "v")
      .join(g.now.all("User").fieldValue("EventType", "v_str", "t"), "atom_id")
    vals.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getString(2))).toMap
  }

  test("out-of-order batches converge to event-time last-writer-wins") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    // LATER events arrive FIRST; the second round is entirely stale for
    // u1 and fresh for u2 — final state must be the event-time maximum
    // per user either way
    ingestInto(dir, input, Seq(
      Seq(IngEvent(ts("2024-03-01 00:00:00"), 10, 1, 30.0, "late"),
        IngEvent(ts("2024-01-05 00:00:00"), 3, 2, 5.0, "early")),
      Seq(IngEvent(ts("2024-01-01 00:00:00"), 1, 1, 10.0, "stale"),
        IngEvent(ts("2024-02-01 00:00:00"), 7, 2, 7.0, "mid"))))
    assert(state(dir) == Map(
      "e:User/1" -> (30.0, "late"), "e:User/2" -> (7.0, "mid")))
    // u1's stale arrival did NOT land a value row; u2's did (2 txs total:
    // both rounds applied at least one fresh row)
    val g = Sync.open(spark, dir).graph
    assert(g.maxSlice == 2)
    val u1Vals = g.values.filter(col("ae_id") === "ae:Value/e:User/1").count()
    assert(u1Vals == 1)
  }

  test("tx timestamps stay monotone under late data: Graph.at(t) frames are consistent") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    // batch 1 applies u1 at 10:00 (tx ts 10:00); batch 2 is a FIRST-SIGHT
    // key whose events are older (09:00) — still fresh (no stored
    // high-water for u2), so it commits a LATER slice. Unclamped, that
    // slice carried ts 09:00 < slice 1's 10:00, and Graph.at(09:30) —
    // max(tx_id) where ts <= t — picked slice 2, whose FRAME includes
    // slice 1's 10:00 rows: an as-of-09:30 read returning 10:00 data.
    ingestInto(dir, input, Seq(
      Seq(IngEvent(ts("2024-01-01 10:00:00"), 10, 1, 1.0, "x")),
      Seq(IngEvent(ts("2024-01-01 09:00:00"), 5, 2, 2.0, "y"))))
    val g = Sync.open(spark, dir).graph
    assert(g.maxSlice == 2)
    // the tx axis never regresses
    val txs = g.txs.orderBy(col("tx_id"))
      .collect().map(r => (r.getInt(0), r.getTimestamp(1)))
    assert(txs.sliding(2).forall {
      case Array((_, a), (_, b)) => !b.before(a); case _ => true },
      s"non-monotone tx axis: ${txs.mkString(", ")}")
    // an as-of read BEFORE slice 1's ts sees neither slice's data
    assert(g.at(ts("2024-01-01 09:30:00")).all("User").count() == 0)
    // event-time truth is still queryable per key in the HwTs field
    assert(state(dir) == Map(
      "e:User/1" -> (1.0, "x"), "e:User/2" -> (2.0, "y")))
  }

  test("redelivery is idempotent: replayed batch appends no tx") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    val batch = Seq(
      IngEvent(ts("2024-01-01 00:00:00"), 1, 1, 10.0, "a"),
      IngEvent(ts("2024-01-02 00:00:00"), 2, 2, 20.0, "b"))
    ingestInto(dir, input, Seq(batch, batch)) // exact redelivery
    val g = Sync.open(spark, dir).graph
    assert(g.maxSlice == 1) // second delivery was entirely stale -> no tx
    assert(state(dir) == Map(
      "e:User/1" -> (10.0, "a"), "e:User/2" -> (20.0, "b")))
  }

  test("null event time is rejected: cannot order, cannot weaken the fence") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    ingestInto(dir, input, Seq(
      // all-null batch: a clean no-op tick, no tx row
      Seq(IngEvent(null, 1, 1, 10.0, "ghost1"),
        IngEvent(null, 2, 2, 20.0, "ghost2")),
      // mixed batch: only the ordered row lands (the null row would have
      // out-tied it on event_id and written a null-ts tx + null
      // high-water, disarming last-writer-wins for u1 forever)
      Seq(IngEvent(ts("2024-01-01 00:00:00"), 3, 1, 30.0, "real"),
        IngEvent(null, 9, 1, 99.0, "ghost3"))))
    val g = Sync.open(spark, dir).graph
    assert(g.maxSlice == 1)
    assert(state(dir) == Map("e:User/1" -> (30.0, "real")))
    // the tx's event-time watermark is the real winner's ts, never null
    val txTs = g.txs.filter(col("tx_id") === 1).collect()(0).getTimestamp(1)
    assert(txTs == ts("2024-01-01 00:00:00"))
  }

  test("null tie is rejected like null ts: cannot order equal timestamps") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEventN]
    val t0 = ts("2024-01-01 00:00:00")
    val q = StreamIngest.eventsToGraph(input.toDF(), dir, "User",
      key = col("user_id"), eventTs = col("ts"), tie = col("event_id"),
      fields = Seq(
        StreamIngest.IngestField("Value", "double", col("value")),
        StreamIngest.IngestField("EventType", "str", col("event_type"))),
      checkpointDir = tmp("graft_ingest_ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try Seq(
      // null-tie batch: a clean no-op tick (a stored null HwTie would
      // make every later equal-ts comparison null → events dropped
      // silently forever)
      Seq(IngEventN(t0, null, 1, 99.0, "ghost")),
      Seq(IngEventN(t0, 1L, 1, 30.0, "real")),
      // the equal-ts tiebreak still works afterwards
      Seq(IngEventN(t0, 2L, 1, 40.0, "later")))
      .foreach { r => input.addData(r); q.processAllAvailable() }
    finally q.stop()
    val g = Sync.open(spark, dir).graph
    assert(g.maxSlice == 2, "null-tie batch must be a no-op tick")
    assert(state(dir) == Map("e:User/1" -> (40.0, "later")))
  }

  test("null keys and non-numeric ties reject: no ghost rows, no poisoned fence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    // null KEY: unguarded, every such event appended NULL-id atom/value
    // rows the fence could never match — a fresh ghost set EVERY tick
    val dir1 = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir1)
    val inK = MemoryStream[IngEventK]
    val qK = StreamIngest.eventsToGraph(inK.toDF(), dir1, "User",
      key = col("user_id"), eventTs = col("ts"), tie = col("event_id"),
      fields = Seq(StreamIngest.IngestField("Value", "double", col("value"))),
      checkpointDir = tmp("graft_ingest_ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try Seq(
      Seq(IngEventK(t0, 1, null, 10.0, "ghost"),
        IngEventK(t0, 2, 1L, 20.0, "real")),
      Seq(IngEventK(t0, 3, null, 30.0, "ghost2")))
      .foreach { r => inK.addData(r); qK.processAllAvailable() }
    finally qK.stop()
    val g1 = Sync.open(spark, dir1).graph
    assert(g1.atoms.filter(col("atom_id").isNull).count() == 0)
    assert(g1.values.filter(col("ae_id").isNull).count() == 0)
    assert(g1.maxSlice == 1) // the all-ghost second batch was a no-op tick
    // NON-NUMERIC tie: nulls in the long conversion AFTER the old raw
    // null-guard — must reject like a null tie, not poison the high-water
    val dir2 = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir2)
    val inS = MemoryStream[IngEventS]
    val qS = StreamIngest.eventsToGraph(inS.toDF(), dir2, "User",
      key = col("user_id"), eventTs = col("ts"), tie = col("event_id"),
      fields = Seq(StreamIngest.IngestField("Value", "double", col("value"))),
      checkpointDir = tmp("graft_ingest_ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try Seq(
      Seq(IngEventS(t0, "evt-1", 1, 99.0, "bad")),
      Seq(IngEventS(t0, "5", 1, 30.0, "ok")),
      Seq(IngEventS(t0, "7", 1, 40.0, "later"))) // equal-ts tiebreak lives
      .foreach { r => inS.addData(r); qS.processAllAvailable() }
    finally qS.stop()
    val g2 = Sync.open(spark, dir2).graph
    assert(g2.maxSlice == 2)
    val v = g2.values.filter(col("ae_id") === "ae:Value/e:User/1" &&
      col("tx_slice") === 2).collect()(0).getAs[Double]("v_double")
    assert(v == 40.0)
  }

  test("null-valued fields: whole-row replace, batching-independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // winner (later ts) carries event_type = null; loser carried "a".
    // skip-null semantics would leave "a" when the rows split across
    // batches but NOTHING when they share one — final state must instead
    // be identical either way (winner row replaces the whole field set)
    val e1 = IngEvent(ts("2024-01-01 00:00:00"), 1, 1, 10.0, "a")
    val e2 = IngEvent(ts("2024-01-02 00:00:00"), 2, 1, 20.0, null)
    def run(rounds: Seq[Seq[IngEvent]]): (Map[String, Double], Map[String, String]) = {
      val dir = tmp("graft_ingest")
      Sync.publish(Graph.empty(spark), dir)
      val input = MemoryStream[IngEvent]
      ingestInto(dir, input, rounds)
      val g = Sync.open(spark, dir).graph
      val vs = g.now.all("User").fieldValue("Value", "v_double", "v")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val ts2 = g.now.all("User").fieldValue("EventType", "v_str", "t")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      (vs, ts2)
    }
    val oneBatch = run(Seq(Seq(e1, e2)))
    val twoBatches = run(Seq(Seq(e1), Seq(e2)))
    assert(oneBatch == twoBatches,
      s"final state depends on batching: $oneBatch vs $twoBatches")
    assert(oneBatch._1 == Map("e:User/1" -> 20.0))
  }

  test("a no-op tick releases the graph retired last tick") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    val fields = Seq(
      StreamIngest.IngestField("Value", "double", col("value")),
      StreamIngest.IngestField("EventType", "str", col("event_type")))
    def tick(st: StreamIngest.IngestState, evs: Seq[IngEvent]) =
      StreamIngest.applyBatch(st, evs.toDF(), dir, "User",
        key = col("user_id"), eventTs = col("ts"), tie = col("event_id"),
        fields = fields)
    val ev = IngEvent(ts("2024-01-01 00:00:00"), 1, 1, 10.0, "a")
    val st0 = StreamIngest.IngestState(Sync.open(spark, dir), None)
    val st1 = tick(st0, Seq(ev))
    assert(st1.retiring.isDefined, "productive tick retires the prior graph")
    // the same event again: stale (fenced out) → no-op tick. The retired
    // graph's pin must drop NOW, not at the next productive tick — an
    // at-least-once source can replay stale batches for a long time
    val st2 = tick(st1, Seq(ev))
    assert(st2.retiring.isEmpty, "no-op tick must release the retired graph")
  }

  test("equal-ts tie resolves by tie id, across batch boundaries") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    val t0 = ts("2024-01-01 00:00:00")
    // higher event_id arrives first; the later-arriving lower id loses
    ingestInto(dir, input, Seq(
      Seq(IngEvent(t0, 5, 1, 50.0, "winner")),
      Seq(IngEvent(t0, 2, 1, 20.0, "loser"))))
    assert(state(dir) == Map("e:User/1" -> (50.0, "winner")))
  }

  test("compact settles the ingest run's file debt; state and appends survive") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    // 5 ticks = 5 txs = 5 value files + 5 tx files on top of the snapshot
    val rounds = (1 to 5).map(i => Seq(
      IngEvent(ts(f"2024-01-0$i 00:00:00"), i.toLong, 1, i * 10.0, s"t$i"),
      IngEvent(ts(f"2024-01-0$i 00:00:00"), i.toLong + 100, 2, i * 1.0, s"u$i")))
    ingestInto(dir, input, rounds)
    def parquetFiles(sub: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub"))
        .count(_.getName.endsWith(".parquet"))
    }
    val before = state(dir)
    val valueFilesBefore = parquetFiles("values")
    assert(valueFilesBefore >= 5) // one per tick by design (file ~ tx)
    graft.core.GraphStore.compact(spark, dir)
    assert(parquetFiles("values") < valueFilesBefore)
    assert(state(dir) == before) // defrag is a pure layout change
    val g = Sync.open(spark, dir).graph
    assert(g.maxSlice == 5)
    // the compacted store still appends: one more tick lands slice 6
    val input2 = MemoryStream[IngEvent]
    ingestInto(dir, input2, Seq(Seq(
      IngEvent(ts("2024-02-01 00:00:00"), 999, 1, 77.0, "post"))))
    assert(state(dir)("e:User/1") == ((77.0, "post")))
    assert(Sync.open(spark, dir).graph.maxSlice == 6)
  }

  test("executor storage stays bounded across ticks (superseded pins released)") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    ingestInto(dir, input, (1 to 6).map(i => Seq(
      IngEvent(ts(f"2024-01-0$i 00:00:00"), i.toLong, 1, i * 1.0, s"e$i"))))
    val pinnedAfter = spark.sparkContext.getPersistentRDDs.size
    // expected steady-state pins: the two checkpointed delta frames per
    // tick ARE the in-memory graph's appended data (released wholesale at
    // the depth-cap re-open), plus ONE live seeded latest-values table —
    // the superseded ticks' seeded tables must NOT accumulate (that leak
    // grows as +1/tick on top of the +2/tick data, i.e. ~19 here; the
    // release discipline keeps it ~13)
    assert(pinnedAfter - pinnedBefore <= 2 * 6 + 3,
      s"pinned storage grew $pinnedBefore -> $pinnedAfter across 6 ticks " +
        "(superseded seeded tables accumulating?)")
  }

  test("TIMESTAMP_NTZ event time normalizes (the r7 regression class)") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    // LocalDateTime encodes as TIMESTAMP_NTZ — the type a parquet
    // µs-timestamp source produces
    val input = MemoryStream[(java.time.LocalDateTime, Long, Long, Double, String)]
    val df = input.toDF().toDF("ts", "event_id", "user_id", "value", "event_type")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val q = StreamIngest.eventsToGraph(df, dir, "User",
      key = col("user_id"), eventTs = col("ts"), tie = col("event_id"),
      fields = Seq(StreamIngest.IngestField("Value", "double", col("value"))),
      checkpointDir = tmp("graft_ingest_ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try {
      input.addData(Seq(
        (java.time.LocalDateTime.of(2024, 1, 2, 0, 0), 2L, 1L, 20.0, "b")))
      q.processAllAvailable()
      // a second batch with an OLDER ntz ts must lose against the stored
      // TIMESTAMP high-water (the cross-type compare is the broken path)
      input.addData(Seq(
        (java.time.LocalDateTime.of(2024, 1, 1, 0, 0), 1L, 1L, 10.0, "a")))
      q.processAllAvailable()
    } finally q.stop()
    val g = Sync.open(spark, dir).graph
    assert(g.now.all("User").fieldValue("Value", "v_double", "v")
      .collect().map(_.getDouble(1)).toSeq == Seq(20.0))
  }

  test("entities upsert once; a second field assignment reuses the atom") {
    import spark.implicits._
    val dir = tmp("graft_ingest")
    Sync.publish(Graph.empty(spark), dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngEvent]
    ingestInto(dir, input, Seq(
      Seq(IngEvent(ts("2024-01-01 00:00:00"), 1, 1, 1.0, "a")),
      Seq(IngEvent(ts("2024-01-02 00:00:00"), 2, 1, 2.0, "b"))))
    val g = Sync.open(spark, dir).graph
    // the streamed store is a structurally sound graph: referential
    // integrity, interval discipline, no duplicate opens, endpoints
    // alive at relation open — the full GraphVerify battery
    assert(graft.core.GraphVerify.isHealthy(g))
    val u1Atoms = g.atoms.filter(col("atom_id") === "e:User/1").count()
    assert(u1Atoms == 1) // no duplicate entity from the second batch
    val u1ValueAes = g.atoms.filter(
      col("atom_id") === "ae:Value/e:User/1").count()
    assert(u1ValueAes == 1) // AE reused, not re-opened
    assert(state(dir)("e:User/1") == ((2.0, "b")))
    // history is intact: the slice-1 frame still reads the first value
    assert(g.at(1).all("User").fieldValue("Value", "v_double", "v")
      .collect().map(r => r.getDouble(1)).toSeq == Seq(1.0))
  }
}
