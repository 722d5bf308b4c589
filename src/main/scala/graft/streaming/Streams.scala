package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming/reactive layer (SURVEY §2.9). The reference's model is RxPY
  * push streams with arrival-order semantics and no watermarks
  * (`op_structs.py:780-824`); the Spark restatement is Structured
  * Streaming micro-batches, where the SAME DataFrame plan runs in batch or
  * stream — so every transform here is written once against DataFrame and
  * used by both paths (batch for the DuckDB oracle, stream in the spec).
  *
  * Supersets over the reference (it has none of these): event-time
  * tumbling/sliding windows, watermark-based late-data handling, and
  * keyed stateful count-windows via flatMapGroupsWithState.
  */
object Streams {

  /** zef `on[...]`-style subscription filter: the event-pattern predicate
    * (type filter) applied to a stream — a streamable narrow filter. */
  def onEventTypes(events: DataFrame, types: Seq[String]): DataFrame =
    events.filter(col("event_type").isInCollection(types))

  /** Tumbling event-time window aggregate (batch == streaming plan). */
  def tumblingAgg(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding event-time window aggregate. */
  def slidingAgg(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Watermarked variant for append-mode streaming sinks (late data beyond
    * `lateness` is dropped — the superset knob the reference lacks). */
  def tumblingAggWatermarked(events: DataFrame, width: String,
      lateness: String): DataFrame =
    tumblingAgg(events.withWatermark("ts", lateness), width)

  /** Sessionization: per-key session windows with an inactivity `gap` —
    * consecutive events merge while each arrives before the previous
    * session's close (last ts + gap, half-open). The streaming-native
    * session operator (Spark merges session state incrementally with a
    * watermark); identical semantics in batch, where it's one groupBy —
    * no gaps-and-islands window pass needed. */
  def sessionAgg(events: DataFrame, gap: String,
      keyCol: String = "user_id"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Exactly-once restoration over an at-least-once feed: drop
    * re-delivered events by id. Streamable as-is (state keyed by id;
    * production bounds it with `withWatermark` +
    * `dropDuplicatesWithinWatermark`); batch and stream agree regardless
    * of which physical row survives because re-deliveries are identical
    * rows. */
  def dedupById(events: DataFrame, idCol: String = "event_id"): DataFrame =
    events.dropDuplicates(idCol)

  final case class KeyedEvent(user_id: Long, event_type: String, value: Double,
      ts: Double)
  final case class CountWindow(user_id: Long, window_idx: Long, n: Int,
      sum_value: Double)

  /** Count-based windows (zef `chunk[n]` on a stream, impl.py:1306): every
    * `n` events per key emit one window — keyed state via
    * flatMapGroupsWithState, the Spark home for Rx-style count semantics.
    * WITHIN a micro-batch events process in (ts, type, value) order — the
    * file's batch==stream design rule: the grouped iterator's raw order
    * is partitioning-dependent, so an unsorted fold made window membership
    * and sums nondeterministic on multi-partition input (the hazard every
    * other stateful op here sorts away). Across batches, arrival order. */
  def countWindows(events: Dataset[KeyedEvent], n: Int): Dataset[CountWindow] = {
    require(n >= 1, s"countWindows: n must be >= 1, got $n — a non-positive" +
      " width never fills a window and accumulates state forever")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Int, Double), CountWindow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[(Long, Int, Double)]) =>
          var (widx, cnt, acc) = state.getOption.getOrElse((0L, 0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer[CountWindow]()
          evs.toVector.sortBy(e => (e.ts, e.event_type, e.value)).foreach { e =>
            cnt += 1; acc += e.value
            if (cnt == n) { out += CountWindow(uid, widx, cnt, acc)
              widx += 1; cnt = 0; acc = 0.0 }
          }
          state.update((widx, cnt, acc))
          out.iterator
      }
  }

  final case class AsofEvent(key: String, ts: Double, side: Int, payload: String)
  final case class AsofEnriched(key: String, ts: Double, payload: String,
      matched_ts: Option[Double], matched_payload: Option[String])

  /** Streaming as-of enrichment — the streaming face of [[graft.ops.AsOfJoin]]
    * (the CDC-enrichment shape: attach the latest known reference state to
    * each fact event, per key). Keyed state via flatMapGroupsWithState holds
    * a bounded, ts-sorted history of right-side rows (`historySize`); each
    * left event matches the latest right with `right.ts <= left.ts`
    * (inclusive, like the batch op).
    *
    * Semantics note, honestly: WITHIN a micro-batch events process in event-
    * time order (per-group sort), so batch mode — one "batch" = everything —
    * reproduces the batch as-of join (spec-asserted parity) with ONE scoped
    * exception: duplicate-(key, ts) right-row ties break on the
    * JSON-RENDERED payload string here (payloads ride packed — the typed
    * columns are gone by the time state compares them), while the batch op
    * breaks them on canonical TYPED keys; a numeric tie whose string order
    * differs (v=9 vs v=10) picks a different — still deterministic —
    * winner. Across micro-batches, a right row arriving AFTER a left row
    * was already emitted does not retro-update it — standard streaming
    * enrichment semantics; bound staleness with source ordering or a
    * larger trigger.
    *
    * Payloads ride as JSON (`to_json` of the non-key/non-ts columns); the
    * time axis rides as double (epoch seconds for timestamps — cast before
    * calling for sub-microsecond axes). State is O(historySize) per key.
    */
  def asofEnrich(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, historySize: Int = 64): Dataset[AsofEnriched] = {
    val spark = left.sparkSession
    import spark.implicits._
    def pack(df: DataFrame, side: Int): Dataset[AsofEvent] = {
      val payloadCols = df.columns.filterNot(c => c == keyCol || c == tsCol)
      df.select(col(keyCol).cast("string").as("key"),
        graft.ops.TimeAxis.seconds(df, tsCol).as("ts"),
        lit(side).as("side"),
        to_json(struct(payloadCols.map(col): _*)).as("payload"))
        .as[AsofEvent]
    }
    pack(left, 1).unionByName(pack(right, 0))
      .groupByKey(_.key)
      .flatMapGroupsWithState[Vector[(Double, String)], AsofEnriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, evs, state: GroupState[Vector[(Double, String)]]) =>
          var hist = state.getOption.getOrElse(Vector.empty)
          val out = Vector.newBuilder[AsofEnriched]
          // per-batch event-time order, rights before lefts on ties; the
          // payload joins the sort key so duplicate (key, ts) right rows
          // have a deterministic winner — history keeps (ts, payload)
          // order and the reverse scan picks the max PAYLOAD STRING among
          // equal timestamps (the scoped divergence from the batch op's
          // typed tie keys — scaladoc above); grouped-iterator order
          // alone is partitioning-dependent
          evs.toVector.sortBy(e => (e.ts, e.side, e.payload)).foreach { e =>
            if (e.side == 0)
              hist = (hist :+ (e.ts, e.payload)).sorted.takeRight(historySize)
            else {
              val m = hist.reverseIterator.find(_._1 <= e.ts)
              out += AsofEnriched(k, e.ts, e.payload, m.map(_._1), m.map(_._2))
            }
          }
          state.update(hist)
          out.result().iterator
      }
  }

  // ------------------------------------------------------------------
  // Rx combinator family (reference op_structs.py:780-824): merge /
  // combine_latest / debounce. Same design rule as the rest of this
  // file: ONE DataFrame/Dataset plan serves batch (the DuckDB oracle)
  // and micro-batch streaming (StreamingSpec).
  // ------------------------------------------------------------------

  /** Rx `merge`: N streams into one, arrival-order, each row tagged with
    * its source index (`tagCol`). Schemas union by name, missing columns
    * null-filled. Narrow — no shuffle, no state — so it streams as-is. */
  def merge(streams: Seq[DataFrame], tagCol: String = "source"): DataFrame = {
    require(streams.nonEmpty, "merge of zero streams")
    // loud, not silent: withColumn REPLACES an existing column, so a
    // business column named like tagCol would be overwritten with source
    // indices in every row
    streams.zipWithIndex.foreach { case (df, i) =>
      require(!df.columns.contains(tagCol),
        s"merge: input $i already carries a '$tagCol' column — pass a " +
          "different tagCol or rename the input column")
    }
    streams.zipWithIndex
      .map { case (df, i) => df.withColumn(tagCol, lit(i)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  final case class Combined(key: String, ts: Double, side: Int,
      latest_left: String, latest_right: String)

  /** Rx `combine_latest`, keyed: each arriving event updates its side's
    * latest payload and emits the (left, right) pair — once both sides
    * have produced at least one value (the Rx gate). Keyed state is two
    * payload slots, O(1) per key. Same batch==stream contract as
    * [[asofEnrich]]: within a micro-batch events process in
    * (ts, side, payload) order, so batch mode (one batch = everything)
    * reproduces full arrival-order semantics deterministically — which is
    * what the DuckDB oracle mirrors with an IGNORE NULLS running window. */
  def combineLatest(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String): Dataset[Combined] = {
    val spark = left.sparkSession
    import spark.implicits._
    def pack(df: DataFrame, side: Int): Dataset[AsofEvent] = {
      val payloadCols = df.columns.filterNot(c => c == keyCol || c == tsCol)
      df.select(col(keyCol).cast("string").as("key"),
        graft.ops.TimeAxis.seconds(df, tsCol).as("ts"),
        lit(side).as("side"),
        to_json(struct(payloadCols.map(col): _*)).as("payload"))
        .as[AsofEvent]
    }
    pack(left, 0).unionByName(pack(right, 1))
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Option[String], Option[String]), Combined](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, evs, state: GroupState[(Option[String], Option[String])]) =>
          var (l, r) = state.getOption.getOrElse(
            (Option.empty[String], Option.empty[String]))
          val out = Vector.newBuilder[Combined]
          evs.toVector.sortBy(e => (e.ts, e.side, e.payload)).foreach { e =>
            if (e.side == 0) l = Some(e.payload) else r = Some(e.payload)
            if (l.isDefined && r.isDefined)
              out += Combined(k, e.ts, e.side, l.get, r.get)
          }
          state.update((l, r))
          out.result().iterator
      }
  }

  /** Rx `debounce`, completed-source semantics (event-time): an event
    * emits iff no later event arrives on the same key within `quiet` — on
    * the TimeAxis.seconds scale of `tsCol` (epoch seconds for timestamp /
    * timestamp_ntz axes, raw units for numeric axes, e.g. µs when tsCol
    * holds unix micros); each key's final event always emits (the source
    * is complete). One keyed lead() window — the batch face;
    * [[debounceStream]] is the streaming-native timer variant of the same
    * semantics. `tieBreak` columns make the per-key order total when
    * `tsCol` alone is not. */
  def debounce(events: DataFrame, keyCol: String, tsCol: String,
      quiet: Double, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((tsCol +: tieBreak).map(c => col(c).asc): _*)
    val axis = events.schema(tsCol).dataType
    def sec(c: org.apache.spark.sql.Column) = graft.ops.TimeAxis.seconds(axis, c)
    events
      .withColumn("__next", lead(col(tsCol), 1).over(w))
      .filter(col("__next").isNull ||
        sec(col("__next")) - sec(col(tsCol)) > quiet)
      .drop("__next")
  }

  final case class DebEvent(key: String, ts: java.sql.Timestamp, payload: String)
  final case class Debounced(key: String, ts: java.sql.Timestamp, payload: String)

  /** Streaming-native debounce: keyed state holds the newest pending
    * event plus a bounded log of recent event TIMESTAMPS; an arriving
    * in-order event supersedes the pending (gap ≤ quiet) or flushes it
    * (gap > quiet), and an EVENT-TIME TIMER at pending.ts + quiet flushes
    * it when the watermark passes with nothing newer — so a quiet key's
    * last event emits without waiting for the next one. A LATE
    * in-watermark event is judged against its TRUE event-time successor
    * from the ts log — judging it against the pending alone emitted
    * events whose real successor was within quiet (a spurious emission
    * whenever a late event's neighbor had already flushed through).
    * The log keeps the newest `logSize` timestamps (the asofEnrich
    * history bound); an event later than the watermark but older than
    * the whole log falls back to the nearest LOGGED successor. Caller
    * sets the watermark (`withWatermark(tsCol, ...)`); ms precision
    * (timer API granularity). In batch mode timers never fire, so each
    * key's trailing pending stays unflushed — batch output is exactly
    * [[debounce]] minus the per-key final event (spec-asserted); use
    * [[debounce]] for completed sources. */
  def debounceStream(events: DataFrame, keyCol: String, tsCol: String,
      quietMs: Long, logSize: Int = 64): Dataset[Debounced] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(events.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"debounceStream: '$tsCol' must be a timestamp (a cast here would " +
        "strip the caller's watermark metadata)")
    val payloadCols = events.columns.filterNot(c => c == keyCol || c == tsCol)
    val packed = events.select(col(keyCol).cast("string").as("key"),
      col(tsCol).as("ts"),
      to_json(struct(payloadCols.map(col): _*)).as("payload"))
      .as[DebEvent]
    packed
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Seq[Long], Long, String), Debounced](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (k, evs, state: GroupState[(Seq[Long], Long, String)]) =>
          if (state.hasTimedOut) {
            val (_, pts, pp) = state.get
            // the log dies with the pending: any future event's ts is
            // >= the watermark > pending + quiet, so nothing older than
            // the flushed pending can ever probe for a successor again
            state.remove()
            Iterator.single(Debounced(k, new java.sql.Timestamp(pts), pp))
          } else {
            var (tsLog, pending) = state.getOption
              .map { case (log, pts, pp) => (log, Some((pts, pp))) }
              .getOrElse((Seq.empty[Long], Option.empty[(Long, String)]))
            val out = Vector.newBuilder[Debounced]
            evs.toVector.sortBy(e => (e.ts.getTime, e.payload)).foreach { e =>
              val ets = e.ts.getTime
              pending match {
                case Some((pts, pp)) if ets >= pts =>
                  // in-order: e IS the pending's event-time successor
                  // among seen events (every logged ts <= the pending) —
                  // flush iff the gap exceeds quiet, then e takes over
                  if (ets - pts > quietMs)
                    out += Debounced(k, new java.sql.Timestamp(pts), pp)
                  tsLog = (tsLog :+ pts).sorted.takeRight(logSize)
                  pending = Some((ets, e.payload))
                case Some((pts, _)) =>
                  // late (in-watermark, older than the pending): judge it
                  // against its TRUE event-time successor — the smallest
                  // logged/pending ts after it. Comparing to the pending
                  // alone emitted events whose real successor (an already
                  // flushed or suppressed neighbor) was within quiet.
                  // The pending — the newest event — stays pending.
                  val succ = (tsLog.filter(_ > ets) :+ pts).min
                  if (succ - ets > quietMs)
                    out += Debounced(k, e.ts, e.payload)
                  tsLog = (tsLog :+ ets).sorted.takeRight(logSize)
                case None =>
                  pending = Some((ets, e.payload))
              }
            }
            pending.foreach { case (pts, pp) =>
              state.update((tsLog, pts, pp))
              state.setTimeoutTimestamp(pts + quietMs)
            }
            out.result().iterator
          }
      }
  }

  /** Run any events→DataFrame transform as a real micro-batch stream over
    * the events parquet and collect the final result from a memory sink.
    * `maxFilesPerTrigger=1` keeps it honestly incremental. `mode` must
    * match the transform: Complete for unwatermarked aggregations (the
    * default), Append for narrow/stateful transforms (filters, dedup,
    * flatMapGroupsWithState) — Spark rejects the wrong pairing. */
  def runAsStream(spark: SparkSession, sfDir: String,
      transform: DataFrame => DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    // The file-stream source wants a directory; stage the single parquet
    // into a temp dir (in production the feed IS a directory/CDF).
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        dir.resolve("events.parquet"))
      val raw = spark.readStream
        .schema(graft.Tables.table(spark, sfDir, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
      // same canonicalization as the batch loader (Tables.events) so the
      // batch == stream parity specs compare like-typed frames whatever the
      // parquet time encoding (ns-long / µs NTZ / µs LTZ)
      val events = graft.ops.TimeAxis.normalize(raw, "ts")
      val q = transform(events).writeStream
        .outputMode(mode)
        .format("memory").queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
      // the memory sink holds the result ROWS (not a view over the staged
      // file), so the copy can be deleted immediately — every invocation
      // used to leak a full events.parquet copy in /tmp, forever
      spark.table(queryName)
    } finally graft.core.Fs.rm(dir.toFile)
  }
}
