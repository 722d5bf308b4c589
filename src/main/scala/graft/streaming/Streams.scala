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

  final case class KeyedEvent(user_id: Long, event_type: String, value: Double)
  final case class CountWindow(user_id: Long, window_idx: Long, n: Int,
      sum_value: Double)

  /** Count-based windows (zef `chunk[n]` on a stream, impl.py:1306): every
    * `n` events per key emit one window — arrival-order state via
    * flatMapGroupsWithState, the Spark home for Rx-style count semantics. */
  def countWindows(events: Dataset[KeyedEvent], n: Int): Dataset[CountWindow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Int, Double), CountWindow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[(Long, Int, Double)]) =>
          var (widx, cnt, acc) = state.getOption.getOrElse((0L, 0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer[CountWindow]()
          evs.foreach { e =>
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
    * reproduces the exact batch as-of join (spec-asserted parity). Across
    * micro-batches, a right row arriving AFTER a left row was already
    * emitted does not retro-update it — standard streaming enrichment
    * semantics; bound staleness with source ordering or a larger trigger.
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
        col(tsCol).cast("double").as("ts"),
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
          // per-batch event-time order, rights before lefts on ties
          evs.toVector.sortBy(e => (e.ts, e.side)).foreach { e =>
            if (e.side == 0)
              hist = (hist :+ (e.ts, e.payload)).sortBy(_._1)
                .takeRight(historySize)
            else {
              val m = hist.reverseIterator.find(_._1 <= e.ts)
              out += AsofEnriched(k, e.ts, e.payload, m.map(_._1), m.map(_._2))
            }
          }
          state.update(hist)
          out.result().iterator
      }
  }

  /** Run any events→DataFrame transform as a real micro-batch stream over
    * the events parquet and collect the final result from a memory sink.
    * `maxFilesPerTrigger=1` keeps it honestly incremental. */
  def runAsStream(spark: SparkSession, sfDir: String,
      transform: DataFrame => DataFrame, queryName: String): DataFrame = {
    // The file-stream source wants a directory; stage the single parquet
    // into a temp dir (in production the feed IS a directory/CDF).
    val dir = java.nio.file.Files.createTempDirectory(s"graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.readStream
      .schema(graft.Tables.table(spark, sfDir, "events").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val ns = raw.schema("ts").dataType.typeName == "long"
    val events = if (ns)
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else raw
    val q = transform(events).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
