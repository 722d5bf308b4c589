package graft.wrangling

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Dedup-on-ingest: maintain a durable MinHash-LSH index and near-dup-check
  * every arriving document against the EXISTING corpus at arrival time —
  * the shape a training-data pipeline actually runs (documents trickle in
  * forever; an all-pairs batch dedup over the full corpus per delivery is
  * quadratic re-work). Each tick:
  *
  *   1. band the batch's documents ([[Dedup.portableBands]] — the same
  *      engine-portable md5 banding the batch path uses, so streamed and
  *      batch results are definitionally comparable),
  *   2. candidate pairs = batch bands equi-joined against the stored index
  *      (cross-tick pairs) plus the batch's own band self-join (same-tick
  *      pairs) — never an all-pairs scan,
  *   3. verify candidates by EXACT shingle-set Jaccard (shingle arrays are
  *      part of the index: the dedup working set a real pipeline persists),
  *   4. append verified pairs to `flags/`, append the batch's bands and
  *      shingles to the index.
  *
  * The final FLAG SET is batching-independent: a qualifying pair is
  * emitted exactly once — when its later member arrives, the earlier one
  * is already indexed (or both arrive together and the self-join sees
  * them). Streaming the corpus in any split must therefore reproduce the
  * batch [[Dedup.minhashDedupPairsPortable]] pair set exactly; the oracle
  * checks precisely that.
  *
  * Scale shape: per tick, work is O(batch) banding + two equi-joins whose
  * left side is the batch (AQE broadcasts it against the streamed index
  * scan) + Jaccard over the candidate set. The index grows as
  * O(corpus x bands) keys + O(corpus) shingle arrays — the standard
  * persisted-LSH footprint; at 100 TB the bands table would be bucketed
  * by (band, bv) so candidate probes co-locate without a shuffle. */
object IncrementalDedup {

  private val BandsSchema = "doc_id LONG, band INT, bv STRING"
  private val ShinglesSchema = "doc_id LONG, sh ARRAY<STRING>"
  private val FlagsSchema = "id_a LONG, id_b LONG, jaccard DOUBLE, tick INT"

  /** Create an empty index at `dir` (idempotent). Sub-dirs are pre-created
    * so schema'd readers work before the first tick lands. */
  def publish(dir: String): Unit =
    Seq("bands", "shingles", "flags").foreach(sub =>
      new java.io.File(s"$dir/$sub").mkdirs())

  def bands(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(BandsSchema).parquet(s"$dir/bands")
  def shingles(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(ShinglesSchema).parquet(s"$dir/shingles")
  /** Flagged pairs. Deduped by pair id on read: flags are written BEFORE
    * the tick's index append (a crash in between must lose no pair —
    * the replayed batch re-detects and re-flags it, and this dedup
    * absorbs the duplicate row; the opposite order would drop the pair
    * forever). A pair appears at most twice and only across a crash
    * boundary, so the dedup is a no-op in healthy runs. */
  def flags(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(FlagsSchema).parquet(s"$dir/flags")
      .dropDuplicates("id_a", "id_b")

  /** One ingest tick: flag `batch`'s documents against the index and each
    * other, then index them. Returns the number of pairs flagged. */
  def ingestTick(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      numHashes: Int = 16, bandCount: Int = 8, shingleN: Int = 1,
      tick: Int = 0): Long = {
    // idempotence under at-least-once delivery: a replayed document must
    // not self-pair or re-flag its pairs — drop in-batch id duplicates,
    // then anti-join against the ids already indexed (a small broadcast
    // probe of this batch against the index's id column). Checkpointed
    // ONCE: both the banding and the shingle derivation branch off it,
    // and a lazy `fresh` would re-run the index anti-join per branch.
    val fresh = batch.dropDuplicates(idCol)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .join(shingles(spark, dir).select(col("doc_id")), Seq("doc_id"),
        "left_anti")
      .localCheckpoint(true)
    // materialized too: banding is the dominant per-row cost and three
    // consumers reference it (cross-join probe, self-join, index append)
    val newBands = Dedup.portableBands(fresh, "doc_id", "__text",
      numHashes, bandCount, shingleN)
      .select(col("doc_id"), col("band"), col("bv"))
      .localCheckpoint(true)
    val newShingles = fresh.select(col("doc_id"),
      TextOps.wordShingles(col("__text"), shingleN).as("sh"))
      .localCheckpoint(true)

    // cross-tick candidates: the new docs' band keys probe the stored
    // index (the earlier member of every cross pair is already there)
    val stored = bands(spark, dir)
    val cross = newBands.join(stored
        .select(col("band"), col("bv"), col("doc_id").as("__old")),
        Seq("band", "bv"))
      // self-pair guard: after a crash between the bands and shingles
      // writes, a replayed doc's own band rows are already stored (the
      // shingles table is the commit marker the replay anti-join keys
      // on), so the probe would pair it with itself
      .filter(col("doc_id") =!= col("__old"))
      .select(least(col("doc_id"), col("__old")).as("id_a"),
        greatest(col("doc_id"), col("__old")).as("id_b"))
    // same-tick candidates: the batch's own self-join
    val within = newBands.join(newBands
        .select(col("band"), col("bv"), col("doc_id").as("__peer")),
        Seq("band", "bv"))
      .filter(col("doc_id") < col("__peer"))
      .select(col("doc_id").as("id_a"), col("__peer").as("id_b"))
    val cands = cross.unionByName(within).distinct()

    // exact shingle-set Jaccard; the old side's shingles come from the
    // index (no text re-read), the new side's from this batch
    val allSh = shingles(spark, dir).unionByName(newShingles)
    val verified = cands
      .join(allSh.select(col("doc_id").as("id_a"), col("sh").as("__sha")), "id_a")
      .join(allSh.select(col("doc_id").as("id_b"), col("sh").as("__shb")), "id_b")
      .withColumn("__inter", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("jaccard", col("__inter").cast("double") /
        (size(col("__sha")) + size(col("__shb")) - col("__inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"),
        lit(tick).as("tick"))
      .localCheckpoint(true)

    val n = verified.count()
    if (n > 0)
      verified.coalesce(1).write.mode("append").parquet(s"$dir/flags")
    // crash-window symmetry: a doc whose band rows landed but whose
    // shingle (commit-marker) write did not is re-processed on replay —
    // its bands must not append a second copy (the index would fan every
    // future probe of those keys out 2x, forever)
    newBands
      .join(bands(spark, dir).select(col("doc_id")), Seq("doc_id"),
        "left_anti")
      .coalesce(1).write.mode("append").parquet(s"$dir/bands")
    newShingles.coalesce(1).write.mode("append").parquet(s"$dir/shingles")
    n
  }

  /** Streaming entry: each micro-batch is one tick. Bounded by default
    * (AvailableNow); pass a processing-time trigger for a live feed. */
  def streamToIndex(stream: DataFrame, dir: String, idCol: String,
      textCol: String, threshold: Double, checkpointDir: String,
      numHashes: Int = 16, bandCount: Int = 8, shingleN: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = stream.sparkSession
    publish(dir)
    stream.writeStream
      .queryName("graft-dedup-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the engine's batchId is checkpoint-persisted, so flag
        // provenance stays monotone across query restarts (a closure
        // counter would reset to 0 and misattribute post-restart pairs)
        ingestTick(spark, dir, batch, idCol, textCol, threshold,
          numHashes, bandCount, shingleN, tick = batchId.toInt + 1)
        ()
      }
      .start()
  }
}
