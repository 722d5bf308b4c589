package graft.wrangling

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ANN-index-on-ingest: maintain a durable IVF index as vectors arrive —
  * the similarity-search twin of [[IncrementalDedup]] (embeddings trickle
  * in forever; rebuilding the inverted file over the full corpus per
  * delivery is linear re-work per tick, quadratic over a backfill).
  *
  * Operating model (the standard IVF one): the coarse quantizer is a
  * MODEL. [[bootstrap]] trains it once on the seed corpus (Lloyd's —
  * [[Similarity.ivfTrain]], vectors never leave the cluster) and writes
  * the seed posting lists partitioned by cell. Each incremental tick then
  * assigns its batch against the FROZEN centroids — one codegen'd
  * broadcast-argmax map over the batch, no shuffle, no retrain — and
  * appends to the posting tree. Frozen-centroid assignment is also what
  * makes streamed == batch provable: the same vector lands in the same
  * cell either way, so the union index is definitionally the batch index
  * (spec'd). Re-training (drift repair) is an offline [[bootstrap]]
  * rebuild, as in every production IVF system.
  *
  * Exactly-once without a commit log: tick deltas land under
  * `postings_delta/batch=<engine batchId>/` with Overwrite — a replayed
  * micro-batch (crash between the write and the checkpoint commit)
  * overwrites ITS OWN directory and nothing else, so replays are
  * idempotent by construction (the engine's batchId is
  * checkpoint-persisted and monotone across restarts).
  *
  * Scale shape: per tick O(batch × k) assignment work, append-only I/O.
  * Both the seed tree and every delta tree are partitioned by `__ci`, so
  * an nprobe probe over [[postings]] still reads only matching cell
  * directories in every tree (PartitionFilters prune the rest unread) —
  * the at-rest layout stays the [[Similarity.ivfSave]] one as the corpus
  * grows. Deltas accumulate one directory per tick; folding them into the
  * seed tree is the same maintenance-window compaction the graph store
  * runs (GraphStore.compact), not a query-path concern. */
object IncrementalAnn {

  /** Train the coarse quantizer on the seed corpus and publish the index
    * layout (seed postings partitioned by cell + centroid side table).
    * Returns the centroids so the caller can keep assigning in-session. */
  def bootstrap(seed: DataFrame, dir: String, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): Seq[Array[Double]] = {
    val cents = Similarity.ivfTrain(seed, idCol, vecCol, k, iters)
    Similarity.ivfSave(
      Similarity.ivfIndex(seed, idCol, vecCol, cents), cents, dir)
    // a RE-bootstrap (the documented drift-repair rebuild) must reset the
    // delta root with the seed: stale tick deltas were assigned under the
    // PREVIOUS centroids — unioned with the new seed they sit in wrong
    // cells (unreachable at their true probe cells, a silent recall hole)
    // and duplicate every re-seeded id. Maintenance-window op like
    // compact: a crash between the save above and this reset is repaired
    // by re-running bootstrap.
    val deltaRoot = s"$dir/postings_delta"
    graft.core.Fs.rm(deltaRoot)
    graft.core.Fs.mkdirs(deltaRoot)
    cents
  }

  /** The frozen coarse quantizer, from the durable side table. Reads ONLY
    * `dir/centroids` — going through ivfLoad would list and schema-infer
    * the whole postings tree just to discard it, and would fail while the
    * seed tree is staged aside inside a compact swap window even though
    * the side table is intact. */
  def centroids(spark: SparkSession, dir: String): Seq[Array[Double]] =
    Similarity.ivfLoadCentroids(spark, dir)

  /** One tick: assign the batch against the frozen centroids and land it
    * in the tick's own delta directory (idempotent under replay). An
    * EMPTY tick writes nothing: a data-less `batch=N` directory poisons
    * [[postings]]' delta read when no other delta exists (parquet schema
    * inference has no file to read), and skipping is replay-safe — a
    * batchId's content is checkpoint-deterministic, so an empty batch
    * can only ever replay as empty. */
  def ingestTick(batch: DataFrame, dir: String, idCol: String,
      vecCol: String, cents: Seq[Array[Double]], batchId: Long): Unit = {
    // the emptiness probe is a limit-1 job over the source — cheaper than
    // the assignment+write it skips, and free relative to a real tick
    if (batch.isEmpty) return
    batch.select(col(idCol), col(vecCol))
      .withColumn("__ci", Similarity.ivfAssign(col(vecCol), cents))
      .write.mode(SaveMode.Overwrite).partitionBy("__ci")
      .parquet(s"$dir/postings_delta/batch=$batchId")
  }

  /** Streaming entry: each micro-batch is one tick. Bounded by default
    * (AvailableNow); pass a processing-time trigger for a live feed. */
  def streamToIndex(stream: DataFrame, dir: String, idCol: String,
      vecCol: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = stream.sparkSession
    heal(dir) // writer-side: adopt a crashed compact before appending
    val cents = centroids(spark, dir)
    stream.writeStream
      .queryName("graft-ann-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestTick(batch, dir, idCol, vecCol, cents, batchId)
        ()
      }
      .start()
  }

  /** The full posting set: seed tree ∪ delta trees. Cell stays a
    * partition column in both reads, so `Similarity.ivfTopK` probes
    * prune to nprobe directories across every tree. Readers never
    * mutate the index (GraphStore round-10 policy); inside a crashed
    * compact's swap window the seed tree is staged aside and this
    * throws — run [[heal]] (or any writer entry) to recover. */
  def postings(spark: SparkSession, dir: String, idCol: String,
      vecCol: String): DataFrame = {
    require(graft.core.Fs.exists(s"$dir/postings"),
      s"$dir/postings is staged aside (crashed compact swap?): " +
        "run IncrementalAnn.heal to recover, then reload")
    val seedTree = spark.read.parquet(s"$dir/postings")
      .select(col(idCol), col(vecCol), col("__ci"))
    val hasDelta = graft.core.Fs.listNames(s"$dir/postings_delta")
      .exists(_.startsWith("batch="))
    if (!hasDelta) seedTree
    else seedTree.unionByName(
      spark.read.parquet(s"$dir/postings_delta")
        .select(col(idCol), col(vecCol), col("__ci")))
  }

  /** Fold accumulated tick deltas into the seed tree — the
    * one-directory-per-tick debt of a long ingest run, settled in a
    * maintenance window (same operating contract as GraphStore.compact:
    * stop the ingest stream, compact, restart with a fresh checkpoint;
    * batch probes are safe outside the brief swap window). The folded
    * union lands COMPLETELY beside the live tree, then swaps in via
    * renames; the delta root is staged aside BEFORE the seed swap so a
    * crash anywhere leaves either the original index or the folded one —
    * never both copies of a delta vector visible. */
  def compact(spark: SparkSession, dir: String, idCol: String,
      vecCol: String): Unit = {
    heal(dir) // writer-side: adopt a crashed predecessor first
    // the folded union must be COMPUTED from the live trees before
    // StagedSwap stages the delta root aside — hence the read inside the
    // write callback (swapIn writes staging FIRST, renames after)
    graft.core.StagedSwap.swapIn(dir, "postings",
        retire = Seq("postings_delta")) { staging =>
      postings(spark, dir, idCol, vecCol)
        .write.mode(SaveMode.Overwrite).partitionBy("__ci").parquet(staging)
    }
  }

  /** Writer-side recovery from a compact() crash — delegates to
    * [[graft.core.StagedSwap.heal]] with the delta root as the retired
    * tree (see that object's window-by-window contract). A directory
    * with NEITHER postings nor postings__old is not an index at all:
    * reject loudly instead of "healing" it into an empty one. */
  def heal(dir: String): Unit = {
    require(graft.core.Fs.exists(s"$dir/postings") ||
        graft.core.Fs.exists(s"$dir/postings__old"),
      s"$dir has neither postings nor postings__old — not an index")
    graft.core.StagedSwap.heal(dir, "postings",
      retire = Seq("postings_delta"))
  }
}
