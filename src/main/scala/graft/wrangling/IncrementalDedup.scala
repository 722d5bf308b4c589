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
  * by (band, bv) so candidate probes co-locate without a shuffle.
  *
  * On-disk layout (v2): ONE `atoms/` tree holds both row kinds in a
  * tagged flat schema — band rows (sh null) and shingle rows (band/bv
  * null, sh the commit payload). A tick appends ONE coalesced file, so a
  * document's bands and shingles commit ATOMICALLY (the single part
  * file's rename is the commit point); the v1 two-tree layout had a
  * crash window between the bands append and the shingles append that
  * needed a replay-detection probe + anti-join every tick, forever, to
  * guard a once-per-crash event. Columnar projection keeps the reads as
  * cheap as two trees: the band probe reads (doc_id, band, bv) pages
  * only, never the shingle arrays. Indexes written by the v1 layout are
  * not readable — rebuild (re-ingest) them. */
object IncrementalDedup {

  private val AtomsSchema =
    "doc_id LONG, band INT, bv STRING, sh ARRAY<STRING>"
  private val FlagsSchema = "id_a LONG, id_b LONG, jaccard DOUBLE, tick INT"

  /** The v2 layout has no `bands/`/`shingles/` trees — their presence IS
    * the v1 signature. Without this guard a v1 index fails with a raw
    * path-not-found on `atoms/` — or worse, [[publish]] on a v1 dir
    * creates an EMPTY `atoms/` and every read silently sees an empty
    * index: re-ingest re-flags the whole corpus from scratch with the old
    * flags still sitting beside the new ones. */
  private def requireV2(dir: String): Unit =
    Seq("bands", "shingles").foreach(v1 =>
      require(!graft.core.Fs.isDir(s"$dir/$v1"),
        s"IncrementalDedup: $dir holds a v1 (bands/shingles two-tree) " +
          "index — the v2 atomic-commit layout cannot read it; rebuild " +
          "by re-ingesting the corpus into a fresh directory"))

  /** Create an empty index at `dir` (idempotent). Sub-dirs are pre-created
    * so schema'd readers work before the first tick lands. Refuses a v1
    * two-tree index (see [[requireV2]]). */
  def publish(dir: String): Unit = {
    requireV2(dir)
    Seq("atoms", "flags").foreach(sub =>
      graft.core.Fs.mkdirs(s"$dir/$sub"))
  }

  private def atoms(spark: SparkSession, dir: String): DataFrame = {
    requireV2(dir)
    spark.read.schema(AtomsSchema).parquet(s"$dir/atoms")
  }
  def bands(spark: SparkSession, dir: String): DataFrame =
    atoms(spark, dir).filter(col("band").isNotNull)
      .select(col("doc_id"), col("band"), col("bv"))
  def shingles(spark: SparkSession, dir: String): DataFrame =
    atoms(spark, dir).filter(col("band").isNull)
      .select(col("doc_id"), col("sh"))
  /** Flagged pairs. Deduped by pair id on read: flags are written BEFORE
    * the tick's index append (a crash in between must lose no pair —
    * the replayed batch re-detects and re-flags it, and this dedup
    * absorbs the duplicate row; the opposite order would drop the pair
    * forever). A pair appears at most twice and only across a crash
    * boundary, so the dedup is a no-op in healthy runs. */
  def flags(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(FlagsSchema).parquet(s"$dir/flags")
      .dropDuplicates("id_a", "id_b")

  /** Total row count of a staged parquet dir from its file footers —
    * driver-side metadata, zero Spark jobs. Listing and footer reads go
    * through the Hadoop FileSystem API (the session's conf), so the index
    * may live on any scheme the rest of this module's side-state does. */
  private def parquetRowCount(spark: SparkSession, dir: String): Long =
    graft.core.Fs.listStatus(dir)
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("."))
      .map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          p, spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum

  /** One ingest tick: flag `batch`'s documents against the index and each
    * other, then index them. Returns the number of pairs flagged. */
  def ingestTick(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      numHashes: Int = 16, bandCount: Int = 8, shingleN: Int = 1,
      tick: Int = 0): Long = {
    // the index schema keys documents by LONG ids; a silent cast would
    // collapse every non-numeric id to one NULL doc_id and mis-dedup the
    // whole corpus — reject the batch loudly instead (same convention as
    // SqlImport/NestedInfer: corrupt identity is an error, not a coercion)
    val idType = batch.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"IncrementalDedup: id column '$idCol' is $idType — the durable " +
        "index keys documents by LONG doc_id; map string/other ids to a " +
        "stable integral id (e.g. xxhash64) before ingest")
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
    // ONE aggregate over the materialized checkpoint blocks answers both
    // per-tick probes (no extra scan of the source): null ids are identity
    // corruption (every null row would collapse into one doc under
    // dropDuplicates) and reject loudly; an empty tick (idle stream, or a
    // fully-replayed batch) is a TRUE no-op. NOT an observe() metric on
    // the checkpoint job: registering an Observation instantiates the
    // session's non-serializable ObservationManager and every LATER MLlib
    // task serialization in the JVM dies on it (the r14 SpanDedup
    // rejection, reproduced pairwise against TextClassifierSpec when this
    // module tried the API in r16).
    val freshStats = fresh.agg(count(lit(1)),
      count(when(col("doc_id").isNull, lit(1)))).collect()(0)
    require(freshStats.getLong(1) == 0L,
      s"IncrementalDedup: batch contains null '$idCol' ids — every " +
        "document needs a stable non-null id for the durable index")
    if (freshStats.getLong(0) == 0L) return 0L
    // banding (the dominant per-row cost) and shingle derivation are
    // materialized in ONE job as the FLAT tagged union the atoms tree
    // stores — checkpoint once, split by tag (a map over cached blocks),
    // and the same cached blocks later feed the index append unmodified.
    val bandRows = Dedup.portableBands(fresh, "doc_id", "__text",
      numHashes, bandCount, shingleN)
      .select(col("doc_id"), col("band"), col("bv"),
        lit(null).cast("array<string>").as("sh"))
    val shRows = fresh.select(col("doc_id"),
      lit(null).cast("int").as("band"), lit(null).cast("string").as("bv"),
      TextOps.wordShingles(col("__text"), shingleN).as("sh"))
    val packed = bandRows.unionByName(shRows).localCheckpoint(true)
    val newBands = packed.filter(col("band").isNotNull)
      .select(col("doc_id"), col("band"), col("bv"))
    val newShingles = packed.filter(col("band").isNull)
      .select(col("doc_id"), col("sh"))

    // candidates, ONE checkpoint: cross-tick pairs (the new docs' band
    // keys probe the stored index — the earlier member of every cross
    // pair is already there; the tick's ONLY full scan of stored bands)
    // unioned with same-tick pairs (the batch's own band self-join).
    // Self-matches are unreachable: the atomic atoms append means a doc
    // the anti-join called fresh has NO stored rows — the =!= filter is
    // a zero-cost invariant guard, not a replay mechanism.
    val stored = bands(spark, dir)
    val cross = newBands.join(stored
        .select(col("band"), col("bv"), col("doc_id").as("__old")),
        Seq("band", "bv"))
      .filter(col("doc_id") =!= col("__old"))
      .select(least(col("doc_id"), col("__old")).as("id_a"),
        greatest(col("doc_id"), col("__old")).as("id_b"))
    val within = newBands.join(newBands
        .select(col("band"), col("bv"), col("doc_id").as("__peer")),
        Seq("band", "bv"))
      .filter(col("doc_id") < col("__peer"))
      .select(col("doc_id").as("id_a"), col("__peer").as("id_b"))
    val cands = cross.unionByName(within).distinct().localCheckpoint(true)

    // exact shingle-set Jaccard; the old side's shingles come from the
    // index (no text re-read), the new side's from this batch. The stored
    // tree is first narrowed ONCE by the (candidate-sized) id set and
    // materialized — joining the full tree twice (id_a side and id_b
    // side) paid two O(corpus) reads of the shingle parquet per tick
    // where the bands probe pays one.
    val candIds = cands.select(col("id_a").as("doc_id"))
      .unionByName(cands.select(col("id_b").as("doc_id"))).distinct()
    val allSh = shingles(spark, dir)
      .join(candIds, Seq("doc_id"), "left_semi")
      .unionByName(newShingles)
      .localCheckpoint(true)
    val verified = cands
      .join(allSh.select(col("doc_id").as("id_a"), col("sh").as("__sha")), "id_a")
      .join(allSh.select(col("doc_id").as("id_b"), col("sh").as("__shb")), "id_b")
      .withColumn("__inter", size(array_intersect(col("__sha"), col("__shb"))))
      // zero-union guard mirrors Dedup.jaccardForPairs exactly: the LSH
      // gate makes an empty-vs-empty candidate unreachable (shingle-less
      // docs band to nothing), but the verify formula must stay
      // IDENTICAL to the batch path's — streamed == batch is the contract
      .withColumn("jaccard", col("__inter").cast("double") /
        nullif((size(col("__sha")) + size(col("__shb")) - col("__inter"))
          .cast("double"), lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"),
        lit(tick).as("tick"))

    // flags land via write-then-adopt: ONE job writes the verified pairs
    // to a dot-prefixed staging dir inside flags/ (invisible to readers);
    // the row count is read off the staged file's parquet FOOTER — driver
    // metadata, no job (and NOT an observe() metric: the Observation API
    // poisons later MLlib task serialization, see the fresh-probe note
    // above). The v1 shape (checkpoint, count job, re-read-and-write job)
    // paid two extra scheduled jobs per tick for the same bytes. n > 0
    // adopts the part file into flags/; an empty result just drops the
    // staging dir, so pair-less ticks leave no file litter.
    val stagingName = s".tick-$tick-" +
      java.util.UUID.randomUUID().toString.take(8)
    val staging = s"$dir/flags/$stagingName"
    verified.coalesce(1).write.mode("overwrite").parquet(staging)
    val n = parquetRowCount(spark, staging)
    if (n > 0) {
      val part = graft.core.Fs.listNames(staging)
        .filter(_.endsWith(".parquet"))
      require(part.length == 1, s"expected one staged flag file, got ${part.length}")
      val dst = s"$dir/flags/${stagingName.stripPrefix(".")}.parquet"
      require(graft.core.Fs.rename(s"$staging/${part.head}", dst),
        s"flag adopt failed: $dst")
    }
    graft.core.Fs.rm(staging)
    // index append: the tick's bands and shingles commit TOGETHER as one
    // coalesced file straight from packed's cached blocks — the rename of
    // that single part file is the tick's atomic commit point. Ordering
    // (flags first) keeps the crash contract: a crash before this write
    // replays the whole batch (the anti-join still sees the docs as new),
    // re-detects, and re-flags — the reader-side pair dedup absorbs it.
    packed.coalesce(1).write.mode("append").parquet(s"$dir/atoms")
    n
  }

  /** Fold the per-tick append files of the three index trees into
    * consolidated ones. Appends are one file per tick per tree BY DESIGN
    * (file ≈ tick keeps the commit protocol simple), so a long ingest
    * run leaves every probe paying a file-open per historical tick —
    * the same debt GraphStore.compact settles for the graph's append
    * logs, settled here with the same idiom: each tree's rewrite lands
    * COMPLETELY beside the live one, then swaps in via two renames
    * (writer-side [[heal]] on entry adopts a crashed predecessor;
    * readers never mutate, and a reader inside the brief swap window
    * errors on the missing directory rather than seeing half a store).
    * Maintenance-window op vs live ingest tails, like GraphStore.compact:
    * stop the stream, compact, restart with a fresh checkpoint. Also
    * settles crash-window duplicate flag rows ([[flags]] dedups them on
    * every read until compaction rewrites the deduped set). */
  def compact(spark: SparkSession, dir: String): Unit = {
    heal(dir)
    def swapIn(sub: String)(df: DataFrame): Unit =
      graft.core.StagedSwap.swapIn(dir, sub)(staging =>
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging))
    swapIn("atoms")(atoms(spark, dir))
    swapIn("flags")(flags(spark, dir))
  }

  /** Writer-side recovery from a [[compact]] crash — delegates to
    * [[graft.core.StagedSwap.heal]] per tree (see that object's
    * window-by-window contract) — and from a tick crash inside the flag
    * write-then-adopt window: a dot-prefixed `.tick-*` staging dir whose
    * tick died between the staged write and the adopt/cleanup is dead
    * weight (readers ignore dot-dirs; the replayed tick stages under a
    * fresh uuid), but it accumulates across crashes — sweep them here. */
  def heal(dir: String): Unit = {
    requireV2(dir)
    graft.core.StagedSwap.healAll(dir, Seq("atoms", "flags"))
    graft.core.Fs.listStatus(s"$dir/flags")
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".tick-"))
      .foreach(st => graft.core.Fs.rm(st.getPath.toString))
  }

  /** Streaming entry: each micro-batch is one tick. Bounded by default
    * (AvailableNow); pass a processing-time trigger for a live feed. */
  def streamToIndex(stream: DataFrame, dir: String, idCol: String,
      textCol: String, threshold: Double, checkpointDir: String,
      numHashes: Int = 16, bandCount: Int = 8, shingleN: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = stream.sparkSession
    heal(dir) // writer-side: adopt a crashed compact before appending
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
