package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.wrangling.{Dedup, IncrementalDedup}

final case class Doc(doc_id: Long, text: String)

/** Dedup-on-ingest: the incremental LSH index must reproduce the batch
  * near-dup pair set under ANY batching, flag cross-tick pairs when the
  * later member arrives, and stay idempotent under replay. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ingest(dir: String, rounds: Seq[Seq[Doc]]): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = IncrementalDedup.streamToIndex(input.toDF(), dir,
      "doc_id", "text", threshold = 0.5, checkpointDir = tmp("dedup_ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try rounds.foreach { r => input.addData(r); q.processAllAvailable() }
    finally q.stop()
  }

  private def flagSet(dir: String): Set[(Long, Long, Double)] =
    IncrementalDedup.flags(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet

  // near-dup cluster (pairwise Jaccard >= 0.5) + two unrelated docs
  private val corpus = Seq(
    Doc(1, "the quick brown fox jumps over the lazy dog"),
    Doc(2, "the quick brown fox jumps over the lazy cat"),
    Doc(3, "the quick brown fox leaps over the lazy dog"),
    Doc(4, "entirely different content about spark and scala"),
    Doc(5, "unrelated text mentioning parquet columnar storage"))

  private def batchPairs: Set[(Long, Long, Double)] = {
    import spark.implicits._
    Dedup.minhashDedupPairsPortable(corpus.toDF(), "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
  }

  test("streamed flags equal the batch LSH dedup pair set, any batching") {
    val expected = batchPairs
    assert(expected.nonEmpty) // the fixture must actually contain near-dups
    val splits = Seq(
      Seq(corpus.take(2), corpus.drop(2)),           // 2 ticks
      Seq(corpus.take(1), corpus.slice(1, 4), corpus.drop(4)), // 3 ticks
      Seq(corpus.reverse))                            // 1 tick, reversed
    splits.foreach { rounds =>
      val dir = tmp("dedup_idx")
      ingest(dir, rounds)
      assert(flagSet(dir) == expected,
        s"split ${rounds.map(_.map(_.doc_id))} diverged")
    }
  }

  test("a cross-tick pair is flagged when the later member arrives") {
    val dir = tmp("dedup_idx")
    ingest(dir, Seq(Seq(corpus(0), corpus(3)))) // doc 1 alone: nothing yet
    assert(flagSet(dir).isEmpty)
    ingest(dir, Seq(Seq(corpus(1))))            // doc 2 arrives -> pair (1,2)
    assert(flagSet(dir).map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("crash replay: flags written but index append not -> dedup absorbs, index once") {
    import spark.implicits._
    val dir = tmp("dedup_idx")
    ingest(dir, Seq(Seq(corpus(0)))) // doc 1 indexed cleanly
    // simulate the crash window of tick 2: the verified pair (1,2) landed
    // in flags/, the atomic atoms append did not (flags are written FIRST
    // so a crash between them loses no pair — the cost is a possible
    // duplicate flag row on replay, absorbed by the reader-side dedup)
    val j = {
      val dir2 = tmp("dedup_probe")
      IncrementalDedup.publish(dir2)
      ingest(dir2, Seq(Seq(corpus(0)), Seq(corpus(1))))
      flagSet(dir2).head._3
    }
    Seq((1L, 2L, j, 2)).toDF("id_a", "id_b", "jaccard", "tick")
      .coalesce(1).write.mode("append").parquet(s"$dir/flags")
    // replay of the batch: the anti-join keys on the atoms tree, so doc 2
    // is still "new" — the whole tick re-runs, re-flags (1,2), indexes
    ingest(dir, Seq(Seq(corpus(1))))
    val fs = flagSet(dir)
    assert(!fs.exists(p => p._1 == p._2))
    assert(fs.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // the pair appears once after the reader-side dedup...
    assert(IncrementalDedup.flags(spark, dir)
      .filter(col("id_a") === 1 && col("id_b") === 2).count() == 1)
    // ...and the raw tree really holds the crash duplicate it absorbed
    assert(spark.read.parquet(s"$dir/flags")
      .filter(col("id_a") === 1 && col("id_b") === 2).count() == 2)
    // the replay indexed doc 2 exactly once (bands and shingles commit
    // atomically in one file, so no partial-index window exists at all)
    val bandsPerDoc = IncrementalDedup.bands(spark, dir)
      .groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bandsPerDoc.values.toSet == Set(8L), s"band rows: $bandsPerDoc")
    assert(IncrementalDedup.shingles(spark, dir)
      .groupBy(col("doc_id")).count().collect()
      .forall(_.getLong(1) == 1L))
  }

  test("replay is idempotent: re-delivered docs add no flags or index rows") {
    val dir = tmp("dedup_idx")
    ingest(dir, Seq(corpus))
    val flags0 = flagSet(dir)
    val bands0 = IncrementalDedup.bands(spark, dir).count()
    ingest(dir, Seq(corpus)) // full replay
    assert(flagSet(dir) == flags0)
    assert(IncrementalDedup.bands(spark, dir).count() == bands0)
  }

  test("empty ticks are true no-ops: no index files, no probe cost, flags stable") {
    import spark.implicits._
    val dir = tmp("graft_dedup_empty")
    IncrementalDedup.publish(dir)
    def files(sub: String) =
      Option(new java.io.File(s"$dir/$sub").listFiles()).fold(0)(
        _.count(_.getName.endsWith(".parquet")))
    // an EMPTY first tick appends nothing anywhere (it used to land one
    // empty parquet file per tree per tick, forever on an idle stream)
    val empty = Seq.empty[Doc].toDF("doc_id", "text")
    assert(IncrementalDedup.ingestTick(spark, dir, empty, "doc_id", "text", 0.5) == 0L)
    assert(files("atoms") == 0 && files("flags") == 0)
    // a real tick, then a FULLY-REPLAYED tick (all ids already indexed —
    // fresh is empty after the anti-join): also a no-op. A pair-less tick
    // must leave no flag litter either (the staging dir is dropped, not
    // adopted) — corpus docs 3..5 share no near-dups, so tick 1's flags
    // here come only from docs 1-3's cluster.
    val docs = corpus.take(3).toDF()
    IncrementalDedup.ingestTick(spark, dir, docs, "doc_id", "text", 0.5)
    val (b1, f1) = (files("atoms"), files("flags"))
    val flagsBefore = flagSet(dir)
    assert(IncrementalDedup.ingestTick(spark, dir, docs, "doc_id", "text", 0.5) == 0L)
    assert((files("atoms"), files("flags")) == ((b1, f1)))
    assert(flagSet(dir) == flagsBefore)
    // pair-less tick: fresh docs, no near-dups -> atoms appended, flags
    // untouched (no empty staged file adopted, no staging dir left)
    IncrementalDedup.ingestTick(spark, dir, corpus.drop(3).toDF(),
      "doc_id", "text", 0.5)
    assert(files("atoms") == b1 + 1 && files("flags") == f1)
    assert(flagSet(dir) == flagsBefore)
  }

  test("threshold boundary is inclusive and identical to the batch path") {
    import spark.implicits._
    // docs 1,2 share exactly half their shingle union: jaccard == 0.5
    // ({a,b,c} vs {a,b,c,d,e,f}: inter 3, union 6)
    val pair = Seq(Doc(1, "a b c"), Doc(2, "a b c d e f"))
    // sanity: the batch path flags at >= (inclusive boundary)
    val batch = Dedup.minhashDedupPairsPortable(pair.toDF(), "doc_id",
      "text", threshold = 0.5, shingleN = 1).collect()
    val dirIn = tmp("graft_dedup_thr_in")
    IncrementalDedup.publish(dirIn)
    val nIn = IncrementalDedup.ingestTick(spark, dirIn, pair.toDF(),
      "doc_id", "text", threshold = 0.5, shingleN = 1)
    assert(nIn == batch.length.toLong) // streamed == batch at the boundary
    // non-vacuous: the fixture pair must actually collide in some band
    // (deterministic md5 banding — this is a fixture property, not luck)
    assert(nIn == 1L, "fixture pair missed the LSH gate; adjust the words")
    val j = flagSet(dirIn).head._3
    assert(j == 0.5, s"expected boundary jaccard 0.5, got $j")
    // just past the boundary: neither path flags
    val dirOut = tmp("graft_dedup_thr_out")
    IncrementalDedup.publish(dirOut)
    assert(IncrementalDedup.ingestTick(spark, dirOut, pair.toDF(),
      "doc_id", "text", threshold = math.nextUp(0.5), shingleN = 1) == 0L)
  }

  test("non-numeric and null ids fail loudly, never silently mis-dedup") {
    import spark.implicits._
    val dir = tmp("dedup_idx")
    IncrementalDedup.publish(dir)
    // string ids: the old behavior cast them to long → every id became
    // the SAME null doc_id, the whole batch collapsed to one document,
    // and cross-corpus dedup was silently wrong. Must throw instead.
    val strBatch = Seq(("a1", "some text"), ("b2", "other text"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      IncrementalDedup.ingestTick(spark, dir, strBatch, "doc_id", "text",
        threshold = 0.5)
    }
    assert(e1.getMessage.contains("doc_id"))
    // null ids in an integral column are identity corruption too
    val nullBatch = Seq((java.lang.Long.valueOf(1L), "t1"),
        (null.asInstanceOf[java.lang.Long], "t2"))
      .toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      IncrementalDedup.ingestTick(spark, dir, nullBatch, "doc_id", "text",
        threshold = 0.5)
    }
    assert(e2.getMessage.contains("null"))
    // neither rejected batch may have leaked rows into the durable index
    assert(IncrementalDedup.bands(spark, dir).isEmpty)
    assert(IncrementalDedup.shingles(spark, dir).isEmpty)
  }

  test("heal sweeps a tick crash's dead flag-staging dir") {
    val dir = tmp("dedup_idx")
    ingest(dir, Seq(corpus))
    val flags0 = flagSet(dir)
    // simulate a tick that died between the staged flag write and the
    // adopt: a dot-prefixed staging dir with a file in it
    val dead = new java.io.File(s"$dir/flags/.tick-9-deadbeef")
    dead.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${dead.getPath}/part-0.parquet"), "junk")
    // readers never see it...
    assert(flagSet(dir) == flags0)
    // ...and the next writer entry sweeps it
    IncrementalDedup.heal(dir)
    assert(!dead.exists())
    assert(flagSet(dir) == flags0)
  }

  test("compact consolidates the one-file-per-tick trees; content unchanged") {
    val dir = tmp("dedup_idx")
    ingest(dir, corpus.map(Seq(_))) // 5 single-doc ticks → 5 files/tree
    def bandSet() = IncrementalDedup.bands(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    def files(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val (flags0, bands0) = (flagSet(dir), bandSet())
    val atomFiles0 = files("atoms")
    assert(atomFiles0 >= 5)
    IncrementalDedup.compact(spark, dir)
    assert(flagSet(dir) == flags0)
    assert(bandSet() == bands0)
    assert(files("atoms") < atomFiles0)
    // the compacted index keeps working: replaying the corpus adds nothing
    ingest(dir, Seq(corpus))
    assert(flagSet(dir) == flags0)
  }

  test("heal un-stages a crashed compact swap, writer-side") {
    val dir = tmp("dedup_idx")
    ingest(dir, Seq(corpus))
    val flags0 = flagSet(dir)
    def f(s: String) = new java.io.File(s"$dir/$s")
    // crash window: atoms renamed aside, staging tree half-written
    assert(f("atoms").renameTo(f("atoms__old")))
    f("atoms__compacting").mkdirs()
    IncrementalDedup.heal(dir)
    assert(f("atoms").exists() && !f("atoms__old").exists() &&
      !f("atoms__compacting").exists())
    assert(flagSet(dir) == flags0)
    // and the index still ingests + flags correctly after recovery
    import spark.implicits._
    IncrementalDedup.ingestTick(spark, dir,
      Seq(Doc(6L, "the quick brown fox jumps over the lazy dogs")).toDF(),
      "doc_id", "text", threshold = 0.5, tick = 99)
    assert(flagSet(dir).size > flags0.size)

    // completed-swap window: compact crashed AFTER the staging tree
    // swapped in but BEFORE the old tree's delete — live and __old both
    // present. Heal must drop the stale __old (the live tree is
    // authoritative); without that, the leftover wedges every future
    // compact (rename onto a non-empty dir fails).
    f("atoms__old").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/atoms__old/garbage.txt"), "stale")
    IncrementalDedup.heal(dir)
    assert(f("atoms").exists() && !f("atoms__old").exists())
    IncrementalDedup.compact(spark, dir) // un-wedged: full compact works
    assert(flagSet(dir).size > flags0.size)
  }

  test("a v1 two-tree index is rejected loudly, never silently emptied") {
    // v1 signature: bands/ + shingles/ trees, no atoms/. The failure modes
    // this guards: publish() minting an empty atoms/ beside the old trees
    // (reads then see an EMPTY index and re-ingest re-flags the corpus
    // from scratch), and reads failing with a raw path-not-found.
    val dir = tmp("dedup_v1")
    new java.io.File(s"$dir/bands").mkdirs()
    new java.io.File(s"$dir/shingles").mkdirs()
    new java.io.File(s"$dir/flags").mkdirs()
    val eP = intercept[IllegalArgumentException](IncrementalDedup.publish(dir))
    assert(eP.getMessage.contains("v1") && eP.getMessage.contains("rebuild"))
    assert(!new java.io.File(s"$dir/atoms").exists(),
      "rejected publish must not have minted an atoms/ tree")
    intercept[IllegalArgumentException](IncrementalDedup.bands(spark, dir))
    intercept[IllegalArgumentException](IncrementalDedup.heal(dir))
  }
}
