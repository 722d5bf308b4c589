package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.wrangling.{IncrementalAnn, Similarity}

/** ANN-index-on-ingest invariants: frozen-centroid assignment makes the
  * streamed index EQUAL the batch index over the union corpus (not
  * approximately — cell-for-cell), tick replays are idempotent (the
  * crash-window guarantee), and probes over seed ∪ deltas stay
  * partition-pruned in both trees. */
class IncrementalAnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_incann").toString

  test("streamed index == batch index over the union corpus, cell-for-cell") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val dir = freshDir()
    val cents = IncrementalAnn.bootstrap(seed, dir, "vec_id", "embedding",
      k = 8, iters = 2)
    // three ticks, arbitrary split (hash thirds)
    (0 until 3).foreach { t =>
      IncrementalAnn.ingestTick(
        rest.filter(pmod(xxhash64(col("vec_id")), lit(3)) === t),
        dir, "vec_id", "embedding", cents, batchId = t.toLong)
    }
    val streamed = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      .select(col("vec_id"), col("__ci").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val batch = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("__ci"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch)
  }

  test("re-bootstrap (drift-repair rebuild) resets stale tick deltas") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val dir = freshDir()
    val c1 = IncrementalAnn.bootstrap(seed, dir, "vec_id", "embedding",
      k = 8, iters = 2)
    IncrementalAnn.ingestTick(rest, dir, "vec_id", "embedding", c1, 0L)
    // retrain over the FULL current corpus (the documented drift repair);
    // the old tick's delta rows were assigned under c1 — surviving the
    // rebuild they would duplicate every re-seeded id and sit in cells
    // the new quantizer never probes for them
    val c2 = IncrementalAnn.bootstrap(emb, dir, "vec_id", "embedding",
      k = 8, iters = 3)
    val post = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      .select(col("vec_id"), col("__ci").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(post.map(_._1).distinct.length == post.length,
      "stale delta rows duplicated re-seeded ids")
    val expect = Similarity.ivfIndex(emb, "vec_id", "embedding", c2)
      .select(col("vec_id"), col("__ci"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(post.toSet == expect)
  }

  test("tick replay is idempotent: re-landing a batchId changes nothing") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val dir = freshDir()
    val cents = IncrementalAnn.bootstrap(seed, dir, "vec_id", "embedding",
      k = 8, iters = 2)
    IncrementalAnn.ingestTick(rest, dir, "vec_id", "embedding", cents, 0L)
    val once = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      .count()
    // crash between delta write and checkpoint commit → the engine
    // replays the same batchId; Overwrite into batch=0 must not duplicate
    IncrementalAnn.ingestTick(rest, dir, "vec_id", "embedding", cents, 0L)
    val twice = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      .count()
    assert(once == twice && once == emb.count())
  }

  test("pruned probe over seed ∪ deltas: PartitionFilters in BOTH trees, " +
      "results equal the batch index probe") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val dir = freshDir()
    val cents = IncrementalAnn.bootstrap(seed, dir, "vec_id", "embedding",
      k = 8, iters = 2)
    IncrementalAnn.ingestTick(rest, dir, "vec_id", "embedding", cents, 0L)
    val q = emb.filter(col("vec_id") === 2)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val union = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
    val got = Similarity.ivfTopK(union, "vec_id", "embedding", cents, q,
      10, nprobe = 2)
    val batch = Similarity.ivfTopK(
      Similarity.ivfIndex(emb, "vec_id", "embedding", cents),
      "vec_id", "embedding", cents, q, 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got.collect().map(_.getLong(0)).toSeq == batch)
    val plan = got.queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]*__ci".r.findAllIn(plan).size
    assert(pruned == 2, s"expected both trees partition-pruned:\n$plan")
  }

  test("compact folds deltas into the seed tree; content and probes " +
      "unchanged; the one-dir-per-tick debt is settled") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val dir = freshDir()
    val cents = IncrementalAnn.bootstrap(seed, dir, "vec_id", "embedding",
      k = 8, iters = 2)
    (0 until 3).foreach { t =>
      IncrementalAnn.ingestTick(
        rest.filter(pmod(xxhash64(col("vec_id")), lit(3)) === t),
        dir, "vec_id", "embedding", cents, batchId = t.toLong)
    }
    def content() = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      .select(col("vec_id"), col("__ci").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val before = content()
    IncrementalAnn.compact(spark, dir, "vec_id", "embedding")
    assert(content() == before)
    // delta root exists and is empty again
    assert(new java.io.File(s"$dir/postings_delta").listFiles()
      .forall(!_.getName.startsWith("batch=")))
    // single tree now: the pruned probe reads ONE partitioned scan
    val q = emb.filter(col("vec_id") === 2)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val probe = Similarity.ivfTopK(
      IncrementalAnn.postings(spark, dir, "vec_id", "embedding"),
      "vec_id", "embedding", cents, q, 10, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*__ci".r.findAllIn(plan).size == 1)
    probe.collect()
  }

  test("heal recovers every compact crash window, writer-side only") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
    def build(): (String, Set[(Long, Int)]) = {
      val dir = freshDir()
      val cents = IncrementalAnn.bootstrap(seed, dir, "vec_id", "embedding",
        k = 8, iters = 2)
      IncrementalAnn.ingestTick(rest, dir, "vec_id", "embedding", cents, 0L)
      val c = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
        .select(col("vec_id"), col("__ci").cast("int"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      (dir, c)
    }
    def f(dir: String, s: String) = new java.io.File(s"$dir/$s")

    // window 1: staging written, swap not started → heal rolls BACK
    locally {
      val (dir, before) = build()
      f(dir, "postings__compacting").mkdirs()
      IncrementalAnn.heal(dir)
      assert(!f(dir, "postings__compacting").exists())
      assert(IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
        .count() == before.size)
    }
    // window 2: crashed between the two seed renames → roll back;
    // readers in this window THROW instead of mutating
    locally {
      val (dir, before) = build()
      assert(f(dir, "postings").renameTo(f(dir, "postings__old")))
      assert(f(dir, "postings_delta").renameTo(f(dir, "postings_delta__folded")))
      intercept[IllegalArgumentException] {
        IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      }
      IncrementalAnn.heal(dir)
      assert(IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
        .select(col("vec_id"), col("__ci").cast("int"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet == before)
    }
    // window 3: swap completed, leftovers remain → heal rolls FORWARD
    locally {
      val (dir, before) = build()
      val cents = IncrementalAnn.centroids(spark, dir)
      IncrementalAnn.compact(spark, dir, "vec_id", "embedding")
      f(dir, "postings__old").mkdirs() // simulated leftover
      assert(f(dir, "postings_delta").renameTo(f(dir, "postings_delta__folded")))
      IncrementalAnn.heal(dir)
      assert(!f(dir, "postings__old").exists())
      assert(!f(dir, "postings_delta__folded").exists())
      assert(f(dir, "postings_delta").exists())
      val after = IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
        .select(col("vec_id"), col("__ci").cast("int"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(after == before)
      val _ = cents
    }
  }
}
