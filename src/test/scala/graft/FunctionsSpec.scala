package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ZArr
import graft.wrangling.Dedup

class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("MinHashAgg: signature length, determinism, partial-merge correctness") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "x y z w q r s")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesFast(df, "doc_id", "text", 16, 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == 16)
    assert(sigs(1L) == sigs(2L)) // same shingle set → identical signature
    assert(sigs(1L) != sigs(3L))
    // merge correctness: signature is invariant to partitioning
    val sigs1 = Dedup.minhashSignaturesFast(df.repartition(7), "doc_id",
      "text", 16, 1).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs1 == sigs)
  }

  test("aggregate params reject at plan time, not mid-job") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b")).toDF("k", "s")
    // numHashes=0 would make every signature [] (all docs identical ->
    // candidate cross product); negative crashed in serialize mid-shuffle
    intercept[IllegalArgumentException] {
      graft.functions.MinHashAgg.minhash(col("s"), 0)
    }
    // unsupported item types used to pass analysis and throw in
    // serialize() AFTER the whole map stage ran
    val dbl = Seq((1L, 2.5)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      graft.functions.HeavyHittersAgg.heavyHittersChecked(dbl, "v", 10)
    }
    assert(ex.getMessage.contains("unsupported item type"))
    assert(graft.functions.HeavyHittersAgg
      .heavyHittersChecked(df, "s", 10) != null)
  }

  test("BottomKAgg: deterministic bottom-k sample, merge-invariant, seeded") {
    import spark.implicits._
    import graft.functions.BottomKAgg.sampleK
    val n = 10000
    val df = (1 to n).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")

    def draw(data: org.apache.spark.sql.DataFrame, seed: String) =
      data.groupBy("g").agg(sampleK(col("id"), 25, seed).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    // invariant to physical partitioning (partial-merge correctness)
    val a = draw(df.repartition(1), "s0")
    val b = draw(df.repartition(13), "s0")
    assert(a == b)
    assert(a.values.forall(_.size == 25))
    assert(a("g0") != a("g1")) // groups sample independently
    // different seed draws a different (same-size) sample
    val c = draw(df, "s1")
    assert(c != a && c.values.forall(_.size == 25))
    // roughly uniform: sampled mean of 1..n near the population mean
    val all = a.values.flatten
    val mean = all.sum.toDouble / all.size
    assert(math.abs(mean - n / 2.0) < n * 0.1, s"sample mean $mean")

    // k >= group size returns the whole group (sorted by hash)
    val tiny = Seq((1L, "g"), (2L, "g"), (3L, "g")).toDF("id", "g")
    val whole = tiny.groupBy("g").agg(sampleK(col("id"), 10).as("s"))
      .collect()(0).getSeq[Long](1)
    assert(whole.toSet == Set(1L, 2L, 3L))

    // string values sample too; nulls are skipped
    val strs = Seq(Some("x"), Some("y"), Some("z"), None).map(v => (v, "g"))
      .toDF("v", "g")
    val sampled = strs.groupBy("g").agg(sampleK(col("v"), 2).as("s"))
      .collect()(0).getSeq[String](1)
    assert(sampled.size == 2 && sampled.forall(Set("x", "y", "z")))
  }

  test("HeavyHittersAgg: MG guarantees under capacity, exact over capacity") {
    import spark.implicits._
    import graft.functions.HeavyHittersAgg.heavyHitters
    // skewed stream: "hot" = 5000 of 10000 rows, "warm" = 2000, tail of
    // 300 distinct items ~10 each
    val rows = Seq.fill(5000)("hot") ++ Seq.fill(2000)("warm") ++
      (0 until 3000).map(i => s"t${i % 300}")
    val n = rows.size
    val df = rows.map(v => (v, "g")).toDF("v", "g")

    def hh(data: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
      data.groupBy("g").agg(heavyHitters(col("v"), cap).as("h"))
        .select(explode(col("h")).as("e"))
        .select(col("e.item"), col("e.est_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    for (parts <- Seq(1, 13)) {
      val got = hh(df.repartition(parts), 8)
      // capacity 8 over n rows: anything with true count > n/9 must appear
      assert(got.contains("hot") && got.contains("warm"), s"missing: $got")
      assert(got.size <= 8)
      // MG bound: true - n/(cap+1) <= est <= true
      assert(got("hot") <= 5000 && got("hot") >= 5000 - n / 9)
      assert(got("warm") <= 2000 && got("warm") >= 2000 - n / 9)
    }

    // capacity >= distinct count: exact counts for every item
    val exact = hh(df, 400)
    assert(exact("hot") == 5000 && exact("warm") == 2000)
    assert(exact.size == 302 && exact("t0") == 10)
    // exactness is partitioning-invariant
    assert(hh(df.repartition(7), 400) == exact)

    // long items work; nulls are skipped
    val longs = (Seq.fill(9)(Some(1L)) ++ Seq(Some(2L), None))
      .map(v => (v, "g")).toDF("v", "g")
    val lh = longs.groupBy("g").agg(heavyHitters(col("v"), 4).as("h"))
      .select(explode(col("h")).as("e")).select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lh == Map(1L -> 9L, 2L -> 1L))
  }

  test("review pass 20: empty-input evals and deterministic HH output order") {
    import spark.implicits._
    import graft.functions.{BottomKAgg, HeavyHittersAgg, MinHashAgg}
    // a GLOBAL aggregate over an empty frame evaluates the fresh buffer:
    // minhash yields the identity signature (all Long.MaxValue — the
    // merge identity, so an empty partition merged into any group is a
    // no-op), bottom-k and heavy-hitters yield empty arrays
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val row = empty.agg(
      MinHashAgg.minhash(col("s"), 4).as("mh"),
      BottomKAgg.sampleK(col("id"), 3).as("bk"),
      HeavyHittersAgg.heavyHitters(col("s"), 3).as("hh")).collect()(0)
    assert(row.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
    assert(row.getSeq[Long](1).isEmpty)
    assert(row.getSeq[org.apache.spark.sql.Row](2).isEmpty)
    // all-null input behaves like empty input (nulls are skipped)
    val nulls = Seq((Option.empty[Long], Option.empty[String]),
      (Option.empty[Long], Option.empty[String])).toDF("id", "s")
    val nrow = nulls.agg(
      BottomKAgg.sampleK(col("id"), 3).as("bk"),
      HeavyHittersAgg.heavyHitters(col("s"), 3).as("hh")).collect()(0)
    assert(nrow.getSeq[Long](0).isEmpty)
    assert(nrow.getSeq[org.apache.spark.sql.Row](1).isEmpty)
    // heavy-hitters output order is pinned: est_count desc, item ASC on
    // ties — partitioning must not reorder equal-count items
    val tied = Seq("b", "a", "c", "a", "c", "b").map((_, "g")).toDF("v", "g")
    for (parts <- Seq(1, 5)) {
      val arr = tied.repartition(parts).groupBy("g")
        .agg(HeavyHittersAgg.heavyHitters(col("v"), 10).as("h"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getLong(1)))
      assert(arr == Seq(("a", 2L), ("b", 2L), ("c", 2L)), arr.toString)
    }
  }

  test("MinHashAgg: similarity estimate tracks exact jaccard") {
    import spark.implicits._
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val near = (1 to 45).map(i => s"w$i").mkString(" ") + " z1 z2 z3 z4 z5" // J=0.818
    val far = (100 to 150).map(i => s"q$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesFast(df, "doc_id", "text", 128, 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(math.abs(est(sigs(1L), sigs(2L)) - 0.818) < 0.15)
    assert(est(sigs(1L), sigs(3L)) < 0.1)
  }

  test("fast LSH candidates + exact verify match classic pipeline behavior") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 80)
    val sigs = Dedup.minhashSignaturesFast(docs, "doc_id", "text", 32, 1)
    val cands = Dedup.minhashCandidatesFromSig(sigs, "doc_id", 32, 16)
    val verified = Dedup.jaccardForPairs(docs, cands, "doc_id", "text", 1)
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 1, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(exact))
    if (exact.nonEmpty)
      assert(verified.size.toDouble / exact.size >= 0.8)
  }

  test("ZArr: edit ops are 0-based and total") {
    import spark.implicits._
    val df = Seq(Seq(10, 20, 30, 40)).toDF("a")
    def got(c: org.apache.spark.sql.Column): Seq[Int] =
      df.select(c).collect()(0).getSeq[Int](0)
    assert(got(ZArr.insertAt(col("a"), 1, lit(15))) == Seq(10, 15, 20, 30, 40))
    assert(got(ZArr.insertAt(col("a"), 0, lit(5))) == Seq(5, 10, 20, 30, 40))
    assert(got(ZArr.removeAt(col("a"), 2)) == Seq(10, 20, 40))
    assert(got(ZArr.updateAt(col("a"), 1, _ * 2)) == Seq(10, 40, 30, 40))
    assert(got(ZArr.replaceAt(col("a"), 3, lit(99))) == Seq(10, 20, 30, 99))
    assert(got(ZArr.splice(col("a"), 1, 2, array(lit(7), lit(8), lit(9)))) ==
      Seq(10, 7, 8, 9, 40))
    assert(got(ZArr.permuteTo(col("a"), Seq(3, 1, 0, 2))) == Seq(40, 20, 10, 30))
    assert(got(ZArr.cycle(col("a"), 2)) == Seq(10, 20, 30, 40, 10, 20, 30, 40))
  }

  test("ZArr: indexesOf, trim family, splitOn") {
    import spark.implicits._
    val df = Seq(Seq(0, 5, 0, 7, 0)).toDF("a")
    assert(df.select(ZArr.indexesOf(col("a"), lit(0))).collect()(0)
      .getSeq[Int](0) == Seq(0, 2, 4))
    assert(df.select(ZArr.trimLeft(col("a"), lit(0))).collect()(0)
      .getSeq[Int](0) == Seq(5, 0, 7, 0))
    assert(df.select(ZArr.trim(col("a"), lit(0))).collect()(0)
      .getSeq[Int](0) == Seq(5, 0, 7))
    val allSep = Seq(Seq(0, 0)).toDF("a")
    assert(allSep.select(ZArr.trim(col("a"), lit(0))).collect()(0)
      .getSeq[Int](0).isEmpty)
    val runs = df.select(ZArr.splitOn(col("a"), lit(0))).collect()(0)
      .getSeq[Seq[Int]](0)
    assert(runs == Seq(Seq(), Seq(5), Seq(7), Seq()))
  }
}
