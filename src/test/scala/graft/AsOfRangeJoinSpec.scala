package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AsOfJoin, RangeJoin, SkewJoin}

class AsOfRangeJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // left: (key, t, lv) — includes a key with no right rows, a left row
  // before any right row, and an exact timestamp tie
  private def leftRows = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 35L, "l3"),
    ("b", 5L, "l4"), ("b", 50L, "l5"),
    ("c", 7L, "l6"))
  // right: (key, t, rv) — tie at a/20, dense history on b
  private def rightRows = Seq(
    ("a", 12L, "r1"), ("a", 20L, "r2"), ("a", 31L, "r3"),
    ("b", 6L, "r4"), ("b", 7L, "r5"), ("b", 49L, "r6"))

  /** Naive per-row argmax oracle via join+filter+max_by. */
  private def naive(fwd: Boolean, tol: Option[Double]): Map[(String, Long), String] = {
    val pairs = for {
      (lk, lt, lv) <- leftRows
      (rk, rt, rv) <- rightRows
      if lk == rk
      if (if (fwd) rt >= lt else rt <= lt)
      if tol.forall(t => math.abs(rt - lt) <= t)
    } yield ((lk, lt), (rt, rv))
    pairs.groupBy(_._1).map { case (k, vs) =>
      k -> (if (fwd) vs.minBy(_._2._1) else vs.maxBy(_._2._1))._2._2
    }
  }

  private def run(fwd: Boolean, tol: Option[Double]): Map[(String, Long), String] = {
    import spark.implicits._
    val l = leftRows.toDF("k", "t", "lv")
    val r = rightRows.toDF("k", "t", "rv")
    val out = if (fwd) AsOfJoin.forward(l, r, Seq("k"), "t", "t", tol)
      else AsOfJoin.backward(l, r, Seq("k"), "t", "t", tol)
    out.collect().flatMap { row =>
      Option(row.getAs[String]("rv")).map(v =>
        (row.getAs[String]("k"), row.getAs[Long]("t")) -> v)
    }.toMap
  }

  test("asof backward matches the naive argmax oracle (ties inclusive)") {
    assert(run(fwd = false, None) == naive(fwd = false, None))
    // spot-check semantics: tie at a/20 matches r2 (inclusive), b/5 unmatched
    val m = run(fwd = false, None)
    assert(m(("a", 20L)) == "r2")
    assert(!m.contains(("b", 5L)))
    assert(!m.contains(("c", 7L)))
  }

  test("asof forward matches the naive oracle") {
    assert(run(fwd = true, None) == naive(fwd = true, None))
    assert(run(fwd = true, None)(("b", 5L)) == "r4")
  }

  test("asof tolerance drops far matches") {
    assert(run(fwd = false, Some(3.0)) == naive(fwd = false, Some(3.0)))
    // l3 at 35 has r3 at 31 — distance 4 exceeds tolerance 3
    assert(!run(fwd = false, Some(3.0)).contains(("a", 35L)))
    assert(run(fwd = false, Some(4.0)).contains(("a", 35L)))
  }

  test("asof backwardSmallRight: parity with the shuffle plan, broadcast join used") {
    import spark.implicits._
    val l = leftRows.toDF("k", "t", "lv")
    val r = rightRows.toDF("k", "t", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(row => (row.getAs[String]("k"), row.getAs[Long]("t"),
        row.getAs[String]("lv"), Option(row.getAs[String]("rv")))).toSet
    // exact parity with the union+window lowering, tolerance included
    assert(canon(AsOfJoin.backwardSmallRight(l, r, Seq("k"), "t", "t"))
      == canon(AsOfJoin.backward(l, r, Seq("k"), "t", "t")))
    assert(canon(AsOfJoin.backwardSmallRight(l, r, Seq("k"), "t", "t", Some(3.0)))
      == canon(AsOfJoin.backward(l, r, Seq("k"), "t", "t", Some(3.0))))
    // the fact side resolves through a broadcast join — no fact shuffle
    val j = AsOfJoin.backwardSmallRight(l, r, Seq("k"), "t", "t")
    j.collect()
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("asof tie contract: duplicate right (key, ts) breaks by max payload, both paths agree") {
    import spark.implicits._
    // three right rows share (a, 20); winner must be the max payload
    // struct ("r2c") in BOTH lowerings, independent of partitioning.
    val l = Seq(("a", 20L, "l1"), ("a", 25L, "l2"), ("b", 9L, "l3"))
      .toDF("k", "t", "lv")
    val dupR = Seq(
      ("a", 20L, "r2a"), ("a", 20L, "r2c"), ("a", 20L, "r2b"),
      ("a", 12L, "r1"), ("b", 6L, "r4"), ("b", 6L, "r0"))
      .toDF("k", "t", "rv").repartition(7) // scramble physical order
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(row => (row.getAs[String]("k"), row.getAs[Long]("t"),
        Option(row.getAs[String]("rv")))).toSet
    val win = AsOfJoin.backward(l, dupR, Seq("k"), "t", "t")
    val small = AsOfJoin.backwardSmallRight(l, dupR, Seq("k"), "t", "t")
    assert(canon(win) == canon(small))
    val m = canon(win).map { case (k, t, rv) => (k, t) -> rv }.toMap
    assert(m(("a", 20L)) == Some("r2c"))
    assert(m(("a", 25L)) == Some("r2c"))
    assert(m(("b", 9L)) == Some("r4"))
    // forward direction honors the same max-payload tie contract
    val fwd = AsOfJoin.forward(l, dupR, Seq("k"), "t", "t")
    val fm = canon(fwd).map { case (k, t, rv) => (k, t) -> rv }.toMap
    assert(fm(("a", 20L)) == Some("r2c"))
  }

  test("asof with a non-orderable (map) payload still plans and matches on time") {
    import spark.implicits._
    val l = Seq(("a", 20L, "l1")).toDF("k", "t", "lv")
    val r = Seq(("a", 12L, Map("x" -> 1)), ("a", 30L, Map("y" -> 2)))
      .toDF("k", "t", "mv")
    val out = AsOfJoin.backward(l, r, Seq("k"), "t", "t").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Map[String, Int]]("mv") == Map("x" -> 1))
  }

  test("asof map-payload ties: canonical entry order decides, window == smallRight row-for-row") {
    import spark.implicits._
    // duplicate right (key, ts) rows whose payloads differ ONLY in a map
    // column used to keep an UNSPECIFIED winner on the window path and
    // failed analysis on smallRight; both now order ties by the map's
    // sorted entry array (Orderables.canonicalKey) and must agree.
    val l = Seq(("a", 20L, "l1"), ("a", 25L, "l2"), ("b", 9L, "l3"))
      .toDF("k", "t", "lv")
    val r = Seq(
      ("a", 20L, Map("y" -> 2)), ("a", 20L, Map("z" -> 3)),
      ("a", 20L, Map("x" -> 9)),
      ("a", 12L, Map("w" -> 0)), ("b", 6L, Map("b1" -> 1)))
      .toDF("k", "t", "mv").repartition(7) // scramble physical order
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(row => (row.getAs[String]("k"), row.getAs[Long]("t"),
        Option(row.getAs[Map[String, Int]]("mv")))).toSet
    val win = AsOfJoin.backward(l, r, Seq("k"), "t", "t")
    val small = AsOfJoin.backwardSmallRight(l, r, Seq("k"), "t", "t")
    assert(canon(win) == canon(small),
      "the two lowerings diverged on a map-payload tie")
    val m = canon(win).map { case (k, t, mv) => (k, t) -> mv }.toMap
    // sorted-entries order: [(z,3)] > [(y,2)] > [(x,9)] — key decides first
    assert(m(("a", 20L)) == Some(Map("z" -> 3)))
    assert(m(("a", 25L)) == Some(Map("z" -> 3)))
    assert(m(("b", 9L)) == Some(Map("b1" -> 1)))
  }

  test("asof NESTED-map payload ties canonicalize recursively, lowerings agree") {
    import spark.implicits._
    // rows that differ only INSIDE a nested map (map<string, map<string,
    // int>>) — pre-r13 canonicalKey returned None one level down and the
    // winner was unspecified; the recursion makes the inner entries the key
    val l = Seq(("a", 20L, "l1")).toDF("k", "t", "lv")
    val r = Seq(
      ("a", 20L, Map("m" -> Map("x" -> 1))),
      ("a", 20L, Map("m" -> Map("y" -> 2))),
      ("a", 20L, Map("m" -> Map("x" -> 9))))
      .toDF("k", "t", "mv").repartition(5)
    def winner(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Map[String, Map[String, Int]]]("mv")).toSeq
    val win = winner(AsOfJoin.backward(l, r, Seq("k"), "t", "t"))
    val small = winner(AsOfJoin.backwardSmallRight(l, r, Seq("k"), "t", "t"))
    assert(win == small, s"lowerings diverged: $win vs $small")
    // inner sorted entries: [(y,2)] > [(x,9)] > [(x,1)] — key first
    assert(win == Seq(Map("m" -> Map("y" -> 2))))
    // maxBy over the same frame takes the identical winner (ZOps shares
    // the canonical-key contract), and a null map sorts below non-null
    import graft.ops.ZOps._
    val withNull = r.unionByName(Seq(("a", 20L))
      .toDF("k", "t").withColumn("mv",
        lit(null).cast(r.schema("mv").dataType)))
    val top = withNull.maxBy(Seq(col("k")), Seq(col("t")))
      .collect().map(_.getAs[Map[String, Map[String, Int]]]("mv")).toSeq
    assert(top == Seq(Map("m" -> Map("y" -> 2))), s"maxBy got $top")
  }

  test("asof NULL times match nothing, in both lowerings and directions") {
    import spark.implicits._
    // null-time RIGHT rows sort FIRST under asc (Spark nulls-first) and
    // used to be picked up by last() for any left row older than every
    // real right; null-time LEFT rows sort LAST under desc and grabbed
    // the earliest right in the forward lowering
    val l = Seq(("a", Some(5L), "early"), ("a", None: Option[Long], "null-t"))
      .toDF("k", "t", "lv")
    val r = Seq(("a", Some(20L), "r20"), ("a", None: Option[Long], "rNull"))
      .toDF("k", "t", "rv")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(row => row.getAs[String]("lv") ->
        Option(row.getAs[String]("rv"))).toMap
    val back = m(AsOfJoin.backward(l, r, Seq("k"), "t", "t"))
    assert(back == Map("early" -> None, "null-t" -> None), s"backward $back")
    assert(back == m(AsOfJoin.backwardSmallRight(l, r, Seq("k"), "t", "t")))
    val fwd = m(AsOfJoin.forward(l, r, Seq("k"), "t", "t"))
    assert(fwd == Map("early" -> Some("r20"), "null-t" -> None), s"forward $fwd")
  }

  test("salted join guards: outer alias, reserved __salt, constant-salt no-op") {
    import spark.implicits._
    val skewed = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val other = Seq((1L, 9.0)).toDF("k", "w")
    // "outer" normalizes to FULL OUTER in Spark — the alias must reject
    // like the spelled-out forms (it used to slip through and duplicate
    // every unmatched replicated row salt times)
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(skewed, other, Seq("k"), 4, joinType = "outer"))
    // a caller __salt column would be silently overwritten and dropped
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(
      skewed.withColumn("__salt", lit(1)), other, Seq("k"), 4))
    // all hashable columns being join keys makes the salt constant per
    // key — a silent no-op with salt-times replication cost: loud reject
    val keyOnly = Seq((1L, Map("a" -> 1)), (1L, Map("b" -> 2))).toDF("k", "m")
    val e = intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(keyOnly, other, Seq("k"), 4))
    assert(e.getMessage.contains("constant"), e.getMessage)
  }

  test("interval overlap: inverted (empty) intervals match nothing; __bin reserved") {
    import spark.implicits._
    val a = Seq(("i1", 10.0, 0.0), ("i2", 0.0, 5.0)).toDF("aid", "alo", "ahi")
    val b = Seq(("j1", 0.0, 10.0)).toDF("bid", "blo", "bhi")
    // [10,0] is EMPTY — the symmetric overlap test alone passed it
    val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi",
      binWidth = 5.0).select("aid", "bid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("i2", "j1")), s"got $got")
    intercept[IllegalArgumentException](RangeJoin.pointInInterval(
      Seq((1.0, 2L)).toDF("x", "__bin"), "x",
      b, "blo", "bhi", binWidth = 5.0))
  }

  test("asof keeps every left row (left-join semantics)") {
    import spark.implicits._
    val out = AsOfJoin.backward(leftRows.toDF("k", "t", "lv"),
      rightRows.toDF("k", "t", "rv"), Seq("k"), "t", "t")
    assert(out.count() == leftRows.size)
    assert(out.columns.toSeq == Seq("k", "t", "lv", "rv"))
  }

  test("range join matches the naive cross-filter, including bin-spanning intervals") {
    import spark.implicits._
    val pts = Seq(("p1", 0.0), ("p2", 9.9), ("p3", 10.0), ("p4", 25.0),
      ("p5", 99.0), ("p6", 100.0)).toDF("pid", "x")
    // [10,10] point interval, [0,35] spans 4 bins at width 10, [90,99]
    val ivs = Seq(("i1", 10.0, 10.0), ("i2", 0.0, 35.0), ("i3", 90.0, 99.0))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "x", ivs, "lo", "hi", binWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = (for {
      (pid, x) <- Seq(("p1", 0.0), ("p2", 9.9), ("p3", 10.0), ("p4", 25.0),
        ("p5", 99.0), ("p6", 100.0))
      (iid, lo, hi) <- Seq(("i1", 10.0, 10.0), ("i2", 0.0, 35.0), ("i3", 90.0, 99.0))
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    assert(got == want)
    assert(got.contains(("p3", "i1")) && got.contains(("p3", "i2")))
    assert(!got.contains(("p6", "i3")))
  }

  test("salted join: identical rows to the plain join, spread salt keys") {
    import spark.implicits._
    import graft.ops.SkewJoin.saltedJoin
    // skew: key "hot" holds 90% of the left side
    val skewed = ((0 until 900).map(i => ("hot", i)) ++
      (0 until 100).map(i => (s"k${i % 10}", i))).toDF("k", "lv")
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k1", "B"), ("zz", "Z"))
      .toDF("k", "rv")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

    val plain = skewed.join(dim, Seq("k"))
    val salted = saltedJoin(skewed, dim, Seq("k"), salt = 8)
    assert(canon(salted) == canon(plain))
    assert(salted.columns.toSeq == plain.columns.toSeq)

    // left-outer keeps unmatched skewed rows exactly once
    val lo = saltedJoin(skewed, dim, Seq("k"), salt = 8, joinType = "left")
    assert(canon(lo) == canon(skewed.join(dim, Seq("k"), "left")))

    // the hot key's rows really spread across sub-keys (the point of it)
    val spread = skewed.filter($"k" === "hot")
      .withColumn("__salt", pmod(hash(skewed.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(spread > 4, s"hot key only used $spread of 8 salts")

    // right/full outer is refused, not silently wrong
    assertThrows[IllegalArgumentException] {
      saltedJoin(skewed, dim, Seq("k"), 8, joinType = "full_outer")
    }
  }

  test("interval overlap join: naive parity, duplicate-free across shared bins") {
    import spark.implicits._
    val as = Seq(("a1", 0.0, 35.0), ("a2", 10.0, 10.0), ("a3", 90.0, 95.0),
      ("a4", 50.0, 55.0)).toDF("aid", "alo", "ahi")
    val bs = Seq(("b1", 5.0, 60.0), ("b2", 9.0, 12.0), ("b3", 94.0, 99.0),
      ("b4", 70.0, 75.0)).toDF("bid", "blo", "bhi")
    val got = RangeJoin.intervalOverlap(as, "alo", "ahi", bs, "blo", "bhi",
      binWidth = 10.0).select("aid", "bid").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = for {
      (aid, alo, ahi) <- Seq(("a1", 0.0, 35.0), ("a2", 10.0, 10.0),
        ("a3", 90.0, 95.0), ("a4", 50.0, 55.0))
      (bid, blo, bhi) <- Seq(("b1", 5.0, 60.0), ("b2", 9.0, 12.0),
        ("b3", 94.0, 99.0), ("b4", 70.0, 75.0))
      if alo <= bhi && blo <= ahi
    } yield (aid, bid)
    // exact multiset equality: parity AND no duplicates from shared bins
    // (a1 and b1 share bins 0..3 — canonical-bin emission must fire once)
    assert(got.sorted.toSeq == want.sorted)
    assert(got.length == got.toSet.size)
  }

  test("range join property: parity with naive on random data incl. negatives") {
    import spark.implicits._
    import graft.ops.RangeJoin
    (0 until 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // axis spans negatives; interval lengths from 0 (point) to ~3 bins
      val pts = (0 until 40).map(i => (i.toLong, rnd.nextDouble() * 60 - 30))
      val ivs = (0 until 15).map { i =>
        val lo = rnd.nextDouble() * 60 - 30
        (i.toLong, lo, lo + rnd.nextDouble() * 25)
      }
      val gotP = RangeJoin.pointInInterval(pts.toDF("pid", "x"),
        "x", ivs.toDF("iid", "lo", "hi"), "lo", "hi", binWidth = 8.0)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val wantP = for {
        (pid, x) <- pts; (iid, lo, hi) <- ivs
        if x >= lo && x <= hi
      } yield (pid, iid)
      assert(gotP.sorted.toSeq == wantP.sorted, s"pointInInterval seed=$seed")

      val ivs2 = (0 until 15).map { i =>
        val lo = rnd.nextDouble() * 60 - 30
        (i.toLong, lo, lo + rnd.nextDouble() * 25)
      }
      val gotO = RangeJoin.intervalOverlap(
          ivs.toDF("aid", "alo", "ahi"), "alo", "ahi",
          ivs2.toDF("bid", "blo", "bhi"), "blo", "bhi", binWidth = 8.0)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val wantO = for {
        (aid, alo, ahi) <- ivs; (bid, blo, bhi) <- ivs2
        if alo <= bhi && blo <= ahi
      } yield (aid, bid)
      assert(gotO.sorted.toSeq == wantO.sorted, s"intervalOverlap seed=$seed")
    }
  }

  test("range join plans an equi-join, not a nested loop") {
    import spark.implicits._
    val pts = (0 until 1000).map(i => (i.toLong, i.toDouble)).toDF("pid", "x")
    val ivs = (0 until 50).map(i => (i.toLong, i * 20.0, i * 20.0 + 5.0))
      .toDF("iid", "lo", "hi")
    val joined = RangeJoin.pointInInterval(pts, "x", ivs, "lo", "hi", binWidth = 20.0)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a cross product:\n$plan")
  }
}
