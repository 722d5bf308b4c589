package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{VT, ZCol}
import graft.ops.ZOps._

class OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import VT._

  def nums = {
    val s = spark; import s.implicits._
    (1 to 20).map(i => (i.toLong, s"v$i", i % 5)).toDF("id", "name", "grp")
  }

  test("VT calculus: union/intersection/complement/between/pattern") {
    val df = nums
    assert(df.zFilter("id", Between(5, 10)).count() == 6)
    assert(df.zFilter("id", Between(1, 5) | Between(15, 20)).count() == 11)
    assert(df.zFilter("id", Between(1, 10) & Is(_ % 2 === 0)).count() == 5)
    assert(df.zFilter("id", !Between(1, 15)).count() == 5)
    assert(df.zFilter("name", InSet("v1", "v2", "zzz")).count() == 2)
    val s = spark; import s.implicits._
    val structs = Seq((1, ("a", 5)), (2, ("b", 50))).toDF("id", "st")
    assert(structs.zFilter("st",
      Pattern("_1" -> InSet("a", "b"), "_2" -> Between(0, 10))).count() == 1)
  }

  test("explain[VT]: mismatch diagnostics as data (impl.py:10335)") {
    val s = spark; import s.implicits._
    val vt = Between(1, 50) & !InSet(13) & Is(_ % 2 === 0, "Even")
    val ex = Seq(4L, 13L, 60L).toDF("x")
      .select($"x", vt.explain($"x").as("e")).orderBy("x").collect()
      .map(r => (r.getLong(0), r.getStruct(1)))
      .toMap
    // matching value: is_a true, empty explanation, types rendered
    assert(ex(4L).getBoolean(0))
    assert(ex(4L).getSeq[String](3).isEmpty)
    assert(ex(4L).getString(1) ==
      "Intersection[Between[1, 50] & Complement[SetOf[13]] & Even]")
    assert(ex(4L).getString(2) == "bigint")
    // 13 fails TWO legs — only failing branches speak (filter_success)
    assert(!ex(13L).getBoolean(0))
    assert(ex(13L).getSeq[String](3) == Seq(
      "$: value 13 matched complemented type SetOf[13]",
      "$: value 13 is not Even"))
    // 60 fails the range leg only
    assert(ex(60L).getSeq[String](3) == Seq("$: value 60 is not Between[1, 50]"))

    // a failed Union explains every alternative, header first
    val u = Between(1, 5) | InSet(99)
    val eu = Seq(7L).toDF("x").select(u.explain($"x").as("e"))
      .collect()(0).getStruct(0)
    assert(eu.getSeq[String](3) == Seq(
      "$: value 7 matched no alternative of Union[Between[1, 5] | SetOf[99]]",
      "$: value 7 is not Between[1, 5]",
      "$: value 7 is not SetOf[99]"))

    // Pattern: missing key is its own rule; nested paths extend with .field
    val sdf = Seq((1, Some("a"), 5), (2, Option.empty[String], 50))
      .toDF("id", "f1", "f2")
      .select($"id", struct($"f1", $"f2").as("st"))
    val pvt = Pattern("f1" -> InSet("a", "b"), "f2" -> Between(0, 10))
    val ep = sdf.select($"id", pvt.explain($"st").as("e")).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getStruct(1))).toMap
    assert(ep(1).getBoolean(0) && ep(1).getSeq[String](3).isEmpty)
    assert(ep(2).getSeq[String](3) == Seq(
      "$.f1: missing or null key",
      "$.f2: value 50 is not Between[0, 10]"))
  }

  test("matchOn: first matching case wins") {
    val s = spark; import s.implicits._
    val df = Seq(1, 7, 30, -2).toDF("x")
    val out = df.select(VT.matchOn(col("x"), Seq(
      Is((c: org.apache.spark.sql.Column) => c < 0) -> lit("neg"),
      Between(0, 9) -> lit("small"),
      Between(10, 99) -> lit("big")), lit("other")).as("m"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("small", "small", "big", "neg"))
  }

  test("enumerate: scalable global index matches orderBy position") {
    def check(): Unit = {
      val e = nums.enumerate(Seq(col("id").desc))
      val rows = e.orderBy("idx").collect()
      assert(rows.map(_.getAs[Long]("idx")).toSeq == (0L until 20L))
      assert(rows.head.getAs[Long]("id") == 20L) // desc order → 20 first
    }
    check() // small adaptive path
    spark.conf.set("graft.smallSortThreshold", "0") // force distributed path
    try check() finally spark.conf.unset("graft.smallSortThreshold")
  }

  test("chunk/stride under explicit order") {
    val c = nums.chunk(6, Seq(col("id")))
    val sizes = c.groupBy("chunk_id").count().orderBy("chunk_id")
      .collect().map(_.getLong(1)).toSeq
    assert(sizes == Seq(6L, 6L, 6L, 2L))
    assert(nums.stride(5, Seq(col("id"))).count() == 4)
    // non-positive sizes reject at PLAN time — n = 0 used to reach the
    // executors as an ANSI DIVIDE_BY_ZERO / invalid window frame mid-job
    intercept[IllegalArgumentException] { nums.chunk(0, Seq(col("id"))) }
    intercept[IllegalArgumentException] { nums.stride(0, Seq(col("id"))) }
    intercept[IllegalArgumentException] {
      nums.sliding(0, Seq.empty, Seq(col("id")), col("id"))
    }
  }

  test("takeWhile/skipWhile partition the ordered set") {
    val tw = nums.takeWhile(col("id") < 8, Seq(col("id")))
    val sw = nums.skipWhile(col("id") < 8, Seq(col("id")))
    assert(tw.count() == 7 && sw.count() == 13)
    assert(tw.count() + sw.count() == nums.count())
    // pred violated at the start → empty prefix
    assert(nums.takeWhile(col("id") > 5, Seq(col("id"))).count() == 0)
    // a NULL-evaluating predicate row is a VIOLATION, not a pass: the
    // prefix stops AT the null row (it does not satisfy pred) — the old
    // scan skipped unknowns and extended the prefix past them
    val s = spark; import s.implicits._
    val withNull = Seq((1, java.lang.Integer.valueOf(1)),
      (2, java.lang.Integer.valueOf(2)), (3, null.asInstanceOf[java.lang.Integer]),
      (4, java.lang.Integer.valueOf(9))).toDF("i", "v")
    val got = withNull.takeWhile(col("v") < 5, Seq(col("i")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2), s"prefix crossed a null predicate row: $got")
    assert(withNull.skipWhile(col("v") < 5, Seq(col("i")))
      .collect().map(_.getInt(0)).toSeq == Seq(3, 4))
  }

  test("distinctBy keeps first per key under order") {
    val d = nums.distinctBy(Seq(col("grp")), Seq(col("id")))
    assert(d.count() == 5)
    assert(d.agg(sum("id")).collect()(0).getLong(0) == 1 + 2 + 3 + 4 + 5)
    val dLast = nums.maxBy(Seq(col("grp")), Seq(col("id")))
    assert(dLast.agg(sum("id")).collect()(0).getLong(0) == 16 + 17 + 18 + 19 + 20)
  }

  test("maxBy/minBy on a map-bearing frame: hash-agg identity + re-join, deterministic ties") {
    val s = spark; import s.implicits._
    // a map column cannot enter a min/max struct — the row-packing
    // lowering would fail analysis; the map path aggregates the winner's
    // CANONICAL identity (maps as sorted entry arrays) and re-joins,
    // so ties at equal (g, v) break deterministically BY MAP CONTENT —
    // the old window fallback left them unspecified.
    val df = Seq(
      ("a", 3L, Map("x" -> 1)), ("a", 7L, Map("y" -> 2)),
      ("a", 7L, Map("z" -> 3)), ("b", 1L, Map("w" -> 4)))
      .toDF("g", "v", "payload").repartition(5)
    def got(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getMap[String, Int](2).toMap))).toMap
    val mx = got(df.maxBy(Seq(col("g")), Seq(col("v"))))
    // ("a", 7) tie: sorted entries [(z,3)] > [(y,2)] → z wins, any partitioning
    assert(mx == Map(
      "a" -> ((7L, Map("z" -> 3))), "b" -> ((1L, Map("w" -> 4)))))
    val mn = got(df.minBy(Seq(col("g")), Seq(col("v"))))
    assert(mn == Map(
      "a" -> ((3L, Map("x" -> 1))), "b" -> ((1L, Map("w" -> 4)))))
    // still the aggregate shape: no global-sort window funnel
    assert(!df.maxBy(Seq(col("g")), Seq(col("v")))
      .queryExecution.executedPlan.toString.contains("Window"))
    // rows indistinguishable up to the canonical identity collapse to one
    val dup = Seq(("a", 1L, Map("x" -> 1)), ("a", 1L, Map("x" -> 1)))
      .toDF("g", "v", "payload")
    assert(dup.maxBy(Seq(col("g")), Seq(col("v"))).count() == 1)
  }

  test("groupConsecutive sessionizes runs") {
    val s = spark; import s.implicits._
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (4, "a"), (5, "a"), (6, "a"))
      .toDF("pos", "k")
    val runs = df.groupConsecutive(col("k"), Seq(col("pos")))
      .groupBy("run_id").agg(count(lit(1)).as("n"), first("k").as("k"))
      .orderBy("run_id").collect()
    assert(runs.map(r => (r.getAs[String]("k"), r.getAs[Long]("n"))).toSeq ==
      Seq(("a", 2L), ("b", 1L), ("a", 3L)))
  }

  test("consecutiveRuns matches groupConsecutive, incl. cross-partition chains and null keys") {
    val s = spark; import s.implicits._
    // 12k rows: alternating short runs, one giant 4k-row run (guaranteed to
    // span several range partitions → exercises the boundary-merge chain),
    // and null-key runs (consecutive nulls = ONE run, null-safe compare)
    val rows = (0 until 4000).map(i => (i.toLong, Some((i / 7 % 3).toString))) ++
      (4000 until 8000).map(i => (i.toLong, Some("HOT"))) ++
      (8000 until 8040).map(i => (i.toLong, None: Option[String])) ++
      (8040 until 12000).map(i => (i.toLong, Some((i % 2).toString)))
    val df = rows.toDF("pos", "k")
    def runsOf(d: org.apache.spark.sql.DataFrame) = d.orderBy("run_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSeq
    // small path (12k rows is far below the threshold)
    val actSmall = runsOf(df.consecutiveRuns(col("k"), Seq(col("pos"))))
    // force the DISTRIBUTED path for both ops and cross-check
    spark.conf.set("graft.smallSortThreshold", "0")
    try {
      val expected = df.groupConsecutive(col("k"), Seq(col("pos")))
        .groupBy("run_id")
        .agg(first(col("k")).as("key"), count(lit(1)).as("run_len"))
      val act = runsOf(df.consecutiveRuns(col("k"), Seq(col("pos"))))
      assert(act == runsOf(expected))
      // both adaptive paths agree exactly
      assert(act == actSmall)
      // the giant run (spans several range partitions) survived as ONE run
      assert(act.count(_._3 == 4000L) == 1)
      // consecutive nulls collapsed to one 40-row run (null-safe compare)
      assert(act.filter(_._2.isEmpty).map(_._3) == Seq(40L))
      // ids dense 1..n
      assert(act.map(_._1) == (1L to act.length.toLong))
    } finally spark.conf.unset("graft.smallSortThreshold")
  }

  test("interleave round-robins two ordered sets") {
    val s = spark; import s.implicits._
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("id", "v")
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("id", "v")
    val out = a.interleave(b, Seq(col("id"))).collect().map(_.getString(1))
    assert(out.toSeq == Seq("a1", "b1", "a2", "b2"))
  }

  test("interleave truncates to shortest; interleave_longest runs out") {
    val s = spark; import s.implicits._
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"), (4L, "a4")).toDF("id", "v")
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("id", "v")
    // reference interleave (impl.py:1183): M * N_shortest elements
    assert(a.interleave(b, Seq(col("id"))).collect().map(_.getString(1)).toSeq
      == Seq("a1", "b1", "a2", "b2"))
    // interleave_longest (impl.py:1226): leftovers keep their slots
    assert(a.interleaveLongest(b, Seq(col("id"))).collect()
      .map(_.getString(1)).toSeq == Seq("a1", "b1", "a2", "b2", "a3", "a4"))
  }

  test("take_until / skip_until include the bounding element correctly") {
    val s = spark; import s.implicits._
    val df = (0L to 9L).map(i => (i, i)).toDF("id", "x")
    // reference example (impl.py:3807): range(10) | take_until[x>4] -> 0..5
    assert(df.takeUntil(col("x") > 4, Seq(col("id")))
      .collect().map(_.getLong(1)).toSeq == (0L to 5L))
    assert(df.skipUntil(col("x") > 4, Seq(col("id")))
      .collect().map(_.getLong(1)).sorted.toSeq == (5L to 9L))
    // predicate never true: take_until keeps all, skip_until keeps none
    assert(df.takeUntil(col("x") > 100, Seq(col("id"))).count() == 10)
    assert(df.skipUntil(col("x") > 100, Seq(col("id"))).count() == 0)
  }

  test("take_while_pair stops at the first failing adjacent pair") {
    val s = spark; import s.implicits._
    // reference example (impl.py:3885): 2,3,...,10,10,10 | pair m!=n -> 2..10
    val vals = (2L to 10L) ++ Seq(10L, 10L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = df.takeWhilePair(col("prev_v") =!= col("v"), Seq(col("id")))
      .collect().map(_.getLong(1)).toSeq
    assert(out == (2L to 10L))
    // all pairs pass -> everything survives
    val asc = (1L to 5L).map(i => (i, i)).toDF("id", "v")
    assert(asc.takeWhilePair(col("prev_v") < col("v"), Seq(col("id"))).count() == 5)
  }

  test("split_at partitions by index; single_or bounded semantics") {
    val s = spark; import s.implicits._
    val df = (0L to 4L).map(i => (i, s"v$i")).toDF("id", "v")
    val (l, r) = df.splitAt(2, Seq(col("id")))
    assert(l.collect().map(_.getString(1)).toSeq == Seq("v0", "v1"))
    assert(r.collect().map(_.getString(1)).sorted.toSeq == Seq("v2", "v3", "v4"))
    val one = Seq((1L, "only")).toDF("id", "v")
    assert(one.singleOr(null).getString(1) == "only")
    assert(one.filter(col("id") > 5).singleOr(null) == null)
    assertThrows[IllegalArgumentException] { df.singleOr(null) }
  }

  test("ZCol: case conversions") {
    val s = spark; import s.implicits._
    val df = Seq("hello worldFoo", "AlreadyPascalCase").toDF("t")
    val r = df.select(
      ZCol.toSnakeCase(col("t")).as("snake"),
      ZCol.toKebabCase(col("t")).as("kebab"),
      ZCol.toPascalCase(col("t")).as("pascal"),
      ZCol.toCamelCase(col("t")).as("camel"),
      ZCol.toScreamingSnakeCase(col("t")).as("scream")).collect()
    assert(r(0).getString(0) == "hello_world_foo")
    assert(r(0).getString(1) == "hello-world-foo")
    assert(r(0).getString(2) == "HelloWorldFoo")
    assert(r(0).getString(3) == "helloWorldFoo")
    assert(r(1).getString(0) == "already_pascal_case")
    assert(r(1).getString(4) == "ALREADY_PASCAL_CASE")
  }

  test("ZCol: intToAlpha bijective base-26") {
    val s = spark; import s.implicits._
    val df = Seq(1L, 2L, 26L, 27L, 28L, 52L, 53L, 703L).toDF("n")
    val out = df.select(ZCol.intToAlpha(col("n")).as("a")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("a", "b", "z", "aa", "ab", "az", "ba", "aaa"))
    // the 4->5 letter boundary: the old 4-level chain silently collided
    // everything past 475254 onto 4-letter strings
    val hi = Seq(475254L, 475255L, 475255L + 26L).toDF("n")
      .select(ZCol.intToAlpha(col("n")).as("a")).collect().map(_.getString(0))
    assert(hi.toSeq == Seq("zzzz", "aaaaa", "aaaba"))
    // out of range errors loudly instead of emitting a colliding string
    val ex = intercept[Exception] {
      Seq(0L).toDF("n").select(ZCol.intToAlpha(col("n"))).collect()
    }
    assert(ex.getMessage.contains("int_to_alpha") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("int_to_alpha")))
  }

  test("ZCol: padCenter, clamp, dict ops") {
    val s = spark; import s.implicits._
    val df = Seq(("ab", 3L)).toDF("t", "n")
    val r = df.select(
      ZCol.padCenter(col("t"), 6, "*").as("p"),
      ZCol.clamp(col("n"), lit(5), lit(10)).as("c")).collect()(0)
    assert(r.getString(0) == "**ab**")
    assert(r.getLong(1) == 5L)
    val m = Seq(1).toDF("x").select(
      map(lit("a"), lit(1), lit("b"), lit(2)).as("m"))
    val got = m.select(
      ZCol.get(col("m"), "z", lit(-1)).as("g"),
      map_keys(ZCol.insert(col("m"), "c", lit(3))).as("ins"),
      map_keys(ZCol.remove(col("m"), "a")).as("rem"),
      ZCol.get(ZCol.update(col("m"), "a", _ + 10), "a", lit(-1)).as("upd"))
      .collect()(0)
    assert(got.getInt(0) == -1)
    assert(got.getSeq[String](1).toSet == Set("a", "b", "c"))
    assert(got.getSeq[String](2).toSeq == Seq("b"))
    assert(got.getInt(3) == 11)
  }

  test("saltedJoin equals plain join with the hot key spread") {
    val s = spark; import s.implicits._
    // heavily skewed left: 1000 rows on key 1, 5 on key 2
    val left = ((1 to 1000).map(i => (1L, i)) ++ (1 to 5).map(i => (2L, i)))
      .toDF("k", "v")
    val right = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val salted = left.saltedJoin(right, "k", salt = 8)
    val plain = left.join(right, "k")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1000L, 2L -> 5L))
  }

  test("ZCol: is_alpha family and valueHash stability") {
    val s = spark; import s.implicits._
    val df = Seq(("abc", "123", "a1b2", "a b")).toDF("a", "n", "an", "sp")
    val r = df.select(
      ZCol.isAlpha(col("a")), ZCol.isNumeric(col("n")),
      ZCol.isAlphaNumeric(col("an")), ZCol.isAlpha(col("sp"))).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
    val h = df.select(ZCol.valueHash(col("a"))).collect()(0).getString(0)
    assert(h == df.select(ZCol.valueHash(col("a"))).collect()(0).getString(0))
  }
}
