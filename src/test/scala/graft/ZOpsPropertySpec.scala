package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ZOps._

/** Property tests: the distributed sequence DSL must agree with Scala
  * collection semantics on arbitrary inputs — take/skip on negative and
  * oversized n, takeWhile/skipWhile on arbitrary thresholds, stride,
  * chunk, distinctBy keep-first, enumerate density. Seeded random lists
  * are the spec; the DataFrame ops are the implementation under test. */
class ZOpsPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** 12 deterministic cases per property: (values, aux parameter). */
  private def cases(seed: Int): Seq[(List[Int], Int)] =
    (0 until 12).map { i =>
      val rnd = new scala.util.Random(seed * 100 + i)
      val n = rnd.nextInt(26) // 0..25, includes the empty list
      (List.fill(n)(rnd.nextInt(26) - 5), rnd.nextInt(61) - 30)
    }

  private def df(xs: List[Int]) = {
    val s = spark; import s.implicits._
    // unique order key (i) + possibly-duplicated payload (v)
    xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
  }
  private def vals(d: org.apache.spark.sql.DataFrame): List[Int] =
    d.orderBy("i").select("v").collect().map(_.getInt(0)).toList

  test("zTake/zSkip agree with List.take/drop incl. negative n (from end)") {
    cases(1).foreach { case (xs, n) =>
      val d = df(xs)
      val expTake = if (n >= 0) xs.take(n) else xs.takeRight(-n)
      val expSkip = if (n >= 0) xs.drop(n) else xs.dropRight(-n)
      assert(vals(d.zTake(n, Seq(col("i")))) == expTake, s"take xs=$xs n=$n")
      assert(vals(d.zSkip(n, Seq(col("i")))) == expSkip, s"skip xs=$xs n=$n")
    }
  }

  test("takeWhile/skipWhile agree with List semantics") {
    cases(2).foreach { case (xs, t0) =>
      val t = t0 % 21
      val d = df(xs)
      assert(vals(d.takeWhile(col("v") < t, Seq(col("i"))))
        == xs.takeWhile(_ < t), s"takeWhile xs=$xs t=$t")
      assert(vals(d.skipWhile(col("v") < t, Seq(col("i"))))
        == xs.dropWhile(_ < t), s"skipWhile xs=$xs t=$t")
    }
  }

  test("stride picks every n-th element starting at the first") {
    cases(3).foreach { case (xs, n0) =>
      val n = math.abs(n0) % 7 + 1
      val exp = xs.zipWithIndex.collect { case (v, i) if i % n == 0 => v }
      assert(vals(df(xs).stride(n, Seq(col("i")))) == exp, s"xs=$xs n=$n")
    }
  }

  test("chunk ids partition the sequence into blocks of n in order") {
    cases(4).foreach { case (xs, n0) =>
      val n = math.abs(n0) % 7 + 1
      val got = df(xs).chunk(n, Seq(col("i")))
        .orderBy("i").select("chunk_id").collect().map(_.getLong(0)).toList
      val exp = xs.indices.map(i => (i / n).toLong).toList
      assert(got == exp, s"xs=$xs n=$n")
    }
  }

  test("distinctBy keeps the FIRST occurrence per key") {
    cases(5).foreach { case (xs, _) =>
      val exp = xs.zipWithIndex.groupBy(_._1).values.map(_.minBy(_._2))
        .toList.sortBy(_._2).map(_._1)
      assert(vals(df(xs).distinctBy(Seq(col("v")), Seq(col("i")))) == exp,
        s"xs=$xs")
    }
  }

  test("maxBy/minBy pick the extreme row per group, ties broken by the " +
      "remaining columns (hash-agg lowering)") {
    cases(7).foreach { case (xs, _) =>
      val s = spark; import s.implicits._
      val rows = xs.zipWithIndex.map { case (v, i) => (i, v, v % 3) }
      val d = rows.toDF("i", "v", "g")
      def got(r: org.apache.spark.sql.DataFrame) = r.orderBy("g", "i")
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getInt(2))).toList
      // tie contract: among max-v rows the packed struct compares the
      // remaining columns (i first) — so max picks the largest i, min the
      // smallest
      val expMax = rows.groupBy(_._3).values.map { grp =>
        val mv = grp.map(_._2).max; grp.filter(_._2 == mv).maxBy(_._1)
      }.toList.sortBy(r => (r._3, r._1))
      val expMin = rows.groupBy(_._3).values.map { grp =>
        val mv = grp.map(_._2).min; grp.filter(_._2 == mv).minBy(_._1)
      }.toList.sortBy(r => (r._3, r._1))
      assert(got(d.maxBy(Seq(col("g")), Seq(col("v")))) == expMax, s"maxBy xs=$xs")
      assert(got(d.minBy(Seq(col("g")), Seq(col("v")))) == expMin, s"minBy xs=$xs")
    }
  }

  test("enumerate is dense, 0-based and order-aligned") {
    cases(6).foreach { case (xs, _) =>
      val got = df(xs).enumerate(Seq(col("i")))
        .orderBy("i").select("idx").collect().map(_.getLong(0)).toList
      assert(got == xs.indices.map(_.toLong).toList, s"xs=$xs")
    }
  }
}
