package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ZArr

/** Property tests for the array edit ops against Scala Vector semantics on
  * seeded random inputs — indices at, inside, and past the bounds; empty
  * arrays; repeated separators. Mirrors [[ZOpsPropertySpec]]'s method. */
class ZArrPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def cases(seed: Int): Seq[(Vector[Int], Int)] =
    (0 until 12).map { i =>
      val rnd = new scala.util.Random(seed * 1000 + i)
      val n = rnd.nextInt(9) // 0..8
      (Vector.fill(n)(rnd.nextInt(5)), rnd.nextInt(11))
    }

  /** Evaluate one array expression on one literal input row. */
  private def eval(xs: Vector[Int], f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Any = {
    val s = spark; import s.implicits._
    Seq(xs).toDF("a").select(f(col("a")).as("r")).collect()(0).get(0)
  }
  private def asVec(a: Any): Vector[Int] =
    a.asInstanceOf[scala.collection.Seq[Int]].toVector

  test("insertAt matches Vector patch-insert (idx clamped to bounds)") {
    cases(1).foreach { case (xs, idx0) =>
      val idx = idx0 % (xs.length + 1)
      val exp = (xs.take(idx) :+ 99) ++ xs.drop(idx)
      assert(asVec(eval(xs, a => ZArr.insertAt(a, idx, lit(99)))) == exp,
        s"xs=$xs idx=$idx")
    }
  }

  test("removeAt matches Vector patch-remove; out-of-range is identity") {
    cases(2).foreach { case (xs, idx0) =>
      val idx = idx0 // may exceed bounds
      val exp = if (idx < xs.length) xs.take(idx) ++ xs.drop(idx + 1) else xs
      assert(asVec(eval(xs, a => ZArr.removeAt(a, idx))) == exp,
        s"xs=$xs idx=$idx")
    }
  }

  test("replaceAt/updateAt touch exactly the indexed element") {
    cases(3).foreach { case (xs, idx0) =>
      val idx = idx0
      val exp = if (idx < xs.length) xs.updated(idx, 77) else xs
      assert(asVec(eval(xs, a => ZArr.replaceAt(a, idx, lit(77)))) == exp,
        s"xs=$xs idx=$idx")
      val exp2 = if (idx < xs.length) xs.updated(idx, xs(idx) + 1) else xs
      assert(asVec(eval(xs, a => ZArr.updateAt(a, idx, _ + 1))) == exp2,
        s"update xs=$xs idx=$idx")
    }
  }

  test("splice matches Vector.patch") {
    cases(4).foreach { case (xs, p) =>
      val start = p % (xs.length + 1)
      val n = p % 4
      val exp = xs.patch(start, Vector(1, 2), n)
      assert(asVec(eval(xs, a =>
        ZArr.splice(a, start, n, array(lit(1), lit(2))))) == exp,
        s"xs=$xs start=$start n=$n")
    }
  }

  test("indexesOf finds every 0-based position") {
    cases(5).foreach { case (xs, _) =>
      val exp = xs.zipWithIndex.collect { case (v, i) if v == 2 => i }
      assert(asVec(eval(xs, a => ZArr.indexesOf(a, lit(2)))) == exp,
        s"xs=$xs")
    }
  }

  test("null elements: trim keeps them, indexesOf/splitOn match them null-safely") {
    val s = spark; import s.implicits._
    def row(xs: Seq[java.lang.Integer]) = Seq(Tuple1(xs)).toDF("a")
    // leading null is NOT the separator — must survive trimLeft (the old
    // =!= evaluated NULL on it and silently trimmed it)
    val t = row(Seq(null, 0, 3)).select(
      ZArr.trimLeft(ZArr.trimLeft(col("a"), lit(0)), lit(0)).as("r"))
      .collect()(0).getSeq[Any](0)
    assert(t == Seq(null, 0, 3), s"leading null trimmed: $t")
    // a null probe matches null elements (None == None reference
    // semantics); the old === made it match nothing
    val idx = row(Seq(1, null, 2, null)).select(
      ZArr.indexesOf(col("a"), lit(null).cast("int")).as("r"))
      .collect()(0).getSeq[Int](0)
    assert(idx == Seq(1, 3), s"null probe found: $idx")
    // splitting on null splits AT the null elements
    val sp = row(Seq(1, null, 2)).select(
      ZArr.splitOn(col("a"), lit(null).cast("int")).as("r"))
      .collect()(0).getSeq[scala.collection.Seq[Any]](0)
    assert(sp.map(_.toSeq) == Seq(Seq(1), Seq(2)), s"split on null: $sp")
    // negative indices reject at plan time, not silently no-op
    intercept[IllegalArgumentException] {
      ZArr.updateAt(col("a"), -1, identity)
    }
    intercept[IllegalArgumentException] { ZArr.insertAt(col("a"), -1, lit(9)) }
  }

  test("trim family matches dropWhile/reverse-dropWhile") {
    cases(6).foreach { case (xs, _) =>
      assert(asVec(eval(xs, a => ZArr.trimLeft(a, lit(0))))
        == xs.dropWhile(_ == 0), s"left xs=$xs")
      assert(asVec(eval(xs, a => ZArr.trimRight(a, lit(0))))
        == xs.reverse.dropWhile(_ == 0).reverse, s"right xs=$xs")
      assert(asVec(eval(xs, a => ZArr.trim(a, lit(0))))
        == xs.dropWhile(_ == 0).reverse.dropWhile(_ == 0).reverse,
        s"trim xs=$xs")
    }
  }

  test("splitOn matches split-at-separator with empty runs kept") {
    cases(7).foreach { case (xs, _) =>
      // expected: fold into runs, separator 0 starts a new run
      val exp = xs.foldLeft(Vector(Vector.empty[Int])) { (acc, v) =>
        if (v == 0) acc :+ Vector.empty[Int]
        else acc.init :+ (acc.last :+ v)
      }
      val got = eval(xs, a => ZArr.splitOn(a, lit(0)))
        .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Int]]]
        .map(_.toVector).toVector
      assert(got == exp, s"xs=$xs")
    }
  }

  private def asVecVec(a: Any): Vector[Vector[Int]] =
    a.asInstanceOf[scala.collection.Seq[scala.collection.Seq[Int]]]
      .map(_.toVector).toVector

  test("combinations matches itertools semantics (position-distinct, " +
    "lexicographic by position, duplicates preserved)") {
    cases(8).foreach { case (xs, k0) =>
      val k = 1 + (k0 % 3)
      val exp = xs.indices.combinations(k)
        .map(is => is.map(xs).toVector).toVector
      assert(asVecVec(eval(xs, a => ZArr.combinations(a, k))) == exp,
        s"xs=$xs k=$k")
    }
  }

  test("permutations[n] enumerates ordered distinct-position selections") {
    cases(9).foreach { case (xs, k0) =>
      val k = 1 + (k0 % 2)
      // itertools.permutations(v, k): positions distinct, emission order =
      // for each first position in order, recurse on the remainder
      def perms(v: Vector[Int], n: Int): Vector[Vector[Int]] =
        if (n == 0) Vector(Vector.empty)
        else v.indices.toVector.flatMap { i =>
          perms(v.take(i) ++ v.drop(i + 1), n - 1).map(v(i) +: _)
        }
      assert(asVecVec(eval(xs, a => ZArr.permutations(a, k)))
        == perms(xs, k), s"xs=$xs k=$k")
    }
  }

  test("permutationsAll dispatches on runtime length; oversize is null") {
    val xs = Vector(1, 2, 3)
    def perms(v: Vector[Int]): Vector[Vector[Int]] =
      v.permutations.toVector // distinct values here, so == itertools
    assert(asVecVec(eval(xs, a => ZArr.permutationsAll(a, 4)))
      .sorted(Ordering.by((v: Vector[Int]) => v.mkString(",")))
      == perms(xs).sorted(Ordering.by((v: Vector[Int]) => v.mkString(","))))
    assert(eval(Vector(1, 2, 3, 4, 5), a => ZArr.permutationsAll(a, 4)) == null)
    assert(asVecVec(eval(Vector.empty, a => ZArr.permutationsAll(a, 4)))
      == Vector(Vector.empty))
  }
}
