package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOfJoin

/** Property tests for the as-of join: on seeded random keyed time series,
  * all three lowerings (union+window backward, forward, broadcast
  * small-right) must agree with the literal per-row argmax/argmin oracle —
  * including empty sides, unmatched keys, timestamp ties and tolerance
  * cutoffs. */
class AsOfPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Random keyed series with deliberate tie collisions (small time domain,
    * few keys) and occasionally empty sides. */
  private def gen(seed: Int): (Seq[(String, Long, String)], Seq[(String, Long, String)]) = {
    val rnd = new scala.util.Random(seed)
    val keys = Seq("a", "b", "c", "d")
    def side(tag: String, maxN: Int): Seq[(String, Long, String)] = {
      val n = rnd.nextInt(maxN + 1)
      // distinct (key, t): the batch tie order between same-(key,t) right
      // rows is unspecified (matches the engines' freedom), so the
      // property keeps the right side unique per (key, t) like real feeds
      rnd.shuffle((for (k <- keys; t <- 0L until 12L) yield (k, t)).toList)
        .take(n).zipWithIndex
        .map { case ((k, t), i) => (k, t, s"$tag$i") }
    }
    (side("l", 30), side("r", 20))
  }

  private def naive(ls: Seq[(String, Long, String)], rs: Seq[(String, Long, String)],
      fwd: Boolean, tol: Option[Double]): Map[(String, Long, String), Option[String]] =
    ls.map { case (lk, lt, lv) =>
      val m = rs.filter { case (rk, rt, _) =>
        rk == lk && (if (fwd) rt >= lt else rt <= lt) &&
          tol.forall(t => math.abs(rt - lt) <= t)
      }
      val best =
        if (m.isEmpty) None
        else Some((if (fwd) m.minBy(_._2) else m.maxBy(_._2))._3)
      (lk, lt, lv) -> best
    }.toMap

  private def run(ls: Seq[(String, Long, String)], rs: Seq[(String, Long, String)],
      mode: String, tol: Option[Double]): Map[(String, Long, String), Option[String]] = {
    val s = spark; import s.implicits._
    val l = ls.toDF("k", "t", "lv")
    val r = rs.toDF("k", "t", "rv")
    val out = mode match {
      case "backward" => AsOfJoin.backward(l, r, Seq("k"), "t", "t", tol)
      case "forward" => AsOfJoin.forward(l, r, Seq("k"), "t", "t", tol)
      case "smallRight" => AsOfJoin.backwardSmallRight(l, r, Seq("k"), "t", "t", tol)
    }
    out.collect().map(row =>
      (row.getAs[String]("k"), row.getAs[Long]("t"), row.getAs[String]("lv"))
        -> Option(row.getAs[String]("rv"))).toMap
  }

  test("backward + smallRight match the argmax oracle on random series") {
    (0 until 8).foreach { seed =>
      val (ls, rs) = gen(seed)
      if (rs.nonEmpty) {
        val want = naive(ls, rs, fwd = false, None)
        assert(run(ls, rs, "backward", None) == want, s"backward seed=$seed")
        assert(run(ls, rs, "smallRight", None) == want, s"smallRight seed=$seed")
      }
    }
  }

  test("forward matches the argmin oracle on random series") {
    (0 until 8).foreach { seed =>
      val (ls, rs) = gen(seed + 100)
      if (rs.nonEmpty)
        assert(run(ls, rs, "forward", None) == naive(ls, rs, fwd = true, None),
          s"forward seed=$seed")
    }
  }

  test("tolerance cutoffs agree across lowerings on random series") {
    (0 until 6).foreach { seed =>
      val (ls, rs) = gen(seed + 200)
      val tol = Some((seed % 4 + 1).toDouble)
      if (rs.nonEmpty) {
        val want = naive(ls, rs, fwd = false, tol)
        assert(run(ls, rs, "backward", tol) == want, s"backward tol seed=$seed")
        assert(run(ls, rs, "smallRight", tol) == want, s"smallRight tol seed=$seed")
      }
    }
  }
}
