package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry
import graft.tools.PlanShape

/** Plan-shape regression gate: every registry query's initial physical
  * plan (shuffle count, join strategies, scan count) must match the
  * committed PLANSHAPES.tsv snapshot. A failing diff means a plan
  * changed — if intentional, refresh with
  * `sbt "runMain graft.tools.PlanShape"` and review the TSV diff; if
  * not, a refactor just bought a silent extra shuffle or demoted a
  * broadcast join, exactly the class of regression that is invisible at
  * sf0.001 and fatal at cluster scale. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // scalar cross-joins (a 1-row aggregate broadcast against the data) are
  // the ONLY sanctioned nested-loop joins; anything else is a plan bug
  private val bnljSanctioned = Set("graph_bulk_rescore", "wr_tfidf_topk")

  test("every query's plan shape matches the committed snapshot") {
    val committed = scala.io.Source.fromFile("PLANSHAPES.tsv").getLines()
      .drop(1).filter(_.nonEmpty).map { l =>
        val f = l.split("\t")
        f(0) -> PlanShape.Shape(f(1).toInt, f(2).toInt, f(3).toInt,
          f(4).toInt, f(5).toInt, f(6).toInt, f(7).toInt, f(8).toInt)
      }.toMap
    val live = PlanShape.snapshot(spark, sf)
    val missing = Registry.entries.map(_.name).filterNot(committed.contains)
    assert(missing.isEmpty,
      s"queries missing from PLANSHAPES.tsv (refresh the snapshot): $missing")
    val diffs = live.collect {
      case (n, s) if committed(n) != s =>
        s"$n: committed=${committed(n)} live=$s"
    }
    assert(diffs.isEmpty, "plan shapes diverged from the snapshot " +
      s"(intentional? refresh PLANSHAPES.tsv):\n${diffs.mkString("\n")}")
    // registry-wide lints, independent of the snapshot
    live.foreach { case (n, s) =>
      assert(s.cartesian == 0, s"$n plans a CartesianProduct")
      assert(s.bnlj == 0 || bnljSanctioned(n),
        s"$n plans a BroadcastNestedLoopJoin outside the sanctioned " +
          "scalar-cross-join set")
    }
  }
}
