package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession
import graft.core.TransientCaches
import graft.queries.Registry

/** Plan-shape inventory: pin every registry query's INITIAL physical plan
  * (pre-AQE `queryExecution.sparkPlan` — deterministic at a fixed SF,
  * unlike the runtime-adaptive executed plan) to a committed snapshot,
  * so a plan regression — a new shuffle, a broadcast that silently
  * became a sort-merge join, a cartesian product creeping into a
  * refactor — fails CI instead of surfacing as a 100× slowdown at
  * cluster scale. PlanShapeSpec replays this and diffs against
  * PLANSHAPES.tsv; refresh the snapshot with
  * `sbt "runMain graft.tools.PlanShape"` after an INTENTIONAL change
  * and review the diff like any other code change.
  *
  * Counted node classes (by simpleName, so no private-API coupling):
  * shuffle/broadcast exchanges, the join strategies, whole-stage codegen
  * spans, and source scans. Queries are built under the same per-query
  * release discipline as Bench, so cache state — and therefore the
  * plan — is cold-deterministic regardless of registry order.
  */
object PlanShape {

  final case class Shape(shuffles: Int, bcasts: Int, smj: Int, bhj: Int,
      cartesian: Int, bnlj: Int, codegen: Int, scans: Int) {
    def tsv: String = s"$shuffles\t$bcasts\t$smj\t$bhj\t$cartesian\t$bnlj\t$scans"
  }

  val Header = "query\tshuffles\tbcasts\tsmj\tbhj\tcartesian\tbnlj\tscans"

  def shapeOf(df: DataFrame): Shape = {
    // count from the UNEXECUTED plan's text: `sparkPlan` predates
    // EnsureRequirements (no exchanges visible at all), and the executed
    // adaptive plan hides its tree behind AdaptiveSparkPlanExec until
    // runtime — but its toString renders the INITIAL physical plan,
    // exchanges and join strategies included, deterministically at a
    // fixed SF. Codegen spans only exist per-stage at runtime, so they
    // are deliberately not part of the pinned shape.
    val txt = df.queryExecution.executedPlan.toString
    def c(pat: String) = pat.r.findAllMatchIn(txt).size
    Shape(
      shuffles = c("\\bExchange "),
      bcasts = c("\\bBroadcastExchange\\b"),
      smj = c("\\bSortMergeJoin\\b") + c("\\bShuffledHashJoin\\b"),
      bhj = c("\\bBroadcastHashJoin\\b"),
      cartesian = c("\\bCartesianProduct\\b"),
      bnlj = c("\\bBroadcastNestedLoopJoin\\b"),
      codegen = 0,
      scans = c("\\bFileScan\\b") + c("\\bInMemoryTableScan\\b"))
  }

  /** Build each query's DataFrame cold (releaseAll first, Bench's
    * discipline) and return its shape. Construction may run driver-side
    * jobs for imperative operators (BFS loops, checkpoints, the ingest
    * query) — that is part of the operator and is fine at sf0.001. */
  def snapshot(spark: org.apache.spark.sql.SparkSession, sf: String,
      names: Seq[String] = Nil): Seq[(String, Shape)] = {
    val picked =
      if (names.isEmpty) Registry.entries
      else Registry.entries.filter(e => names.contains(e.name))
    picked.map { q =>
      TransientCaches.releaseAll()
      q.name -> shapeOf(q.fn(spark, sf))
    }
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLANSHAPES", "PLANSHAPES.tsv")
    val spark = GraftSession.local(4) // same config as SparkTestSession:
    // the spec replays the snapshot in the shared test session
    val shapes = snapshot(spark, sf, args.toSeq)
    val body = shapes.sortBy(_._1)
      .map { case (n, s) => s"$n\t${s.tsv}" }.mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      Header + "\n" + body + "\n")
    println(s"[plan-shape] wrote $out (${shapes.size} queries)")
    spark.stop()
  }
}
