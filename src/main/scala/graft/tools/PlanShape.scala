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
      cartesian: Int, bnlj: Int, codegen: Int, scans: Int,
      exprs: Int = 0, analysisMs: Int = 0) {
    def tsv: String = s"$shuffles\t$bcasts\t$smj\t$bhj\t$cartesian\t$bnlj\t$codegen\t$scans\t$exprs\t$analysisMs"
  }

  val Header = "query\tshuffles\tbcasts\tsmj\tbhj\tcartesian\tbnlj\tcodegen\tscans\texprs\tanalysis_ms"

  /** Plan-compile-cost columns (the ivfAssign/lshPlanes defect class,
    * found twice: an inlined-literal matrix exploding the expression tree
    * and the per-invocation Catalyst bill with it). `exprs` counts
    * analyzed-plan expression nodes — deterministic at fixed SF, linted
    * registry-wide by PlanShapeSpec at the same <20k bound the LSH spec
    * pinned for one operator. `analysis_ms` is the measured wall time of
    * analyze+optimize+plan for the fresh build — machine-dependent, so
    * informational in the TSV plus a loose hang-guard lint. */
  def exprCount(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case p => p.expressions.map(e => e.collect { case x => x }.size).sum
    }.sum

  def shapeOf(df: DataFrame): Shape = {
    // structural count over the executed plan, built with AQE OFF (see
    // snapshot()): with AQE on the tree hides behind AdaptiveSparkPlanExec
    // until runtime, and text-rendering the initial plan over-counts —
    // InMemoryRelation prints its cached CHILD plan, so a cached graph's
    // encode subtree shows up as phantom exchanges. collect() walks real
    // children only (InMemoryTableScanExec is a leaf), so the counts are
    // the operators this query would actually run.
    val nodes = df.queryExecution.executedPlan.collect {
      case n => n.getClass.getSimpleName }
    def c(names: String*) = nodes.count(names.contains)
    Shape(
      shuffles = c("ShuffleExchangeExec"),
      bcasts = c("BroadcastExchangeExec"),
      smj = c("SortMergeJoinExec", "ShuffledHashJoinExec"),
      bhj = c("BroadcastHashJoinExec"),
      cartesian = c("CartesianProductExec"),
      bnlj = c("BroadcastNestedLoopJoinExec"),
      codegen = c("WholeStageCodegenExec"),
      // RDDScanExec: the shared graph caches are lineage-free checkpoint
      // leaves since r19 — their scans must stay visible in the column
      scans = c("FileSourceScanExec", "InMemoryTableScanExec", "RDDScanExec"))
  }

  /** Build each query's DataFrame cold (releaseAll first, Bench's
    * discipline) under AQE-off planning and return its shape. AQE is a
    * RUNTIME re-planner — disabling it for the snapshot exposes the
    * static plan (the one the optimizer chose from statistics), which is
    * the right thing to pin: AQE's runtime improvements still apply in
    * production, but a regression in the static plan is a regression in
    * what we ASKED for. Construction may run driver-side jobs for
    * imperative operators (BFS loops, checkpoints, the ingest query) —
    * that is part of the operator and is fine at sf0.001. */
  def snapshot(spark: org.apache.spark.sql.SparkSession, sf: String,
      names: Seq[String] = Nil): Seq[(String, Shape)] = {
    val picked =
      if (names.isEmpty) Registry.entries
      else {
        val known = Registry.entries.map(_.name).toSet
        val unknown = names.filterNot(known)
        require(unknown.isEmpty,
          s"unknown query name(s): ${unknown.mkString(", ")} — a typo " +
            "here used to silently snapshot nothing")
        Registry.entries.filter(e => names.contains(e.name))
      }
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try picked.map { q =>
      TransientCaches.releaseAll()
      // pin the WARM-state plan: execute once so every cache this query
      // uses is materialized, then shape a fresh build. Cold-state plans
      // are NOT reproducible — an InMemoryRelation's size estimate flips
      // from child-plan guess to actual bytes on materialization, which
      // flips broadcast-vs-SMJ selection; in a full test run other suites
      // may have materialized shared caches first. Warm-state stats are
      // data-determined, so the shape is stable in any execution context.
      q.fn(spark, sf).count()
      val df = q.fn(spark, sf)
      val t0 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze + optimize + plan
      val ms = ((System.nanoTime() - t0) / 1e6).toInt
      q.name -> shapeOf(df).copy(exprs = exprCount(df), analysisMs = ms)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  /** Re-parse the committed TSV body for a named-refresh merge. Merge
    * hygiene: a hand-mangled line without a tab used to throw
    * (ArrayIndexOutOfBounds), and rows for queries since removed or
    * renamed in the registry survived every named refresh as stale
    * shapes — skip the former loudly, drop the latter. */
  private[graft] def parseExistingRows(lines: Seq[String],
      registryNames: Set[String]): Map[String, String] =
    lines.drop(1).filter(_.nonEmpty).flatMap { l =>
      l.split("\t", 2) match {
        // column-count check: a named refresh against a TSV from before a
        // format change would otherwise merge rows of two widths and the
        // spec's fixed-index parse would misread them
        case Array(n, s) if registryNames.contains(n) &&
            s.count(_ == '\t') != Header.count(_ == '\t') - 1 =>
          println(s"[plan-shape] dropping old-format row for '$n' " +
            "(column count changed — do a full refresh)")
          None
        case Array(n, s) if registryNames.contains(n) => Some(n -> s)
        case Array(n, _) =>
          println(s"[plan-shape] dropping stale row for '$n' (not in registry)")
          None
        case _ =>
          println(s"[plan-shape] skipping malformed line (no tab): ${l.take(60)}")
          None
      }
    }.toMap

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLANSHAPES", "PLANSHAPES.tsv")
    val spark = GraftSession.local(4) // same config as SparkTestSession:
    // the spec replays the snapshot in the shared test session
    val fresh = snapshot(spark, sf, args.toSeq).map {
      case (n, s) => n -> s.tsv }.toMap
    // name args mean "refresh THESE rows": merge into the committed
    // snapshot instead of overwriting it — a single-query refresh used to
    // rewrite the whole TSV with one row, failing PlanShapeSpec's
    // missing-queries assertion for every other registry query
    val outPath = java.nio.file.Paths.get(out)
    val existing =
      if (args.nonEmpty && java.nio.file.Files.exists(outPath))
        parseExistingRows(scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(outPath)).asScala.toSeq,
          graft.queries.Registry.entries.map(_.name).toSet)
      else Map.empty[String, String]
    val merged = existing ++ fresh
    val body = merged.toSeq.sortBy(_._1)
      .map { case (n, s) => s"$n\t$s" }.mkString("\n")
    java.nio.file.Files.writeString(outPath, Header + "\n" + body + "\n")
    println(s"[plan-shape] wrote $out (${fresh.size} refreshed, " +
      s"${merged.size} total)")
    spark.stop()
  }
}
