package graft.tools

import graft._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Attribute a query's analyzed-plan expression-node count (the
  * PlanShapeSpec <20k lint input) to its logical operators — the
  * "where do the expressions live" view that localized the
  * ivfAssign/lshPlanes inlined-literal blowups.
  * Run: sbt "runMain graft.tools.PlanExprs <query>" */
object PlanExprs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("graph_bulk_rescore")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(4)
    val df = graft.queries.Registry.queries(name)(spark, sf)
    val plan = df.queryExecution.analyzed
    def exprNodes(p: LogicalPlan): Int =
      p.expressions.map(e => e.collect { case _ => 1 }.sum).sum
    var total = 0; var nodes = 0
    val byClass = scala.collection.mutable.Map.empty[String, (Int, Int)]
    plan.foreach { p =>
      val n = exprNodes(p); total += n; nodes += 1
      val (c, s) = byClass.getOrElse(p.nodeName, (0, 0))
      byClass(p.nodeName) = (c + 1, s + n)
    }
    println(s"[plan-exprs] $name: $total expression nodes over $nodes operators")
    byClass.toSeq.sortBy(-_._2._2).take(12).foreach { case (cls, (c, s)) =>
      println(f"  $cls%-28s ops=$c%-5d exprs=$s%,d")
    }
    // the heaviest individual operators, with a one-line plan excerpt
    val heavy = plan.collect { case p => (exprNodes(p), p) }
      .sortBy(-_._1).take(6)
    heavy.foreach { case (n, p) =>
      val line = p.simpleString(60).linesIterator.next().take(160)
      println(f"  TOP $n%,d  $line")
    }
    spark.stop()
  }
}
