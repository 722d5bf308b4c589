package graft.tools

import graft._
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Post-execution physical-plan metrics: run a registered query once
  * (optionally after a warm-up) and print every operator whose timing
  * metrics exceed a threshold — the "where did the seconds go" view that
  * the missing Spark UI would otherwise give.
  * Run: sbt "runMain graft.tools.PlanMetrics <query> [warmups]" */
object PlanMetrics {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("gql_parsed_nested")
    val warmups = args.lift(1).map(_.toInt).getOrElse(1)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    val q = graft.queries.Registry.queries(name)
    (1 to warmups).foreach(_ => q(spark, sf).count())
    val df = q(spark, sf)
    val t0 = System.nanoTime()
    // execute THIS dataframe's own QueryExecution (count() or a noop write
    // would plan a separate query and leave df's executedPlan metric-less)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    println(f"[plan-metrics] $name total=${(System.nanoTime() - t0) / 1e9}%.3fs")

    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.toSeq
        .filter { case (k, m) =>
          (k.contains("time") || k.contains("Time") || k == "numOutputRows") &&
            m.value > 0
        }
        .map { case (k, m) =>
          // SQLMetric carries its unit in metricType: "timing" is ms,
          // "nsTiming" is ns — printing both as ms is off by 1e6 for
          // exactly the operators this tool exists to profile
          val v = m.metricType match {
            case "nsTiming" => f"${m.value / 1000000}%,d ms"
            case "timing" => f"${m.value}%,d ms"
            case _ => f"${m.value}%,d"
          }
          s"$k=$v"
        }
      val timey = p.metrics.exists { case (k, m) =>
        (k.toLowerCase.contains("time") || k == "duration") && {
          val ms = if (m.metricType == "nsTiming") m.value / 1000000 else m.value
          ms > 100
        }
      }
      val big = p.metrics.get("numOutputRows").exists(_.value > 100000)
      if (timey || big || depth < 3) {
        val dur = p.metrics.get("duration").map(m => s" duration=${m.value}ms").getOrElse("")
        println("  " * depth + p.nodeName + dur + "  " + interesting.mkString(" "))
      }
      val children = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case i: InMemoryTableScanExec => Seq.empty
        case _ => p.children
      }
      children.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
