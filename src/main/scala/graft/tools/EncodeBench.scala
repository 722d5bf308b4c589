package graft.tools

import org.apache.spark.sql.SparkSession

/** Bulk-encode micro-bench: times `GraphEncoder.encodeTpchUncached` (the
  * Bench "class 1" bulk-load metric) N times INSIDE one JVM and reports
  * each sample plus the median — the one-shot per-JVM measurement Bench
  * takes has a ±1.5 s startup/JIT noise floor at sf0.1, far too coarse to
  * attribute encoder-plan changes (measured: three consecutive one-shot
  * runs of identical code read 8.4/10.4/10.1 s).
  * Run: sbt "runMain graft.tools.EncodeBench [sfDir] [runs]" */
object EncodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = graft.GraftSession.local(cpus)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val ts = (1 to runs).map { i =>
      val t = time {
        val g = graft.core.GraphEncoder.encodeTpchUncached(spark, sfDir)
        g.atoms.count(); g.values.count()
      }
      println(f"[encode-bench] run $i: $t%.3f s")
      t
    }
    val s = ts.sorted
    println(f"[encode-bench] median ${s(s.length / 2)}%.3f s over $runs runs")
    spark.stop()
  }
}
