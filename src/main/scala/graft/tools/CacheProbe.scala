package graft.tools

import graft.GraftSession

/** Cache-churn diagnostic: run one registered query N times in one JVM
  * and report per-run wall time, persisted-RDD count, and storage memory
  * — the signature that separates "plan is slow" from "storage eviction
  * churn is slow" (growing times + full storage = churn).
  * Usage: runMain graft.tools.CacheProbe <query> [runs]
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("gql_parsed_nested")
    val runs = args.lift(1).map(_.toInt).getOrElse(6)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    val q = graft.queries.Registry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      q(spark, sf).count()
      val t = (System.nanoTime() - t0) / 1e9
      val rdds = spark.sparkContext.getPersistentRDDs.size
      val mem = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => (max - free) / 1e6 }.sum
      val maxMem = spark.sparkContext.getExecutorMemoryStatus.values
        .map(_._1 / 1e6).sum
      println(f"[cache-probe] run=$i t=$t%7.3fs persistedRDDs=$rdds storageUsedMB=$mem%.0f/$maxMem%.0f")
    }
    spark.stop()
  }
}
