package graft.tools

import graft._

/** Focused timing for the named queries: 1 warm-up + 3 timed runs, median,
  * against SPARK_GRAFT_SF_DIR (default sf0.1) — the same protocol AND the
  * same SPARK_GRAFT_CPUS sizing as Bench (a hardcoded local[32] here made
  * "isolated" numbers incomparable on CPU-quota'd builder machines: 32
  * task threads thrashing ~4 effective cores).
  * Run: sbt "runMain graft.tools.BenchOne <names...>" */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query names...>")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // construction-eager queries leak one localCheckpoint RDD set per
    // fn() call; the blocks free only when their weak refs GC, so without
    // a settle the timed runs churn executor storage and grow run-over-run
    // (ScaleProbe's gcSettle note — measured there as a 4x spread; seen
    // here as 5.2/8.0/8.5 s on graph_gather_2step). Same mitigation.
    def gcSettle(): Unit = { System.gc(); Thread.sleep(200) }
    args.foreach { n =>
      val q = queries.Registry.entries.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      q.fn(spark, sf).count() // warm-up
      val ts = (1 to 3).map { _ =>
        gcSettle(); time(q.fn(spark, sf).count())
      }.sorted
      println(f"[bench-one] $n median=${ts(1)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      graft.core.TransientCaches.releaseAll() // same hygiene as Bench
    }
    spark.stop()
  }
}
