package graft.tools

import graft._
import graft.core._
import graft.fx._
import org.apache.spark.sql.functions._

/** Per-tick timing of the PRODUCTION ingest path: drives
  * StreamIngest.applyBatch (the exact body the streaming query runs —
  * not a copy that can drift) over the 4-file source split, one call per
  * file, plus the end-to-end final read. Finer phase attribution lives in
  * BASELINE.md from the one-off breakdown; this probe tracks the numbers
  * that must stay true as the code evolves. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    // job-level attribution: every Spark job launched inside a timed
    // section is listed with its duration and first-stage callsite, so a
    // per-batch total decomposes into its scheduled jobs (the floor at
    // local scale is JOB COUNT, not volume — this shows which ones)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(js.jobId, (System.nanoTime(),
            js.stageInfos.headOption.map(_.details.linesIterator
              .find(_.contains("graft")).getOrElse("").trim.take(90))
              .getOrElse("")))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, site) = jobs.getOrDefault(je.jobId, (0L, ""))
          if (t0 > 0)
            println(f"[ingest-probe]   job ${je.jobId}%3d " +
              f"${(System.nanoTime() - t0) / 1e9}%6.3f s  $site")
        }
      })
    def time(lbl: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      // capture elapsed BEFORE the drain sleep: the sleep only orders the
      // job-end log lines ahead of the section line, it is not section work
      // (inside the window it inflated every sub-second tick by 50ms+)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let job-end events drain before the section line
      println(f"[ingest-probe] $lbl $sec%.3f s")
    }
    val base = "/tmp/graft_ingest_probe"
    Fs.rm(new java.io.File(base))
    val ev = Tables.events(spark, sf)
    time("src prep")(ev.repartition(4, col("event_id"))
      .write.parquet(s"$base/src"))
    time("publish")(Sync.publish(Graph.empty(spark), s"$base/store"))
    var state = StreamIngest.IngestState(Sync.open(spark, s"$base/store"), None)
    val fields = Seq(
      StreamIngest.IngestField("Value", "double", col("value")),
      StreamIngest.IngestField("EventType", "str", col("event_type")))
    val files = new java.io.File(s"$base/src").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      val batch = spark.read.parquet(f.getPath)
      time(s"batch$i applyBatch") {
        state = StreamIngest.applyBatch(state, batch, s"$base/store", "User",
          col("user_id"), col("ts"), col("event_id"), fields)
      }
    }
    time("final read") {
      val g = Sync.open(spark, s"$base/store").graph
      g.now.all("User").fieldValue("Value", "v_double", "value")
        .join(g.now.all("User")
          .fieldValue("EventType", "v_str", "event_type"), "atom_id")
        .orderBy(col("atom_id")).count()
    }
    spark.stop()
  }
}
