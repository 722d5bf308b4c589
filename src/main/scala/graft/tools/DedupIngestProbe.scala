package graft.tools

import graft._
import graft.wrangling.{Dedup, IncrementalDedup}
import org.apache.spark.sql.functions._

/** Per-tick timing of the PRODUCTION dedup-on-ingest path: drives
  * IncrementalDedup.ingestTick (the exact body the streaming query runs)
  * over the registry fixture's 3-file split, then attributes the tick cost
  * to its phases with targeted standalone measurements over the same
  * batches (banding, stored-index scan, candidate verify). Numbers land in
  * BASELINE.md; the bench tracks the end-to-end figure. */
object DedupIngestProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    // per-tick JOB ledger: the phase costs below are each well under the
    // observed per-tick wall time, so the cost lives in job COUNT x fixed
    // scheduling overhead — count and time every job inside each label
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, e.time)
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          // Option-guard: a dropped (bus overflow) or pre-registration
          // start event would make the raw unbox NPE inside the listener
          // thread — an unattributed end is just skipped
          Option(jobs.remove(e.jobId)).foreach(t0 =>
            jobSecs.synchronized { jobSecs += (e.time - t0) / 1e3 })
      })
    def time(lbl: String)(f: => Unit): Unit = {
      jobSecs.synchronized(jobSecs.clear())
      val t0 = System.nanoTime(); f
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events are async: wait until every started job has its
      // end event (bounded — a fixed 300 ms undercounted slow ticks'
      // jobs), then a short grace for the buffer tail
      val deadline = System.nanoTime() + 2_000_000_000L
      while (!jobs.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      Thread.sleep(100)
      val js = jobSecs.synchronized(jobSecs.toSeq)
      println(f"[dedup-probe] $lbl $secs%.3f s " +
        f"(${js.size} jobs: ${js.map(s => f"$s%.2f").mkString(" ")})")
    }
    val base = "/tmp/graft_dedup_probe"
    graft.core.Fs.rm(new java.io.File(base))
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    time("src prep")(docs.repartition(3, col("doc_id"))
      .write.parquet(s"$base/src"))
    IncrementalDedup.publish(s"$base/index")
    val files = new java.io.File(s"$base/src").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      val batch = spark.read.parquet(f.getPath)
      time(s"tick$i ingestTick") {
        IncrementalDedup.ingestTick(spark, s"$base/index", batch,
          "doc_id", "text", threshold = 0.5, tick = i + 1)
      }
    }
    // phase attribution over the final state / last batch
    val last = spark.read.parquet(files.last.getPath)
    time("phase: banding only (one batch)") {
      Dedup.portableBands(
        last.select(col("doc_id"), col("text").as("__text")),
        "doc_id", "__text", 16, 8, 1)
        .select(col("doc_id"), col("band"), col("bv"))
        .localCheckpoint(true)
    }
    time("phase: stored-bands full scan") {
      IncrementalDedup.bands(spark, s"$base/index").count()
    }
    time("phase: stored-shingles full scan") {
      IncrementalDedup.shingles(spark, s"$base/index")
        .select(size(col("sh"))).agg(sum(lit(1))).collect()
    }
    time("final flag read") {
      IncrementalDedup.flags(spark, s"$base/index").count()
    }
    spark.stop()
  }
}
