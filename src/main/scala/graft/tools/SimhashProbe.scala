package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.wrangling.Dedup

/** Stage-attribution probe for wr_simhash: times the fingerprint
  * aggregation and the pair join separately so optimization effort lands
  * on the stage that actually costs. Dev aid, not a driver surface. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 300)
    docs.count() // warm the scan
    // fingerprints only
    (1 to 2).foreach { _ =>
      val tFp = time(Dedup.simhashPortable(docs, "doc_id", "text").count())
      println(f"[probe] fingerprints: $tFp%.3f s")
    }
    val fps = Dedup.simhashPortable(docs, "doc_id", "text")
      .persist()
    fps.count()
    (1 to 2).foreach { _ =>
      val tPairs = time(
        Dedup.simhashPairsPortable(fps, "doc_id", maxDist = 7).count())
      println(f"[probe] pairs-from-cached-fps: $tPairs%.3f s")
    }
    val tok = docs.select(explode(
      graft.wrangling.TextOps.tokens(col("text"))).as("w"))
    println(f"[probe] token explode only: ${time(tok.count())}%.3f s")
    println(f"[probe] token md5 only: ${
      time(tok.select(md5(col("w").cast("binary")).as("h")).agg(max("h")).count())}%.3f s")
    println("[probe] n_tokens=" + tok.count())
    spark.stop()
  }
}
