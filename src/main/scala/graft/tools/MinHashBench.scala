package graft.tools

import graft.GraftSession
import graft.wrangling.Dedup

/** Micro-benchmark: classic k-column min(xxhash64(seed_i)) signatures vs
  * the single-pass MinHashAgg TypedImperativeAggregate. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.MinHashBench"`
  */
object MinHashBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, sf).cache()
    docs.count()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val k = 64
    // warm both paths once, then time 3 runs each
    Dedup.minhashSignatures(docs, "doc_id", "text", k, 1).count()
    Dedup.minhashSignaturesFast(docs, "doc_id", "text", k, 1).count()
    val tClassic = (1 to 3).map(_ =>
      time(Dedup.minhashSignatures(docs, "doc_id", "text", k, 1).count())).min
    val tFast = (1 to 3).map(_ =>
      time(Dedup.minhashSignaturesFast(docs, "doc_id", "text", k, 1).count())).min
    println(s"""{"minhash_classic_${k}h_sec":$tClassic,"minhash_agg_${k}h_sec":$tFast,"speedup":${tClassic / tFast}}""")
    spark.stop()
  }
}
