package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.wrangling.{IncrementalAnn, Similarity}

/** Phase attribution for stream_ann_ingest: where do the seconds go —
  * quantizer training, seed save, source prep, the streaming ticks, or
  * the final probe? Run: runMain graft.tools.AnnIngestProbe [sfDir] */
object AnnIngestProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ann-probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    (1 to 2).foreach { round =>
      println(s"[ann-probe] --- round $round ---")
      val base = s"/tmp/graft_annprobe/r$round"
      graft.core.Fs.rm(new java.io.File(base))
      val emb = Tables.embeddings(spark, d)
      val seed = emb.filter(col("vec_id") % 2 === 0)
      val rest = emb.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id"), col("embedding"))
      val cents = time("ivfTrain")(
        Similarity.ivfTrain(seed, "vec_id", "embedding", 8, iters = 2))
      time("ivfSave(seed)")(Similarity.ivfSave(
        Similarity.ivfIndex(seed, "vec_id", "embedding", cents),
        cents, s"$base/index"))
      time("mkdirs")(new java.io.File(s"$base/index/postings_delta").mkdirs())
      time("source prep")(rest.repartition(3, col("vec_id")).write
        .mode("overwrite").parquet(s"$base/src"))
      val stream = spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      time("stream 3 ticks") {
        val q = IncrementalAnn.streamToIndex(stream, s"$base/index",
          "vec_id", "embedding", s"$base/ckpt")
        q.awaitTermination()
      }
      val qv = time("query vec collect")(emb.filter(col("vec_id") === 2)
        .select(col("embedding")).collect()(0).getSeq[Float](0).toArray)
      time("probe topk")(Similarity.ivfTopK(
        IncrementalAnn.postings(spark, s"$base/index", "vec_id", "embedding"),
        "vec_id", "embedding", cents, qv, 10, nprobe = 8).collect())
    }
    spark.stop()
  }
}
