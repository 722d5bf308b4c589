package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.wrangling.Similarity

/** ANN design experiment (SURVEY "measure, don't guess"): recall@10 and
  * latency of the two sub-linear paths (LSH bucket probe, IVF posting
  * lists at several nprobe) against exact brute force, over the driver's
  * embeddings table. Run: SPARK_GRAFT_SF_DIR=… sbt "runMain
  * graft.tools.AnnBench"; results recorded in BASELINE.md. */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val emb = Tables.embeddings(spark, sf).persist()
    val n = emb.count()

    // deterministic query set: 20 spread ids
    val ids = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(2000).collect().map(_.getLong(0))
    val queries = (0 until 20).map(i => ids(i * ids.length / 20))
    val vecs = emb.filter(col("vec_id").isin(queries: _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

    val k = 10
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", 16, iters = 2)
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", cents).persist()
    index.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def recallAndTime(run: Array[Float] => Seq[Long],
        exact: Map[Long, Set[Long]]): (Double, Double) = {
      var rec = 0.0; var sec = 0.0
      queries.foreach { q =>
        val (got, t) = time(run(vecs(q)))
        rec += got.toSet.intersect(exact(q)).size.toDouble / k
        sec += t
      }
      (rec / queries.size, sec / queries.size)
    }

    val exact = queries.map { q =>
      q -> Similarity.cosineTopK(emb, "vec_id", "embedding", vecs(q), k)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val (_, bruteSec) = recallAndTime(
      qv => Similarity.cosineTopK(emb, "vec_id", "embedding", qv, k)
        .collect().map(_.getLong(0)).toSeq, exact)

    val (lshRec, lshSec) = recallAndTime(
      qv => Similarity.lshTopK(emb, "vec_id", "embedding", qv, k, dim = 64)
        .collect().map(_.getLong(0)).toSeq, exact)

    println(f"[annbench] n=$n queries=${queries.size} k=$k")
    println(f"[annbench] brute:        recall=1.000 sec/query=$bruteSec%.3f")
    println(f"[annbench] lsh(16b/4):   recall=$lshRec%.3f sec/query=$lshSec%.3f")
    Seq(2, 4, 8, 16).foreach { np =>
      val (r, s) = recallAndTime(
        qv => Similarity.ivfTopK(index, "vec_id", "embedding", cents, qv, k,
          nprobe = np).collect().map(_.getLong(0)).toSeq, exact)
      println(f"[annbench] ivf nprobe=$np%-2d: recall=$r%.3f sec/query=$s%.3f")
    }
    spark.stop()
  }
}
