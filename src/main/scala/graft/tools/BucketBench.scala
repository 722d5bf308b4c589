package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.core.{GraphEncoder, GraphStore}

/** Bucketed vs plain layout experiment (GraphStore.saveBucketed): the
  * `latestValues`-shaped aggregate (`values.groupBy(ae_id)`) and the
  * atom_id sort-merge self-join, timed over both layouts from cold disk
  * reads. The bucketed plans carry no Exchange (asserted structurally in
  * GraphStoreSpec); this records what that is worth in wall-clock at the
  * bench scale. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.BucketBench"`
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val g = GraphEncoder.encodeTpch(spark, sf)
    val plainDir = "/tmp/bucketbench_plain"
    GraphStore.save(g, plainDir)
    GraphStore.saveBucketed(g, "bucketbench", numBuckets = 32)
    val top = g.maxSlice

    def median3(f: => Long): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    val vcols = Seq("v_str", "v_long", "v_double", "v_bool", "v_ts")
    def lvAgg(values: org.apache.spark.sql.DataFrame): Long =
      values.filter(col("tx_slice") <= top)
        .groupBy("ae_id")
        .agg(max_by(struct((Seq("tx_slice") ++ vcols).map(col): _*),
          col("tx_slice")))
        .count()
    def selfJoin(atoms: org.apache.spark.sql.DataFrame,
        atoms2: org.apache.spark.sql.DataFrame): Long =
      atoms.hint("merge")
        .join(atoms2.select("atom_id").hint("merge"), "atom_id").count()

    val plain = GraphStore.load(spark, plainDir)
    val bucketed = GraphStore.loadBucketed(spark, "bucketbench")
    val tAggPlain = median3(lvAgg(plain.values))
    val tAggBucketed = median3(lvAgg(bucketed.values))
    val tJoinPlain = median3(selfJoin(plain.atoms, GraphStore.load(spark, plainDir).atoms))
    val tJoinBucketed = median3(selfJoin(bucketed.atoms,
      GraphStore.loadBucketed(spark, "bucketbench").atoms))

    println(f"""{"latest_values_agg_plain_sec":$tAggPlain%.3f,"latest_values_agg_bucketed_sec":$tAggBucketed%.3f,"atom_join_plain_sec":$tJoinPlain%.3f,"atom_join_bucketed_sec":$tJoinBucketed%.3f,"sf":"$sf"}""")
    spark.stop()
  }
}
