package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.core.GraphEncoder

/** SURVEY §7.4 experiment: as-of value resolution — per-query `max_by`
  * aggregate vs a pre-materialized current-values table. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AsOfBench"`
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val g = GraphEncoder.encodeEventHistory(spark, sf)
    val top = g.maxSlice
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm caches
    g.values.count(); g.atoms.count()

    // (a) per-query max_by at 5 distinct frames (arbitrary time travel)
    val slices = Seq(top / 10, top / 4, top / 2, (top * 3) / 4, top)
    val (tA, nA) = time {
      slices.map(s => g.at(s).all("User")
        .fieldValue("Value", "v_double", "v").count()).sum
    }

    // (b) materialized current table (built once) answering now-queries
    val vcols = Seq("v_str", "v_long", "v_double", "v_bool", "v_ts")
    val current = g.values
      .groupBy("ae_id")
      .agg(max_by(struct(vcols.map(col): _*), col("tx_slice")).as("__v"))
      .select(col("ae_id") +: vcols.map(c => col(s"__v.$c").as(c)): _*)
      .persist()
    val (tBuild, nBuild) = time { current.count() }
    val (tB, nB) = time {
      (1 to 5).map { _ =>
        g.now.aliveAtoms.filter(col("kind") === "relation" && col("atype") === "Value")
          .select(col("src_id").as("atom_id"), col("dst_id").as("ae_id"))
          .join(current, "ae_id").count()
      }.sum
    }
    println(s"""{"asof_maxby_5frames_sec":$tA,"rows_a":$nA,"current_build_sec":$tBuild,"current_rows":$nBuild,"asof_materialized_5now_sec":$tB,"rows_b":$nB,"max_slice":$top}""")
    spark.stop()
  }
}
