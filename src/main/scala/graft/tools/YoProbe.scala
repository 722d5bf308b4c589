package graft.tools
import graft._
import graft.core._
import org.apache.spark.sql.functions._
object YoProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time(lbl: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[yo-probe] $lbl ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    // cold full query
    val q = queries.Registry.entries.find(_.name == "graph_yo_report").get
    time("full cold")(q.fn(spark, sf).count())
    TransientCaches.releaseAll()
    // phase attribution
    time("encodeTpch+materialize") {
      val g = GraphEncoder.encodeTpch(spark, sf); g.now.aliveAtoms.count()
    }
    time("encodeEvents+materialize") {
      val g = GraphEncoder.encodeEventHistory(spark, sf); g.now.aliveAtoms.count()
    }
    time("full warm-encodes")(q.fn(spark, sf).count())
    time("full warm-encodes 2")(q.fn(spark, sf).count())
    // yo on just tpch set
    val gT = GraphEncoder.encodeTpch(spark, sf)
    val tpchSet = AtomSet(gT.now, gT.now.aliveAtoms.filter(
      col("atom_id").isin("e:Customer/1", "e:Nation/0")))
    time("tpch yo only")(tpchSet.yo.count())
    val gE = GraphEncoder.encodeEventHistory(spark, sf)
    val userSet = AtomSet(gE.now, gE.now.aliveAtoms.filter(
      col("atom_id").isin("e:User/1", "e:User/2", "e:User/3")))
    time("events yo only")(userSet.yo.count())
    spark.stop()
  }
}
