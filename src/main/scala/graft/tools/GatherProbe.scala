package graft.tools
import graft._
import graft.core._
import org.apache.spark.sql.functions._
object GatherProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time(lbl: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[gather-probe] $lbl ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val g = GraphEncoder.encodeTpch(spark, sf)
    time("materialize graph")(g.now.aliveAtoms.count())
    val seed = AtomSet(g.now, g.atoms.filter(col("atom_id") === "e:Customer/0"))
    time("gather warm1")(seed.gather(Seq("Placed", "MemberOf"), 2).df.count())
    time("gather warm2")(seed.gather(Seq("Placed", "MemberOf"), 2).df.count())
    // phase split: rels view materialization alone
    val rels0 = g.atoms.filter(col("kind") === "relation" &&
      col("atype").isInCollection(Seq("Placed", "MemberOf")))
      .select(col("atom_id"), col("src_id"), col("dst_id"))
    time("rels view count")(rels0.count())
    spark.stop()
  }
}
