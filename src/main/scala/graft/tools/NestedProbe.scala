package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Phase-level timing for the er_infer_nested pipeline (the bench's most
  * expensive query): docs build → flatten → fixpoint → toGraph → traversal,
  * repeated N times in one JVM to localize the intermittent multi-second
  * stall CacheProbe shows (bimodal 3.5s / 15s at constant tiny storage).
  * Usage: runMain graft.tools.NestedProbe [runs]
  */
object NestedProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(5)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    import graft.wrangling.NestedInfer
    import NestedInfer._
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // SPARK_GRAFT_UNBOUNDED=1 drops the oracle-sized custkey bound — the
    // scale-tier attribution shape (ScaleProbe's er_infer_nested_unbounded)
    val unbounded = sys.env.get("SPARK_GRAFT_UNBOUNDED").contains("1")
    for (i <- 1 to runs) {
      val cust0 = graft.Tables.customer(spark, sf)
      val cust = if (unbounded) cust0 else cust0.filter(col("c_custkey") < 300)
      val nat = graft.Tables.nation(spark, sf)
      val docs = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .select(col("c_custkey").as("doc_id"),
          to_json(struct(
            col("c_name").as("name"),
            col("c_mktsegment").as("segment"),
            struct(col("n_name").as("name")).as("nation"),
            array(concat(col("c_name"), lit("-p1")),
              concat(col("c_name"), lit("-p2"))).as("phones"))).as("doc"))
      val rules = Seq(
        TripleRule(ZP, V("segment"), AnyP, "Customer"),
        TripleRule(T("Customer"), V("nation"), ZP, "Nation"))
      val (flat, tFlat) = t(NestedInfer.flatten(docs, "doc_id", "doc"))
      val (typed, tFix) = t(NestedInfer.fixpoint(flat, rules))
      val (g, tGraph) = t(NestedInfer.toGraph(Flattened(typed, flat.triples)))
      val (_, tMat) = t { g.atoms.count(); g.values.count() }
      val (_, tTrav) = t {
        val custSet = g.now.all("Customer")
        val names = custSet.fieldValue("name", "v_str", "cname")
        val nations = custSet.outsWithSource("nation", "__cust").df
          .filter(col("atype") === "Nation")
        val nname = graft.core.AtomSet(g.now, nations).field("name")
          .select(col("__cust").as("atom_id"), col("v_str").as("nname"))
        val phones = custSet.field("phones")
          .groupBy("atom_id")
          .agg(count(lit(1)).as("nphones"), min(col("v_str")).as("phone_min"))
        names.join(nname, "atom_id").join(phones, "atom_id")
          .select(col("cname"), col("nname"), col("nphones"), col("phone_min"))
          .orderBy(col("cname")).count()
      }
      println(f"[nested-probe] run=$i flatten=$tFlat%6.3f fixpoint=$tFix%6.3f " +
        f"toGraph=$tGraph%6.3f materialize=$tMat%6.3f traversal=$tTrav%6.3f " +
        f"total=${tFlat + tFix + tGraph + tMat + tTrav}%6.3f")
      graft.core.TransientCaches.releaseAll()
    }
    spark.stop()
  }
}
