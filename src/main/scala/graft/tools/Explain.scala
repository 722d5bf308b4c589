package graft.tools

import graft._

/** Plan-inspection utility: prints the formatted physical plan of the named
  * queries (or the flagship) so scan pushdown / join strategy / codegen
  * spans can be reviewed. Run: sbt "runMain graft.tools.Explain <names...>" */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("agg_group_by_sum_mean")
    names.foreach { n =>
      println(s"\n===== $n =====")
      queries.Registry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
