package graft.tools

import graft._

/** Focused correctness dump: runs only the NAMED queries against sf0.01
  * (or SPARK_GRAFT_SF_DIR) and writes each result + its oracle SQL under
  * /tmp/graft_verify — paired with tools/verify_local.py which replays the
  * oracle in DuckDB and diffs. Run:
  *   sbt "runMain graft.tools.VerifyOne <names...>"
  *   python3 tools/verify_local.py <names...>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VerifyOne <query names...>")
    val spark = GraftSession.local(8)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = "/tmp/graft_verify"
    new java.io.File(out).mkdirs()
    args.foreach { n =>
      val q = queries.Registry.entries.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      q.fn(spark, sf).coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      // drop any stale .sql first: a query whose oracle was removed (or
      // renamed) would otherwise keep being diffed against the outdated
      // SQL from a prior run — bogus FAILs, or worse, bogus PASSes
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$out/$n.sql"))
      q.oracle.foreach(sql => java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$n.sql"), sql))
      println(s"[verify-one] wrote $out/$n")
    }
    spark.stop()
  }
}
