package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.core.{GraphEncoder, GraphStore}

/** Bucketed-layout probe (GraphStore.saveBucketed): BASELINE.md sizes
  * bucket count for 100 TB at O(100k) so one bucket of `values` fits an
  * executor; this validates the small end of that argument — does the
  * zero-Exchange property survive a 30×+ bucket-count increase, and what
  * does the small-files tax (files = buckets × partition dirs) cost at
  * write and at read?
  *
  * Per layout it times `saveBucketed`, counts the files it produced,
  * then times the two plans whose shuffles bucketing exists to remove —
  * the `latestValues`-shaped aggregate (`values.groupBy(ae_id)`) and the
  * atom_id sort-merge self-join — and reports whether each executed plan
  * carried an Exchange (asserted structurally in GraphStoreSpec; recorded
  * here as data). A plain (unbucketed) layout is the baseline row.
  *
  * Usage: `runMain graft.tools.BucketBench [factor] [buckets...]`
  * `factor` > 1 synthesizes decorrelated factor× data via
  * [[ScaleProbe.synthesize]] (e.g. `BucketBench 10 32 256 1000`);
  * SPARK_GRAFT_SF_DIR picks the base dir (default sf0.1).
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(1)
    val buckets =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(32)
    val dir =
      if (factor <= 1) sf
      else {
        val d = s"/tmp/graft_scale/x$factor"
        ScaleProbe.synthesize(spark, sf, d, factor)
        d
      }
    val g = GraphEncoder.encodeTpch(spark, dir)
    val top = g.maxSlice

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def median3(f: => Long): Double = {
      val ts = (1 to 3).map(_ => timed(f)._2)
      ts.sorted.apply(1)
    }
    /** (file count, total MiB) under a table/directory tree. */
    def fileStats(root: java.io.File): (Long, Double) = {
      def walk(f: java.io.File): (Long, Long) =
        if (f.isDirectory)
          // listFiles is null on an unreadable or concurrently-removed
          // dir (Spark temp cleanup can race the walk) — count it empty
          Option(f.listFiles).getOrElse(Array.empty)
            .map(walk).foldLeft((0L, 0L)) {
              case ((n1, b1), (n2, b2)) => (n1 + n2, b1 + b2)
            }
        else if (f.getName.startsWith("_") || f.getName.startsWith("."))
          (0L, 0L) // markers/CRCs aren't data files
        else (1L, f.length)
      val (n, b) = if (root.exists) walk(root) else (0L, 0L)
      (n, b / 1024.0 / 1024.0)
    }

    val vcols = Seq("v_str", "v_long", "v_double", "v_bool", "v_ts")
    def lvAgg(values: DataFrame): DataFrame =
      values.filter(col("tx_slice") <= top)
        .groupBy("ae_id")
        .agg(max_by(struct((Seq("tx_slice") ++ vcols).map(col): _*),
          col("tx_slice")))
    def selfJoin(atoms: DataFrame, atoms2: DataFrame): DataFrame =
      atoms.hint("merge")
        .join(atoms2.select("atom_id").hint("merge"), "atom_id")
    def hasExchange(df: DataFrame): Boolean = {
      df.count()
      df.queryExecution.executedPlan.toString.contains("Exchange")
    }

    def report(layout: String, tWrite: Double, files: Long, mib: Double,
        values: DataFrame, atoms: => (DataFrame, DataFrame)): Unit = {
      val aggEx = hasExchange(lvAgg(values))
      val tAgg = median3(lvAgg(values).count())
      val (a1, a2) = atoms
      val joinEx = hasExchange(selfJoin(a1, a2))
      val tJoin = median3(selfJoin(a1, a2).count())
      println(f"""{"metric":"bucket_bench","layout":"$layout","write_sec":$tWrite%.2f,"files":$files,"mib":$mib%.1f,"agg_sec":$tAgg%.3f,"agg_exchange":$aggEx,"join_sec":$tJoin%.3f,"join_exchange":$joinEx,"dir":"$dir","cpus":$cpus}""")
    }

    val plainDir = "/tmp/bucketbench_plain"
    val (_, tPlainW) = timed(GraphStore.save(g, plainDir))
    val (pFiles, pMib) = fileStats(new java.io.File(plainDir))
    val plain = GraphStore.load(spark, plainDir)
    report("plain", tPlainW, pFiles, pMib,
      plain.values, (plain.atoms, plain.atoms))

    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    for (b <- buckets) {
      val prefix = s"bb$b"
      val (_, tW) = timed(GraphStore.saveBucketed(g, prefix, numBuckets = b))
      val (files, mib) = Seq("atoms", "values", "txs", "tags")
        .map(t => fileStats(new java.io.File(wh, s"${prefix}_$t")))
        .foldLeft((0L, 0.0)) { case ((n1, m1), (n2, m2)) => (n1 + n2, m1 + m2) }
      report(s"bucketed_$b", tW, files, mib,
        GraphStore.loadBucketed(spark, prefix).values,
        (GraphStore.loadBucketed(spark, prefix).atoms,
          GraphStore.loadBucketed(spark, prefix).atoms))
    }
    spark.stop()
  }
}
