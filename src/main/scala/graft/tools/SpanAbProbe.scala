package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.wrangling.SpanDedup

/** Interleaved A/B for the r18 span-dedup pair-generation rewrite: times
  * the RETIRED self-join shape (inlined here verbatim) against the live
  * grouped-explosion shape (SpanDedup.duplicateSpans) in strict
  * alternation within one JVM, so host-load drift — the NOTES-documented
  * multi-second stall windows that poison absolute medians on this
  * machine — hits both variants equally and the RATIO stays meaningful.
  * Also asserts the two span sets are row-identical on every iteration
  * (the rewrite's contract: same pairs, same spans).
  * Run: runMain graft.tools.SpanAbProbe [iters] */
object SpanAbProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(3)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val spanTokens = 8
    val maxDocFreq = 50L

    // the r13–r17 shape, verbatim: valve groupBy + anti-join + second
    // checkpoint + hash self-join
    def oldSpans(docs: DataFrame): DataFrame = {
      val sh0 = SpanDedup.spanShingles(docs, "doc_id", "text", spanTokens)
      val base = sh0.localCheckpoint(true)
      val hot = base.groupBy(col("__h"))
        .agg(countDistinct(col("doc_id")).as("__df"), count(lit(1)).as("__wins"))
        .filter(col("__df") > maxDocFreq)
        .localCheckpoint(true)
      val r = hot.agg(count(lit(1)), coalesce(sum(col("__wins")), lit(0L)))
        .collect()(0)
      val hotKeys = hot.select(col("__h"))
      val keep =
        if (r.getLong(0) <= 1000000L)
          base.join(broadcast(hotKeys), Seq("__h"), "left_anti")
        else base.join(hotKeys, Seq("__h"), "left_anti")
      val sh = keep.localCheckpoint(true)
      val a = sh.select(col("doc_id").as("id_a"), col("__pos").as("pos_a"),
        col("__h"))
      val b = sh.select(col("doc_id").as("id_b"), col("__pos").as("pos_b"),
        col("__h"))
      val hits = a.join(b, Seq("__h"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
          (col("pos_a") - col("pos_b")).as("__diag"))
      val win = Window.partitionBy(col("id_a"), col("id_b"), col("__diag"))
        .orderBy(col("pos_a"))
      hits.withColumn("__grp", col("pos_a") - row_number().over(win))
        .groupBy(col("id_a"), col("id_b"), col("__diag"), col("__grp"))
        .agg(min(col("pos_a")).as("start_a"), count(lit(1)).as("__n"))
        .select(col("id_a"), col("id_b"), col("start_a"),
          (col("start_a") - col("__diag")).as("start_b"),
          (col("__n") + spanTokens - 1).as("span_len"))
    }

    def newSpans(docs: DataFrame): DataFrame =
      SpanDedup.duplicateSpans(docs, "doc_id", "text", spanTokens, maxDocFreq)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def gcSettle(): Unit = { System.gc(); Thread.sleep(200) }

    val docs = graft.Tables.documents(spark, sf)
    // result-identity gate, once up front (sorted collects compare cheap
    // at fixture scale)
    val oldSet = oldSpans(docs).collect().map(_.toSeq).toSet
    val newSet = newSpans(docs).collect().map(_.toSeq).toSet
    require(oldSet == newSet,
      s"span sets diverge: old=${oldSet.size} new=${newSet.size} " +
        s"onlyOld=${(oldSet -- newSet).take(3)} onlyNew=${(newSet -- oldSet).take(3)}")
    println(s"[span-ab] span sets identical (${oldSet.size} spans)")

    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to iters).foreach { i =>
      gcSettle(); olds += time(oldSpans(docs).count())
      gcSettle(); news += time(newSpans(docs).count())
      println(f"[span-ab] iter $i old=${olds.last}%.3f new=${news.last}%.3f " +
        f"ratio=${news.last / olds.last}%.2f")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[span-ab] MEDIAN old=${med(olds.toSeq)}%.3f new=${med(news.toSeq)}%.3f " +
      f"ratio=${med(news.toSeq) / med(olds.toSeq)}%.2f over $iters interleaved iters")
    spark.stop()
  }
}
