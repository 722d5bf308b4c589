package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — `points.pt ∈ [intervals.lo, intervals.hi]`,
  * optionally under extra equi-keys. With no equi-key Spark can only plan a
  * nested-loop/cartesian for the raw predicate — O(|points|·|intervals|),
  * the classic scale-killer of interval joins.
  *
  * Lowering: BIN the shared axis. Each point maps to one bin; each interval
  * explodes to the bins it covers; the join becomes a plain equi-join on
  * (keys…, bin) — distributable, AQE-skew-handled, broadcastable — and the
  * exact BETWEEN predicate filters the residue after. Candidate volume is
  * |true matches| + boundary slack (intervals ≪ binWidth apart share bins),
  * not the cross product.
  *
  * `binWidth` is in axis units on the TimeAxis.seconds scale (epoch
  * SECONDS for timestamp/timestamp_ntz, identity for numerics) — pick it
  * near the typical interval length: too small explodes interval
  * replication, too large widens the residual filter. Bounds are INCLUSIVE
  * on both ends (SQL BETWEEN).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireNoBin(points, intervals)
    val clash = intervals.columns.diff(on).intersect(points.columns.diff(on))
    require(clash.isEmpty,
      s"interval columns clash with point columns: ${clash.mkString(", ")} — alias them first")
    def bin(df: DataFrame, c: String) =
      floor(TimeAxis.seconds(df, c) / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(points, ptCol))
    val i = intervals.withColumn("__bin",
      explode(sequence(bin(intervals, loCol), bin(intervals, hiCol))))
    p.join(i, on :+ "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join — `[aLo,aHi] ∩ [bLo,bHi] ≠ ∅` (inclusive
    * bounds), the interval×interval generalization of [[pointInInterval]].
    * Same binning, one extra subtlety: an overlapping pair shares EVERY
    * bin their overlap spans, so a naive bin join emits duplicates. Rather
    * than paying a distinct shuffle, each pair is emitted only at its
    * canonical bin — the bin of `max(aLo, bLo)` (the overlap start), which
    * both sides necessarily cover. Output is duplicate-free by
    * construction. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      binWidth: Double, on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireNoBin(a, b)
    val clash = a.columns.diff(on).intersect(b.columns.diff(on))
    require(clash.isEmpty,
      s"left/right columns clash: ${clash.mkString(", ")} — alias them first")
    def bin(df: DataFrame, c: String) =
      floor(TimeAxis.seconds(df, c) / binWidth).cast("long")
    // WELL-FORMED intervals only (lo <= hi): an inverted interval is
    // empty and overlaps nothing, but the symmetric aLo<=bHi && bLo<=aHi
    // test is only a valid overlap predicate for well-formed inputs —
    // [10,0] against [0,10] passed it (and its DESCENDING bin sequence
    // still covered the canonical bin), emitting a pair whose
    // intersection is empty per the doc contract
    val aw = a.filter(col(aLo) <= col(aHi))
    val bw = b.filter(col(bLo) <= col(bHi))
    val ax = aw.withColumn("__bin", explode(sequence(bin(aw, aLo), bin(aw, aHi))))
    val bx = bw.withColumn("__bin", explode(sequence(bin(bw, bLo), bin(bw, bHi))))
    // canonical bin of the overlap start — greatest() is computed on the
    // joined frame, so lower each side's type individually
    val aLoSec = TimeAxis.seconds(a.schema(aLo).dataType, col(aLo))
    val bLoSec = TimeAxis.seconds(b.schema(bLo).dataType, col(bLo))
    ax.join(bx, on :+ "__bin")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin") === floor(
          greatest(aLoSec, bLoSec) / binWidth).cast("long"))
      .drop("__bin")
  }

  /** `__bin` is this module's reserved name — withColumn would silently
    * OVERWRITE a caller column of that name, key the join on the synthetic
    * value, and drop() would erase it from the output (AsOfJoin's
    * reserved-name rule applied here). */
  private def requireNoBin(dfs: DataFrame*): Unit =
    dfs.foreach(df => require(!df.columns.contains("__bin"),
      "range join: an input already carries a '__bin' column — rename it " +
        "first (reserved by the binning lowering)"))
}
