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
  * `binWidth` is in axis units after cast to double (epoch SECONDS for
  * timestamps, identity for numerics) — pick it near the typical interval
  * length: too small explodes interval replication, too large widens the
  * residual filter. Bounds are INCLUSIVE on both ends (SQL BETWEEN).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = intervals.columns.diff(on).intersect(points.columns.diff(on))
    require(clash.isEmpty,
      s"interval columns clash with point columns: ${clash.mkString(", ")} — alias them first")
    def bin(c: String) = floor(col(c).cast("double") / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(ptCol))
    val i = intervals.withColumn("__bin",
      explode(sequence(bin(loCol), bin(hiCol))))
    p.join(i, on :+ "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
