package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the classic mitigation for hash-partition skew when a
  * handful of hot keys would pin whole executors: the skewed side spreads
  * each key's rows across `salt` sub-partitions; the other side replicates
  * each row `salt` times so every sub-partition still sees its full match
  * set. Join output is IDENTICAL to the plain join; only the partitioning
  * changes (hot key cost drops ~salt×, replicated side grows salt×).
  *
  * When to reach for it: AQE's skew-join handling (on in GraftSession)
  * already splits skewed SORT-MERGE partitions at runtime — prefer that.
  * Salting remains the tool where AQE can't act: streaming joins, bucketed
  * scans pinned to their bucket count, aggregation pipelines where the
  * skew is in a groupBy fed by the join, or engines/configs without AQE.
  *
  * The salt assignment is `pmod(hash(entire skewed row), salt)` —
  * deterministic (safe under task retry/speculation, unlike rand()), and
  * rows of the SAME hot key still spread because their non-key columns
  * differ.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, other: DataFrame, on: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(!Seq("right", "rightouter", "right_outer", "full", "fullouter",
        "full_outer").contains(joinType.toLowerCase),
      "salted join preserves left/inner semantics; for right/full outer, " +
        "swap the sides or dedupe the replicated side's unmatched rows")
    // hash only the hashable columns: Spark's hash() rejects MapType
    // anywhere in the input (a plain join handles such frames fine, so
    // the salted variant must too). Rows identical across every hashable
    // column land in one salt bucket — determinism over perfect spread.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = skewed.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(hashCols.nonEmpty,
      "salted join: no hashable columns to derive a deterministic salt")
    val s = skewed.withColumn("__salt",
      pmod(hash(hashCols.toSeq: _*), lit(salt)))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    s.join(o, on :+ "__salt", joinType).drop("__salt")
  }
}
