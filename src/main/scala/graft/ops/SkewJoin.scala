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
    // "outer" included: Spark's JoinType normalizes it to FULL OUTER, so
    // the bare alias used to bypass this guard and emit every unmatched
    // replicated row `salt` times
    require(!Seq("right", "rightouter", "right_outer", "full", "fullouter",
        "full_outer", "outer").contains(joinType.toLowerCase),
      "salted join preserves left/inner semantics; for right/full outer, " +
        "swap the sides or dedupe the replicated side's unmatched rows")
    Seq(skewed -> "skewed", other -> "other").foreach { case (df, side) =>
      require(!df.columns.contains("__salt"),
        s"salted join: $side side already carries a '__salt' column — " +
          "withColumn would silently overwrite it and drop it from the " +
          "output; rename it first (AsOfJoin's reserved-name rule)")
    }
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
    val hashNames = skewed.schema.fields
      .filter(f => hashable(f.dataType)).map(f => f.name)
    val hashCols = hashNames.map(col(_))
    require(hashCols.nonEmpty,
      "salted join: no hashable columns to derive a deterministic salt")
    // the salt must VARY within a hot key or the whole exercise is a
    // silent no-op with salt-times replication cost: with only the join
    // keys hashable (payload all maps), pmod(hash(keys), salt) is one
    // constant per key — every hot row still lands in one sub-partition
    require(hashNames.exists(n => !on.contains(n)),
      "salted join: every hashable column is a join key, so the salt is " +
        "constant per key and cannot spread the hot rows — add an " +
        "orderable payload column or use a different mitigation")
    val s = skewed.withColumn("__salt",
      pmod(hash(hashCols.toSeq: _*), lit(salt)))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    s.join(o, on :+ "__salt", joinType).drop("__salt")
  }
}
