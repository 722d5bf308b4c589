package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable value-hash field index — the Spark restatement of the
  * reference's value-hash lookup index (`core/include/graph.h:223-226`,
  * the machinery behind `select_by_field`, impl.py:6143) and of SimpleGQL's
  * declared `@search` intent (`test_simplegql.py:50-60`): fields the schema
  * marks searchable get an index table so point lookups probe an
  * rt-partitioned, hash-sorted parquet scan instead of aggregating value
  * history.
  *
  * Layout: one row per (field relation, assignment) —
  * `(rt, vhash, ae_id, owner_id, tx_slice)` — written partitioned by `rt`
  * (directory pruning) and sorted by `vhash` within files (parquet
  * row-group min/max skips everything but the probed bucket). The index is
  * append-only, exactly like the store's values table: stale entries (an AE
  * whose value later changed) survive as candidates and are eliminated by
  * the probe's as-of verification, so maintenance is a pure append of the
  * transaction delta — no rewrites, no tombstones.
  *
  * Hash collisions and staleness both only ever ADD candidates; the probe
  * re-checks the current typed value exactly, so correctness never depends
  * on the index — only the amount of pruning does.
  */
object FieldIndex {

  val vcols = Seq("v_str", "v_long", "v_double", "v_bool", "v_ts")

  /** Canonical 64-bit value hash: one expression over the typed value
    * columns, used identically at build time (over columns) and probe time
    * (over a typed literal) — same expression, same result, so a probe can
    * never miss its bucket. */
  def vhashExpr(vstr: Column, vlong: Column, vdouble: Column, vbool: Column,
      vts: Column): Column =
    xxhash64(
      coalesce(
        when(vstr.isNotNull, concat(lit("s:"), vstr)),
        when(vlong.isNotNull, concat(lit("l:"), vlong.cast("string"))),
        when(vdouble.isNotNull, concat(lit("d:"), vdouble.cast("string"))),
        when(vbool.isNotNull, concat(lit("b:"), vbool.cast("string"))),
        when(vts.isNotNull, concat(lit("t:"), vts.cast("long").cast("string"))),
        lit("")))

  private def vhashOfCols: Column = vhashExpr(col("v_str"), col("v_long"),
    col("v_double"), col("v_bool"), col("v_ts"))

  /** Probe-side hash of a runtime value (mirrors ValueRow.of's type
    * dispatch; constant-folded by Catalyst into a pushable literal). */
  def vhashOf(value: Any): Column = {
    val vcol = value match {
      case _: String => "v_str"
      case _: Int | _: Long => "v_long"
      case _: Double => "v_double"
      case _: Boolean => "v_bool"
      case _: java.sql.Timestamp => "v_ts"
      case other => throw new IllegalArgumentException(
        s"unsupported index probe type: ${other.getClass}")
    }
    vhashOf(vcol, value)
  }

  /** Probe hash keyed by the PROBED COLUMN's type, not the probe value's
    * runtime type: the build hashed what the column stores, so an Int
    * probe against a v_double field must hash "d:1.0", not "l:1" — the
    * runtime-type dispatch silently missed the bucket for every
    * numerically-coercible probe (empty result where selectByField
    * matches), before the widening re-check could help. The cast mirrors
    * the `===` coercion of the re-check exactly. */
  def vhashOf(vcol: String, value: Any): Column = {
    val nul = lit(null)
    val v = lit(value)
    vcol match {
      case "v_str" =>
        // a NUMERIC probe against a string field cannot be hashed
        // faithfully: the === re-check promotes the string COLUMN to the
        // numeric type (stored "9.0" satisfies === 9), while any literal
        // rendering hashed here ("s:9") would miss that bucket — the
        // indexed probe would silently return fewer rows than
        // selectByField. Loud reject; probe string fields with strings.
        require(value.isInstanceOf[String],
          s"string field probed with ${value.getClass.getSimpleName} " +
            s"'$value' — the numeric===string coercion cannot be " +
            "index-hashed; pass the probe value as a String")
        vhashExpr(v.cast("string"), nul, nul, nul, nul)
      case "v_long" => vhashExpr(nul, v.cast("long"), nul, nul, nul)
      case "v_double" => vhashExpr(nul, nul, v.cast("double"), nul, nul)
      case "v_bool" => vhashExpr(nul, nul, nul, v.cast("boolean"), nul)
      case "v_ts" => vhashExpr(nul, nul, nul, nul, v.cast("timestamp"))
      case other => throw new IllegalArgumentException(
        s"unknown value column: $other")
    }
  }

  /** Index rows for the given field relation types: relations scan (pruned
    * to the rts) joined to values — one shuffle at build, map-only probes
    * forever after. */
  def build(g: Graph, rts: Seq[String]): DataFrame = {
    val rels = g.atoms.filter(
      col("kind") === Kind.Relation && col("atype").isInCollection(rts))
      .select(col("atype").as("rt"), col("src_id").as("owner_id"),
        col("dst_id").as("ae_id"))
    g.values.join(rels, "ae_id")
      .select(col("rt"), vhashOfCols.as("vhash"), col("ae_id"),
        col("owner_id"), col("tx_slice"))
  }

  /** Write (or overwrite) the index at `path`: partitioned by rt, files
    * sorted by vhash for row-group skipping. */
  def save(index: DataFrame, path: String): Unit =
    index.repartition(col("rt")).sortWithinPartitions(col("vhash"))
      .write.mode(SaveMode.Overwrite).partitionBy("rt").parquet(path)

  /** Explicit schema, not inference: an index directory may exist with no
    * data files yet (healed from an empty staged dir, or created ahead of
    * the first indexed append) — inference rejects that, a schema'd read
    * returns a clean empty frame. Column order restored to canonical
    * (partition column `rt` otherwise comes back last). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("vhash BIGINT, ae_id STRING, owner_id STRING, tx_slice INT, rt STRING")
      .parquet(path)
      .select(col("rt"), col("vhash"), col("ae_id"), col("owner_id"),
        col("tx_slice"))

  /** Append one transaction's index delta: new assignments joined to their
    * owning field relation (from the receipt itself for fields created in
    * this tx, from the stored atoms for re-assignments to existing AEs). */
  def appendTx(spark: SparkSession, storePath: String, indexPath: String,
      r: Receipt, rts: Seq[String]): Unit = {
    import spark.implicits._
    if (r.newValues.isEmpty) return
    val newVals = spark.createDataset(r.newValues).toDF()
    val fromTx = spark.createDataset(r.newAtoms).toDF()
      .filter(col("kind") === Kind.Relation && col("atype").isInCollection(rts))
      .select(col("atype").as("rt"), col("src_id").as("owner_id"),
        col("dst_id").as("ae_id"))
    val stored = spark.read.parquet(s"$storePath/atoms")
      .filter(col("kind") === Kind.Relation && col("atype").isInCollection(rts))
      .select(col("atype").as("rt"), col("src_id").as("owner_id"),
        col("dst_id").as("ae_id"))
    // materialize once: the emptiness guard would otherwise run the full
    // store-atoms scan + join a second time for the write it guards
    val delta = newVals.join(fromTx.unionByName(stored).distinct(), "ae_id")
      .select(col("rt"), vhashOfCols.as("vhash"), col("ae_id"),
        col("owner_id"), col("tx_slice"))
      .localCheckpoint(true)
    if (!delta.isEmpty)
      delta.write.mode(SaveMode.Append).partitionBy("rt").parquet(indexPath)
  }
}
