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

  /** THE typed value-column list — the one declaration (Graph's as-of
    * resolution, fields(), yo, Transact's caches and FieldIndex all read
    * this; a hand-maintained copy that missed a new typed column would
    * silently drop that type from as-of resolution). */
  val vcols = Seq("v_str", "v_long", "v_double", "v_bool", "v_ts")

  /** Store-root marker naming the indexed rts — the auto-maintenance
    * contract: while it exists, [[GraphStore.appendTx]] AND
    * [[GraphStore.appendBulk]] keep the index current (the same
    * existence-is-the-protocol pattern as the atoms_log live-feed
    * marker). Without it, only the receipt path maintained the index:
    * a bulk ingest tick against an indexed store silently skipped index
    * rows, and MISSING entries are false negatives the probe's as-of
    * re-check cannot repair (stale/collision entries only ever ADD
    * candidates — absence is the one unrecoverable class). Lives at the
    * store ROOT, not inside index/: purgeSlice swaps the index tree
    * wholesale and saveWithIndex rebuilds it, and the marker must
    * survive both. */
  val RtsMarker = "_index_rts"

  def saveRts(storePath: String, rts: Seq[String]): Unit =
    Fs.writeString(s"$storePath/$RtsMarker", rts.mkString("\n"))

  def loadRts(storePath: String): Option[Seq[String]] = {
    val p = s"$storePath/$RtsMarker"
    if (Fs.exists(p))
      Some(Fs.readString(p)
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
    else None
  }

  /** Canonical 64-bit value hash: one expression over the typed value
    * columns, used identically at build time (over columns) and probe time
    * (over a typed literal) — same expression, same result, so a probe can
    * never miss its bucket. Doubles normalize −0.0 to 0.0 before
    * rendering: the probe's `===` re-check treats them equal (Spark
    * normalizes signed zero in comparisons), so a stored −0.0 probed
    * with 0.0 must land in the same bucket — string-rendering the raw
    * value ("-0.0" vs "0.0") silently returned fewer rows than
    * selectByField. (NaN needs no care: one canonical "NaN" rendering.)
    * Indexes persisted before this normalization re-bucket −0.0 on the
    * next save/rebuild. */
  def vhashExpr(vstr: Column, vlong: Column, vdouble: Column, vbool: Column,
      vts: Column): Column =
    xxhash64(
      coalesce(
        when(vstr.isNotNull, concat(lit("s:"), vstr)),
        when(vlong.isNotNull, concat(lit("l:"), vlong.cast("string"))),
        when(vdouble.isNotNull, concat(lit("d:"),
          when(vdouble === lit(0.0), lit(0.0)).otherwise(vdouble)
            .cast("string"))),
        when(vbool.isNotNull, concat(lit("b:"), vbool.cast("string"))),
        when(vts.isNotNull, concat(lit("t:"), vts.cast("long").cast("string"))),
        lit("")))

  private def vhashOfCols: Column = vhashExpr(col("v_str"), col("v_long"),
    col("v_double"), col("v_bool"), col("v_ts"))

  // (the former runtime-type-dispatch vhashOf(value) overload is GONE:
  // it embodied exactly the bucket-miss its sibling's doc below warns
  // about — an Int probe against a v_double field hashed "l:9", not
  // "d:9.0" — and had no callers; probes go through the column-typed
  // overload only)

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
    // distinct: a terminated-and-re-instantiated field relation carries
    // one atoms row per validity interval, identical under this
    // projection — without it every assignment indexes once per interval
    // (bloat + double-width candidate sets; appendTx dedups identically)
    val rels = g.atoms.filter(
      col("kind") === Kind.Relation && col("atype").isInCollection(rts))
      .select(col("atype").as("rt"), col("src_id").as("owner_id"),
        col("dst_id").as("ae_id"))
      .distinct()
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

  /** The STORE's field relations for the given rts — read with the
    * explicit AtomRow schema, like GraphStore.load: a freshly published
    * EMPTY indexed store has an atoms directory with no data files yet,
    * which schema inference rejects (the first indexed append used to
    * crash there) while a schema'd read returns a clean empty frame. */
  private def storedFieldRels(spark: SparkSession, storePath: String,
      rts: Seq[String]): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.Encoders.product[AtomRow].schema)
      .parquet(s"$storePath/atoms")
      .filter(col("kind") === Kind.Relation && col("atype").isInCollection(rts))
      .select(col("atype").as("rt"), col("src_id").as("owner_id"),
        col("dst_id").as("ae_id"))

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
    val stored = storedFieldRels(spark, storePath, rts)
    // materialize once: the emptiness guard would otherwise run the full
    // store-atoms scan + join a second time for the write it guards
    val delta = newVals.join(fromTx.unionByName(stored).distinct(), "ae_id")
      .select(col("rt"), vhashOfCols.as("vhash"), col("ae_id"),
        col("owner_id"), col("tx_slice"))
      .localCheckpoint(true)
    if (!delta.isEmpty) writeDelta(delta, indexPath)
  }

  /** Append an index delta sorted by vhash within files — save()'s
    * row-group min/max pruning is the index's whole mechanism, and an
    * unsorted appended file quietly degrades every probe over it to a
    * full-file scan. */
  private def writeDelta(delta: DataFrame, indexPath: String): Unit =
    delta.sortWithinPartitions(col("vhash"))
      .write.mode(SaveMode.Append).partitionBy("rt").parquet(indexPath)

  /** Bulk-delta analogue of [[appendTx]]: index rows for a distributed
    * delta's values, owners resolved from the delta's own new field
    * relations plus the stored atoms. Returns the EAGERLY MATERIALIZED
    * delta (or None when empty) — it reads the PRE-append store, so the
    * caller must obtain it BEFORE appending the delta's atoms, then
    * write it via [[writeBulkDelta]] (concurrently with its other
    * writes, before the tx marker). */
  def bulkDelta(spark: SparkSession, storePath: String,
      atoms: DataFrame, values: DataFrame, rts: Seq[String]): Option[DataFrame] = {
    val fromTx = atoms
      .filter(col("kind") === Kind.Relation && col("atype").isInCollection(rts))
      .select(col("atype").as("rt"), col("src_id").as("owner_id"),
        col("dst_id").as("ae_id"))
    val stored = storedFieldRels(spark, storePath, rts)
    val delta = values.join(fromTx.unionByName(stored).distinct(), "ae_id")
      .select(col("rt"), vhashOfCols.as("vhash"), col("ae_id"),
        col("owner_id"), col("tx_slice"))
      .localCheckpoint(true)
    if (delta.isEmpty) None else Some(delta)
  }

  def writeBulkDelta(delta: DataFrame, indexPath: String): Unit =
    writeDelta(delta, indexPath)
}
