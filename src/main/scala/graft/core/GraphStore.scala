package graft.core

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable graph storage — the physical layout claimed in SURVEY §1.2:
  * `atoms` written partitioned by (kind, atype) so `all[ET.X]` scans prune
  * to one directory subtree (the columnar analogue of zef's per-type
  * instance lists), `values`/`txs`/`tags` as plain parquet. On a real
  * cluster the writes would additionally be bucketed by atom_id/ae_id
  * (bucketing needs a table catalog, which local parquet dirs don't have —
  * noted, not silently skipped).
  */
object GraphStore {

  def save(g: Graph, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    g.atoms.write.mode(mode)
      .partitionBy("kind", "atype")
      .parquet(s"$path/atoms")
    g.values.write.mode(mode).parquet(s"$path/values")
    g.txs.write.mode(mode).parquet(s"$path/txs")
    if (!g.tags.isEmpty)
      g.tags.write.mode(mode).parquet(s"$path/tags")
  }

  def load(spark: SparkSession, path: String): Graph = {
    // partition columns come back at the end; restore canonical order
    val atomCols = Seq("atom_id", "kind", "atype", "src_id", "dst_id",
      "inst_slice", "term_slice", "origin_uid")
    val atoms = spark.read.parquet(s"$path/atoms")
      .select(atomCols.map(col): _*)
    val values = spark.read.parquet(s"$path/values")
    val txs = spark.read.parquet(s"$path/txs")
    val tagsPath = new java.io.File(s"$path/tags")
    val tags =
      if (tagsPath.exists()) spark.read.parquet(s"$path/tags")
      else Graph.empty(spark).tags
    Graph(atoms, values, txs, tags)
  }

  /** Durable incremental append: one transaction's delta lands as appended
    * files — new atoms/values/tx/tags rows plus termination CLOSURE rows
    * `(atom_id, term_slice)` in a side table. `load` reconciles closures
    * into the denormalized interval column (left join + coalesce), so the
    * on-disk format stays append-only (no partition rewrites); a real
    * table format would compact closures into the atoms partitions as a
    * background MERGE. Cascade semantics match Transactor: relations of a
    * closed atom close with it. */
  def appendTx(spark: SparkSession, path: String, r: Receipt): Unit = {
    import spark.implicits._
    if (r.newAtoms.nonEmpty)
      spark.createDataset(r.newAtoms).toDF()
        .write.mode(SaveMode.Append).partitionBy("kind", "atype")
        .parquet(s"$path/atoms")
    if (r.newValues.nonEmpty)
      spark.createDataset(r.newValues).toDF()
        .write.mode(SaveMode.Append).parquet(s"$path/values")
    if (r.newTags.nonEmpty)
      spark.createDataset(r.newTags).toDF()
        .write.mode(SaveMode.Append).parquet(s"$path/tags")
    if (r.terminatedIds.nonEmpty)
      r.terminatedIds.map(id => (id, r.slice)).toDF("atom_id", "term_slice")
        .write.mode(SaveMode.Append).parquet(s"$path/closures")
    spark.createDataset(Seq(TxRow(r.slice, r.ts))).toDF()
      .write.mode(SaveMode.Append).parquet(s"$path/txs")
  }

  /** Save plus a [[FieldIndex]] over the given field relation types —
    * typically `schema.searchRts` from a parsed SimpleGQL schema, honoring
    * its declared `@search` directives. */
  def saveWithIndex(g: Graph, path: String, indexRts: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    save(g, path, mode)
    if (indexRts.nonEmpty)
      FieldIndex.save(FieldIndex.build(g, indexRts), s"$path/index")
  }

  def loadIndex(spark: SparkSession, path: String): Option[
      org.apache.spark.sql.DataFrame] = {
    val p = new java.io.File(s"$path/index")
    if (p.exists()) Some(FieldIndex.load(spark, s"$path/index")) else None
  }

  /** [[appendTx]] plus index maintenance for the given rts (pure append —
    * see FieldIndex's staleness note). */
  def appendTxIndexed(spark: SparkSession, path: String, r: Receipt,
      indexRts: Seq[String]): Unit = {
    // index delta first: it reads the STORED atoms for existing-AE owners
    // and the receipt for this-tx relations — appending atoms first would
    // double-count the new relations
    if (indexRts.nonEmpty)
      FieldIndex.appendTx(spark, path, s"$path/index", r, indexRts)
    appendTx(spark, path, r)
  }

  /** Load with closure reconciliation (see [[appendTx]]). */
  def loadWithClosures(spark: SparkSession, path: String): Graph = {
    val g = load(spark, path)
    val closuresPath = new java.io.File(s"$path/closures")
    if (!closuresPath.exists()) g
    else {
      val closures = spark.read.parquet(s"$path/closures")
        .select(col("atom_id"), col("term_slice").as("__c"))
      // cascade: a relation closes when either endpoint closes
      val rels = g.atoms.filter(col("kind") === Kind.Relation)
        .select(col("atom_id"), col("src_id"), col("dst_id"))
      val cascade = rels
        .join(closures.withColumnRenamed("atom_id", "src_id"), Seq("src_id"))
        .select(col("atom_id"), col("__c"))
        .unionByName(rels
          .join(closures.withColumnRenamed("atom_id", "dst_id"), Seq("dst_id"))
          .select(col("atom_id"), col("__c")))
      val allClosures = closures.select(col("atom_id"), col("__c"))
        .unionByName(cascade)
      // per INTERVAL ROW (atom_id, inst_slice): earliest closure at-or-after
      // the interval opened — re-instantiated rows only close on closures
      // issued after their own open slice
      val perRow = g.atoms.select(col("atom_id"), col("inst_slice"))
        .join(allClosures, Seq("atom_id"))
        .filter(col("__c") >= col("inst_slice"))
        .groupBy("atom_id", "inst_slice").agg(min("__c").as("__t"))
      val atoms = g.atoms.join(perRow, Seq("atom_id", "inst_slice"), "left")
        .withColumn("term_slice",
          when(col("term_slice").isNull, col("__t")).otherwise(col("term_slice")))
        .drop("__t")
      g.copy(atoms = atoms)
    }
  }
}
