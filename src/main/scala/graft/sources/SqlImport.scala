package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Graph, GraphEncoder, TxRow, ValueRow}

/** SQL → graph import — the reference's `experimental/sql_import.py:41-373`
  * (declarative mapping of relational tables onto entities/fields/
  * relations), restated on `spark.read.jdbc` + [[GraphEncoder]]:
  * tables become entity types, scalar columns become field AEs, foreign-key
  * column pairs become entity-entity relations. The mapping is data (a
  * case-class spec, the analogue of the reference's mapping file), the
  * encoding is the same bulk path every other source uses — map-only per
  * table, deterministic ids, no driver iteration.
  *
  * Scale: each table read can be range-partitioned over a numeric column
  * (`JdbcPartition`) so a large source table arrives as N parallel JDBC
  * cursors instead of one; everything downstream is the ordinary
  * distributed encode.
  */
object SqlImport {

  /** Parallel-read spec for one table: `column` must be numeric;
    * [lower, upper] bounds the stride split across `num` partitions. */
  final case class JdbcPartition(column: String, lower: Long, upper: Long,
      num: Int)

  /** One table → one entity type: `keyCol` builds the deterministic atom
    * id, `fieldCols` become field AEs (typed from the JDBC schema). */
  final case class EntityMap(table: String, et: String, keyCol: String,
      fieldCols: Seq[String], partition: Option[JdbcPartition] = None)

  /** One FK pair → one relation type (held on the table that carries the
    * FK — `srcKeyCol` identifies the owning entity, `dstKeyCol` the
    * referenced one). */
  final case class RelationMap(table: String, rt: String,
      srcEt: String, srcKeyCol: String, dstEt: String, dstKeyCol: String)

  final case class Mapping(entities: Seq[EntityMap],
      relations: Seq[RelationMap] = Nil)

  def readTable(spark: SparkSession, url: String, table: String,
      props: Properties,
      partition: Option[JdbcPartition] = None): DataFrame = partition match {
    case Some(p) =>
      spark.read.jdbc(url, table, p.column, p.lower, p.upper, p.num, props)
    case None => spark.read.jdbc(url, table, props)
  }

  /** Import the mapped tables as a slice-1 bulk-load graph. Each source
    * table is read once even when it appears in several mapping entries. */
  def importGraph(spark: SparkSession, url: String, mapping: Mapping,
      props: Properties = new Properties,
      instSlice: Int = 1,
      ts: java.sql.Timestamp = java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      : Graph = {
    import spark.implicits._
    val parts = mapping.entities.flatMap(e => e.partition.map(e.table -> _)).toMap
    val tables = (mapping.entities.map(_.table) ++ mapping.relations.map(_.table))
      .distinct.map(t => t -> readTable(spark, url, t, props, parts.get(t)))
      .toMap
    val encoded = mapping.entities.map { e =>
      // the single-assignment provenance stamped below REQUIRES key
      // uniqueness; a non-unique source key would silently duplicate
      // latestValues rows on the fast path, so verify it loudly here
      // (one count-distinct agg per entity table, import-time only)
      import org.apache.spark.sql.functions.{col, count, count_distinct, lit}
      val t = tables(e.table)
      val c = t.agg(count(lit(1)), count_distinct(col(e.keyCol))).collect()(0)
      require(c.getLong(0) == c.getLong(1),
        s"SqlImport: ${e.table}.${e.keyCol} is not unique " +
          s"(${c.getLong(0)} rows, ${c.getLong(1)} distinct keys) — " +
          "entity keys must be primary-key-like")
      GraphEncoder.encodeEntities(t, e.et, e.keyCol, e.fieldCols, instSlice)
    }
    val rels = mapping.relations.map { r =>
      // relations get the same loud validation entities get: a NULL FK
      // (concat() nulls the whole id — atoms with null atom_id/src/dst
      // flowed straight into the graph) and a duplicated (src, dst) pair
      // (two atoms under ONE scheme id) were both silent
      import org.apache.spark.sql.functions.{col, count, count_distinct, lit}
      val t = tables(r.table)
      val nulls = t.filter(col(r.srcKeyCol).isNull || col(r.dstKeyCol).isNull)
        .limit(1).count()
      require(nulls == 0,
        s"SqlImport: ${r.table} carries NULL ${r.srcKeyCol}/${r.dstKeyCol} " +
          "values — filter orphan FK rows before importing")
      val rc = t.agg(count(lit(1)),
        count_distinct(col(r.srcKeyCol), col(r.dstKeyCol))).collect()(0)
      require(rc.getLong(0) == rc.getLong(1),
        s"SqlImport: ${r.table} repeats (${r.srcKeyCol}, ${r.dstKeyCol}) " +
          s"pairs (${rc.getLong(0)} rows, ${rc.getLong(1)} distinct) — " +
          "each pair becomes ONE relation atom id; dedupe the link table")
      GraphEncoder.encodeRelations(tables(r.table), r.rt,
        r.srcEt, r.srcKeyCol, r.dstEt, r.dstKeyCol, instSlice)
    }
    require(mapping.entities.nonEmpty || mapping.relations.nonEmpty,
      "SqlImport: mapping has no entities and no relations")
    val atoms = (encoded.map(_._1) ++ rels).reduce(_ unionByName _)
    // relations-only mappings carry no values (reduce over Nil would throw
    // empty.reduce) — an empty ValueRow-schema frame keeps the Graph valid
    val values = encoded.map(_._2).reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[ValueRow].toDF())
    // the per-table key check above cannot see ACROSS entries: two
    // EntityMaps onto the same entity type with overlapping keys would
    // pass both checks yet duplicate every atom and value row — and the
    // single-assignment stamp below would then make latestValues' filter-
    // only fast path return both rows. One distinct count over the union
    // closes that loudly (import-time only).
    if (encoded.nonEmpty) {
      // runs for ONE entry too: a single EntityMap with a duplicated
      // fieldCol emits two identical value rows per entity — the
      // per-table key check passes, and skipping this for size==1 let
      // the single-assignment stamp put latestValues' filter-only fast
      // path on a graph with duplicate rows (the exact silent corruption
      // this check exists to prevent)
      import org.apache.spark.sql.functions.{col, count, count_distinct, lit}
      val vc = values.agg(count(lit(1)), count_distinct(col("ae_id"))).collect()(0)
      require(vc.getLong(0) == vc.getLong(1),
        s"SqlImport: ${vc.getLong(0) - vc.getLong(1)} colliding ae_ids — " +
          "either two entries map the same entity type with overlapping " +
          "keys, or one entry repeats a fieldCol")
    }
    // one value row per AE at one slice via the encoder's scheme ids —
    // as-of reads take Graph.latestValues' single-assignment fast path
    Graph(atoms, values, Seq(TxRow(instSlice, ts)).toDF())
      .copy(uniqueValuesThrough = instSlice)
  }
}
