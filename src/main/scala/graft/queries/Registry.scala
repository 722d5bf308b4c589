package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan over the testdata tables plus (when
  * SQL-expressible) an equivalent ANSI SQL string the driver runs in DuckDB.
  *
  * Determinism contract (required for the driver's hash compare):
  *  - every output column is aliased identically in Spark and SQL;
  *  - a total ORDER BY on both sides (ties broken by a unique key);
  *  - floating aggregates rounded on both sides so accumulation-order
  *    differences between engines cannot flip a bit.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** SURVEY.md §2 operators this query demonstrates. */
    ops: Seq[String])

object Registry {
  /** Family label lives WITH its module: consumers (DocsGraph) must not
    * couple to positions in a parallel list that silently drops or
    * mislabels entries when a module is added or reordered. */
  def namedModules: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> Relational.entries,
    "graph" -> GraphQueries.entries,
    "wrangling" -> Wrangling.entries,
    "training_prep" -> TrainingPrep.entries,
    "streaming" -> Streaming.entries,
    "dsl" -> DslQueries.entries,
    "extended" -> Extended.entries,
    "misc" -> Misc.entries)

  def modules: Seq[Seq[QueryDef]] = namedModules.map(_._2)

  lazy val entries: Seq[QueryDef] = {
    val all = modules.flatten
    // a repeated name would SILENTLY shadow one query in the Verify maps
    // (last wins) while Bench ran both — the shadowed query would count as
    // verified without ever being oracle-checked
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"Registry: duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** Collision-free /tmp staging key for an sfDir: the sanitized path
    * itself — the previous 32-bit `hashCode` key could collide two
    * different dirs and silently reuse the wrong scale factor's staged
    * source files across JVMs. */
  private[graft] def dirKey(d: String): String =
    d.replaceAll("[^A-Za-z0-9._-]", "_")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    entries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
