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

  lazy val entries: Seq[QueryDef] = modules.flatten

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    entries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
