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
  def modules: Seq[Seq[QueryDef]] = Seq(
    Relational.entries,
    GraphQueries.entries,
    Wrangling.entries,
    TrainingPrep.entries,
    Streaming.entries,
    DslQueries.entries,
    Extended.entries,
    Misc.entries)

  lazy val entries: Seq[QueryDef] = modules.flatten

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    entries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
