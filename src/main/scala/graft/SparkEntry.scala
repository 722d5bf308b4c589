package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.* modules; this object is the stable
  * facade the driver's Verify/Bench harness calls into.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("agg_group_by_sum_mean")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator family from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** DuckDB-runnable ANSI SQL equivalent for each query (same column names,
    * same total order, same rounding). */
  def oracleSql: Map[String, String] = Registry.oracles
}
