package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ZOps._
import graft.ops.{VT, ZCol}

/** Queries exercising the ZefOps DSL layer (graft.ops.*) end-to-end with
  * DuckDB oracles — ordering-dependent list ops over explicit total orders.
  */
object DslQueries {

  private val evOrder = Seq(col("ts"), col("event_id"))

  val entries: Seq[QueryDef] = Seq(

    // zef take_while[pred] (impl.py:3768): longest prefix with value < 480.
    QueryDef(
      "dsl_take_while",
      (s, d) => Tables.events(s, d)
        .takeWhile(col("value") < 480.0, evOrder)
        .select(col("event_id"), col("value"))
        .orderBy(col("event_id")),
      Some("""WITH ranked AS (
             |  SELECT event_id, value, row_number() OVER (ORDER BY ts, event_id) AS rn
             |  FROM events),
             |cut AS (SELECT coalesce(min(rn), 9223372036854775807) AS c
             |        FROM ranked WHERE NOT (value < 480.0))
             |SELECT event_id, value FROM ranked, cut WHERE rn < c
             |ORDER BY event_id""".stripMargin),
      Seq("take_while", "skip_while", "enumerate")),

    // zef distinct_by (order-preserving dedupe, impl.py:4420): first event
    // per user in time order.
    QueryDef(
      "dsl_distinct_by_first",
      (s, d) => Tables.events(s, d)
        .distinctBy(Seq(col("user_id")), evOrder)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin),
      Seq("distinct_by", "first", "min_by")),

    // zef stride[n] (impl.py:1267): every 100th event globally.
    QueryDef(
      "dsl_stride",
      (s, d) => Tables.events(s, d)
        .stride(100, evOrder)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type FROM (
             |  SELECT event_id, event_type,
             |    row_number() OVER (ORDER BY ts, event_id) - 1 AS i
             |  FROM events) WHERE i % 100 = 0 ORDER BY event_id""".stripMargin),
      Seq("stride", "chunk", "nth")),

    // zef group[f] consecutive runs (impl.py:5890): runs of equal
    // event_type in global time order, summarized. Uses the run-LEVEL op:
    // runs collapse map-side per partition (never a shuffle with one group
    // per run), only the ≤2 boundary runs per partition reconcile across
    // partitions — the scale shape for run-length analytics.
    QueryDef(
      "dsl_group_consecutive",
      (s, d) => Tables.events(s, d)
        .select(col("ts"), col("event_id"), col("event_type"))
        .consecutiveRuns(col("event_type"), evOrder,
          keyOut = "event_type", lenOut = "run_len")
        .groupBy(col("event_type"), col("run_len"))
        .agg(count(lit(1)).as("n_runs"))
        .orderBy(col("event_type"), col("run_len")),
      Some("""WITH o AS (
             |  SELECT event_type,
             |    CASE WHEN lag(event_type) OVER (ORDER BY ts, event_id) IS DISTINCT FROM event_type
             |         THEN 1 ELSE 0 END AS chg
             |  FROM events),
             |runs AS (
             |  SELECT event_type, sum(chg) OVER (ROWS UNBOUNDED PRECEDING) AS run_id
             |  FROM o),
             |sizes AS (SELECT event_type, run_id, count(*) AS run_len
             |          FROM runs GROUP BY 1, 2)
             |SELECT event_type, run_len, count(*) AS n_runs
             |FROM sizes GROUP BY 1, 2 ORDER BY event_type, run_len""".stripMargin),
      Seq("group", "chunk_by", "split_on_next", "scan")),

    // ZCol string/case/alpha ops over customer names.
    QueryDef(
      "dsl_zcol_strings",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_custkey") <= 30)
        .select(col("c_custkey"),
          ZCol.toSnakeCase(col("c_mktsegment")).as("seg_snake"),
          ZCol.toKebabCase(col("c_name")).as("name_kebab"),
          ZCol.padCenter(col("c_mktsegment"), 14, "*").as("seg_centered"),
          ZCol.intToAlpha((col("c_custkey") + 1).cast("long")).as("key_alpha"),
          ZCol.isAlphaNumeric(regexp_replace(col("c_name"), "#|-", "")).as("alnum"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |  lower(c_mktsegment) AS seg_snake,
             |  lower(regexp_replace(c_name, '#', '-', 'g')) AS name_kebab,
             |  CASE WHEN length(c_mktsegment) >= 14 THEN c_mktsegment
             |       ELSE repeat('*', CAST(floor((14 - length(c_mktsegment)) / 2) AS INT))
             |            || c_mktsegment ||
             |            repeat('*', 14 - length(c_mktsegment)
             |              - CAST(floor((14 - length(c_mktsegment)) / 2) AS INT))
             |  END AS seg_centered,
             |  CASE WHEN c_custkey + 1 > 26 THEN
             |    chr(96 + CAST(c_custkey // 26 AS INT)) ||
             |    chr(97 + CAST(c_custkey % 26 AS INT))
             |  ELSE chr(97 + CAST(c_custkey AS INT)) END AS key_alpha,
             |  regexp_matches(regexp_replace(c_name, '#|-', '', 'g'), '^[A-Za-z0-9]+$') AS alnum
             |FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey""".stripMargin),
      Seq("to_snake_case", "to_kebab_case", "pad_center", "int_to_alpha",
        "is_alpha_numeric"))
  )
}
