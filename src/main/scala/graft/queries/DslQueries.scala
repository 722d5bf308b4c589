package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ZOps._
import graft.ops.{VT, ZArr, ZCol}

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
      // the violation scan uses IS NOT TRUE, not NOT(pred): a NULL value
      // is a VIOLATION in ZOps.takeWhile's contract (the row does not
      // satisfy pred), and NOT(NULL)=NULL would silently encode the
      // OPPOSITE null semantics in the oracle that certifies the op
      Some("""WITH ranked AS (
             |  SELECT event_id, value, row_number() OVER (ORDER BY ts, event_id) AS rn
             |  FROM events),
             |cut AS (SELECT coalesce(min(rn), 9223372036854775807) AS c
             |        FROM ranked WHERE (value < 480.0) IS NOT TRUE)
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
      // the prefix-sum window carries its OWN ORDER BY: a frame with no
      // ordering has engine-unspecified row order (it passed only while
      // DuckDB happened to preserve the lag window's sort), so ts/event_id
      // ride through `o` to anchor it
      Some("""WITH o AS (
             |  SELECT ts, event_id, event_type,
             |    CASE WHEN lag(event_type) OVER (ORDER BY ts, event_id) IS DISTINCT FROM event_type
             |         THEN 1 ELSE 0 END AS chg
             |  FROM events),
             |runs AS (
             |  SELECT event_type,
             |    sum(chg) OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
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
        "is_alpha_numeric")),

    // zef combinations[n] (implementation_typing_functions.py:2561): all
    // 3-element subsequences of the 4-element (2 p_name words in THIS
    // testdata + type + brand) array per part — recursion depth 3, pure
    // HOF Column algebra, map-side only (the explode multiplies rows
    // C(4,3)=4× here BEFORE any shuffle — real 5-word TPC-H p_name would
    // make it C(7,3)=35×; the only shuffle is the output sort the oracle
    // contract requires).
    QueryDef(
      "dsl_combinations",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          explode(ZArr.combinations(
            concat(split(col("p_name"), " "),
              array(col("p_type"), col("p_brand"))), 3))
            .as("c"))
        .select(col("p_partkey"), col("c")(0).as("elem_1"),
          col("c")(1).as("elem_2"), col("c")(2).as("elem_3"))
        .orderBy(col("p_partkey"), col("elem_1"), col("elem_2"),
          col("elem_3")),
      Some("""WITH t AS (
             |  SELECT p_partkey,
             |    list_concat(string_split(p_name, ' '), [p_type, p_brand]) AS arr
             |  FROM part),
             |e AS (SELECT p_partkey, unnest(arr) AS x,
             |        generate_subscripts(arr, 1) AS i FROM t)
             |SELECT a.p_partkey AS p_partkey, a.x AS elem_1, b.x AS elem_2,
             |       c.x AS elem_3
             |FROM e a
             |JOIN e b ON a.p_partkey = b.p_partkey AND a.i < b.i
             |JOIN e c ON b.p_partkey = c.p_partkey AND b.i < c.i
             |ORDER BY p_partkey, elem_1, elem_2, elem_3""".stripMargin),
      Seq("combinations", "cartesian_product", "explode")),

    // zef permutations[n] (implementation_typing_functions.py:2517): all
    // ordered word pairs from the 3-word (name words + type) array per part.
    QueryDef(
      "dsl_permutations",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          explode(ZArr.permutations(
            concat(split(col("p_name"), " "), array(col("p_type"))), 2))
            .as("p"))
        .select(col("p_partkey"), col("p")(0).as("elem_1"),
          col("p")(1).as("elem_2"))
        .orderBy(col("p_partkey"), col("elem_1"), col("elem_2")),
      Some("""WITH t AS (
             |  SELECT p_partkey,
             |    list_append(string_split(p_name, ' '), p_type) AS arr
             |  FROM part),
             |e AS (SELECT p_partkey, unnest(arr) AS x,
             |        generate_subscripts(arr, 1) AS i FROM t)
             |SELECT a.p_partkey AS p_partkey, a.x AS elem_1, b.x AS elem_2
             |FROM e a
             |JOIN e b ON a.p_partkey = b.p_partkey AND a.i <> b.i
             |ORDER BY p_partkey, elem_1, elem_2""".stripMargin),
      Seq("permutations", "combinations", "explode")),

    // zef text_art (implementation_typing_functions.py:7618): string →
    // ASCII-art banner, rows prefixed '#  ', spaces widened. Lowered as a
    // codegen'd literal replace-chain over a fixed 5-row font; the DuckDB
    // side is GENERATED from the same font constant (TextArt.oracleSqlExpr)
    // so the two engines share one lowering by construction.
    QueryDef(
      "dsl_text_art",
      (s, d) => Tables.nation(s, d)
        .select(col("n_name").as("name"),
          graft.ops.TextArt.textArt(col("n_name")).as("art"))
        .orderBy(col("name")),
      Some(s"""SELECT n_name AS name,
              |  ${graft.ops.TextArt.oracleSqlExpr("n_name")} AS art
              |FROM nation ORDER BY name""".stripMargin),
      Seq("text_art"))
  )
}
