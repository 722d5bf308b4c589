package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Collection/scalar operator family (SURVEY.md §2.3–§2.7) demonstrated as
  * verifiable queries over the TPC-H-ish testdata. Each query is the Spark
  * lowering of a zef op chain (cited per-query); the oracle string is the
  * ANSI-SQL equivalent DuckDB runs on the same parquet.
  *
  * Scale notes: all plans are pure DataFrame ops — filters/projections reach
  * the parquet scan, aggregates get map-side partial aggregation, windows
  * shuffle once on their partition key. No collect(), no UDFs.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  val entries: Seq[QueryDef] = Seq(

    // zef: g | now | all[ET.Lineitem] | filter[...] | group_by[flag+status] | sum/mean/count
    // (SURVEY §2.4 group_by/sum/mean/count; reference impl.py:5857,2722,2899,5986)
    QueryDef(
      "agg_group_by_sum_mean",
      (s, d) => {
        import s.implicits._
        li(s, d)
          // string-cast literal resolves in the SESSION zone (pinned UTC);
          // Timestamp.valueOf parses in the JVM DEFAULT zone, shifting the
          // cutoff instant vs the oracle's literal on any non-UTC host
          .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      Seq("group_by", "sum", "mean", "count", "filter", "add", "multiply", "subtract")),

    // zef: filter[pred] | sort[key][reverse] | take[20]  (impl.py:6105,6177,3711)
    QueryDef(
      "filter_sort_take",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
          .filter($"l_discount" > 0.05)
          .orderBy($"l_extendedprice".desc, $"l_orderkey".asc,
            $"l_linenumber".asc, $"l_discount".asc)
          .limit(20)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
             |FROM lineitem WHERE l_discount > 0.05
             |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC, l_discount ASC
             |LIMIT 20""".stripMargin),
      Seq("filter", "sort", "take", "greater_than")),

    // Traversal-as-join: customer -> orders -> lineitem, 2 hops
    // (zef Outs[RT] chains, impl.py:6334; revenue agg per GraphQL aggregates)
    QueryDef(
      "join_2hop_revenue_topk",
      (s, d) => {
        import s.implicits._
        val c = cust(s, d); val o = ord(s, d); val l = li(s, d)
        c.join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .groupBy($"c_custkey", $"c_name")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey".asc)
          .limit(25)
      },
      Some("""SELECT c_custkey, c_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey ASC
             |LIMIT 25""".stripMargin),
      Seq("Outs", "out_rels", "group_by", "sum", "sort", "take")),

    // zef: distinct (impl.py:4368) — exact distinct over a pair
    QueryDef(
      "distinct_pairs",
      (s, d) => {
        import s.implicits._
        li(s, d).select($"l_returnflag", $"l_linestatus").distinct()
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      Seq("distinct", "is_distinct")),

    // zef: frequencies (impl.py:4116)
    QueryDef(
      "frequencies",
      (s, d) => {
        import s.implicits._
        import graft.ops.ZOps._
        // the DSL op itself, not a re-implementation — the query certifies
        // ZOps.frequencies' lowering under the oracle
        ord(s, d).frequencies($"o_orderpriority")
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS freq FROM orders
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      Seq("frequencies", "group_by", "count")),

    // zef: scan[+] (prefix fold, impl.py:3568) → running aggregate window
    QueryDef(
      "scan_running_sum",
      (s, d) => {
        import s.implicits._
        import graft.ops.ZOps._
        // ZOps.scan is the op this query certifies (same window it builds)
        ord(s, d)
          .filter($"o_custkey" <= 200)
          .scan(sum($"o_totalprice"), Seq($"o_custkey"),
            Seq($"o_orderdate", $"o_orderkey"), as = "__rt")
          .select($"o_custkey", $"o_orderkey",
            round($"__rt", 2).as("running_total"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
             |FROM orders WHERE o_custkey <= 200
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      Seq("scan", "reduce")),

    // zef: sliding[3][1] (impl.py:1427) → moving window aggregate
    QueryDef(
      "sliding_moving_avg",
      (s, d) => {
        import s.implicits._
        // NOTE (TESTDATA quirk): (l_orderkey, l_linenumber) is NOT unique in
        // the synthetic lineitem, so the window order tiebreaks through the
        // value columns to stay total, and the final sort includes the
        // computed column so fully-duplicate keys hash identically.
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_quantity", $"l_extendedprice", $"l_partkey")
          .rowsBetween(-2, Window.currentRow)
        li(s, d)
          .filter($"l_suppkey" <= 20)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            round(avg($"l_quantity").over(w), 4).as("mov_avg_qty"))
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"mov_avg_qty")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  round(avg(l_quantity) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber,
             |             l_quantity, l_extendedprice, l_partkey
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg_qty
             |FROM lineitem WHERE l_suppkey <= 20
             |ORDER BY l_suppkey, l_orderkey, l_linenumber, mov_avg_qty""".stripMargin),
      Seq("sliding", "mean")),

    // zef: max_by / arg_max / first (impl.py:3084,3115,3995) → top-1 per
    // group via ZOps.maxBy's hash-agg lowering — l_returnflag has 3
    // distinct values, so a row_number window would sort the whole table
    // in 3 tasks at any scale; the aggregate keeps map-side combine.
    // Negated keys express the asc tiebreaks under max.
    QueryDef(
      "max_by_per_group",
      (s, d) => {
        import s.implicits._
        import graft.ops.ZOps._
        // NOTE (TESTDATA quirk, as in sliding_moving_avg): lineitem has
        // ~24% duplicate (l_orderkey, l_linenumber) keys, so rows can TIE
        // on all three order keys. ZOps.maxBy then breaks the tie on the
        // remaining packed columns while the oracle's row_number picks
        // arbitrarily — the projection below must stay WITHIN the order
        // keys + partition key, or a tied winner diverges cross-engine.
        li(s, d)
          .maxBy(Seq($"l_returnflag"),
            Seq($"l_extendedprice", -$"l_orderkey", -$"l_linenumber"))
          .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
             |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             |        row_number() OVER (PARTITION BY l_returnflag
             |          ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
             |      FROM lineitem)
             |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin),
      Seq("max_by", "arg_max", "first", "nth")),

    // zef: has_out existence (impl.py:5728) → left-semi join
    QueryDef(
      "exists_semijoin",
      (s, d) => {
        import s.implicits._
        cust(s, d)
          .join(ord(s, d), $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_customers_with_orders"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers_with_orders
             |FROM customer WHERE EXISTS
             |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      Seq("has_out", "has_relation", "contains")),

    // zef: without / Complement (impl.py:9186, VT/sets.py) → anti join
    QueryDef(
      "without_antijoin",
      (s, d) => {
        import s.implicits._
        // "no order above 300k" — every customer has SOME order in the
        // synthetic data, so a plain anti-join would be vacuously empty.
        val bigOrders = ord(s, d).filter($"o_totalprice" > 300000.0)
        cust(s, d)
          .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_customers_no_big_orders"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers_no_big_orders
             |FROM customer WHERE NOT EXISTS
             |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      Seq("without", "Complement", "not")),

    // zef: concat (impl.py:564) → union of two filtered sets
    QueryDef(
      "concat_union",
      (s, d) => {
        import s.implicits._
        val o = ord(s, d)
        val hi = o.filter($"o_totalprice" > 400000.0)
          .select($"o_orderkey", lit("high").as("band"))
        val lo = o.filter($"o_totalprice" < 1000.0)
          .select($"o_orderkey", lit("low").as("band"))
        hi.unionAll(lo).orderBy($"band", $"o_orderkey")
      },
      Some("""SELECT o_orderkey, 'high' AS band FROM orders WHERE o_totalprice > 400000.0
             |UNION ALL
             |SELECT o_orderkey, 'low' AS band FROM orders WHERE o_totalprice < 1000.0
             |ORDER BY band, o_orderkey""".stripMargin),
      Seq("concat", "append", "prepend")),

    // zef: match/If (impl.py:403,4186) → CASE WHEN banding
    QueryDef(
      "match_case_banding",
      (s, d) => {
        import s.implicits._
        ord(s, d)
          .select(
            when($"o_totalprice" < 50000.0, "small")
              .when($"o_totalprice" < 150000.0, "medium")
              .when($"o_totalprice" < 300000.0, "large")
              .otherwise("huge").as("size_band"))
          .groupBy($"size_band").agg(count(lit(1)).as("n"))
          .orderBy($"size_band")
      },
      Some("""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
             |            WHEN o_totalprice < 150000.0 THEN 'medium'
             |            WHEN o_totalprice < 300000.0 THEN 'large'
             |            ELSE 'huge' END AS size_band, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY size_band""".stripMargin),
      Seq("match", "match_on", "If", "always")),

    // zef string family (§2.7): to_upper/lower, pad, slice, join
    QueryDef(
      "string_ops",
      (s, d) => {
        import s.implicits._
        cust(s, d)
          .filter($"c_custkey" <= 50)
          .select(
            $"c_custkey",
            upper($"c_name").as("name_upper"),
            lower($"c_mktsegment").as("seg_lower"),
            length($"c_name").as("name_len"),
            substring($"c_name", 1, 8).as("name_prefix"),
            concat_ws("-", $"c_mktsegment", $"c_name").as("joined"),
            lpad($"c_custkey".cast("string"), 8, "0").as("key_padded"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  upper(c_name) AS name_upper,
             |  lower(c_mktsegment) AS seg_lower,
             |  length(c_name) AS name_len,
             |  substring(c_name, 1, 8) AS name_prefix,
             |  concat_ws('-', c_mktsegment, c_name) AS joined,
             |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded
             |FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin),
      Seq("to_upper_case", "to_lower_case", "pad_left", "join", "slice", "length")),

    // zef: is_between / contained_in (impl.py:9143,1959)
    QueryDef(
      "between_isin",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .filter($"l_quantity".between(10.0, 20.0) &&
            $"l_returnflag".isin("A", "R"))
          .groupBy($"l_returnflag").agg(
            count(lit(1)).as("n"),
            round(sum($"l_quantity"), 2).as("qty"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
             |FROM lineitem
             |WHERE l_quantity BETWEEN 10.0 AND 20.0 AND l_returnflag IN ('A', 'R')
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      Seq("is_between", "contained_in", "and", "or")),

    // post-aggregation filter (HAVING): zef filter after group_by
    QueryDef(
      "having_filter_post_agg",
      (s, d) => {
        import s.implicits._
        ord(s, d)
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            round(sum($"o_totalprice"), 2).as("total"))
          .filter($"n_orders" >= 10)
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 10
             |ORDER BY o_custkey""".stripMargin),
      Seq("filter", "group_by", "count", "greater_than_or_equal")),

    // zef: enumerate (impl.py:1723) → global row index over a total order
    QueryDef(
      "enumerate_rank",
      (s, d) => {
        import s.implicits._
        // top-k, not rank-then-filter: orderBy+limit plans as
        // TakeOrderedAndProject (per-partition top-100, merge at driver) —
        // no Exchange SinglePartition over the full table. The row_number
        // window then runs over the 100 surviving rows only.
        val w = Window.orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        ord(s, d)
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(100)
          .withColumn("idx", row_number().over(w).cast("int") - 1)
          .orderBy($"idx")
      },
      Some("""SELECT o_orderkey, o_totalprice, idx FROM
             |  (SELECT o_orderkey, o_totalprice,
             |     row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) - 1 AS idx
             |   FROM orders)
             |WHERE idx < 100 ORDER BY idx""".stripMargin),
      Seq("enumerate", "zip", "sort", "take")),

    // zef: chunk[n] (impl.py:1306) → fixed-size blocks over a total order
    QueryDef(
      "chunk_blocks",
      (s, d) => {
        import s.implicits._
        import graft.ops.ZOps._
        // ZOps.chunk, not a hand-rolled unpartitioned window: the op's
        // enumerate lowering range-partitions the total order (adaptive:
        // tiny inputs take the single-task window), so the file-header
        // scale note holds for this query at any filter width
        ord(s, d)
          .filter($"o_custkey" <= 100)
          .select($"o_orderkey", $"o_totalprice")
          .chunk(50, Seq($"o_orderkey"))
          .groupBy($"chunk_id")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("chunk_total"))
          .orderBy($"chunk_id")
      },
      Some("""SELECT chunk_id, count(*) AS n, round(sum(o_totalprice), 2) AS chunk_total
             |FROM (SELECT o_orderkey, o_totalprice,
             |        CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 50) AS BIGINT) AS chunk_id
             |      FROM orders WHERE o_custkey <= 100)
             |GROUP BY chunk_id ORDER BY chunk_id""".stripMargin),
      Seq("chunk", "stride", "group_by")),

    // zef: min/max/percentile-style stats (impl.py:3073,3035)
    QueryDef(
      "minmax_median",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .groupBy($"l_linestatus")
          .agg(
            round(min($"l_extendedprice"), 2).as("min_price"),
            round(max($"l_extendedprice"), 2).as("max_price"),
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
            round(stddev_samp($"l_extendedprice"), 2).as("sd_price"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  round(min(l_extendedprice), 2) AS min_price,
             |  round(max(l_extendedprice), 2) AS max_price,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
             |  round(stddev_samp(l_extendedprice), 2) AS sd_price
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
      Seq("min", "max", "variance", "percentile")),

    // zef: product (impl.py:2743) — integer product per small group,
    // lowered as round(exp(sum(log x))). EXACTNESS ENVELOPE, honestly:
    // the exp/log roundtrip is a floating approximation whose relative
    // error (~n·1e-16) is repaired by round(0) only while the true
    // product stays well under ~1e15 — here l_linenumber ∈ [1,7] over
    // ≤13 lines caps groups at 7!·… ≈ 3.6e7, far inside it, and DuckDB's
    // product() is itself a double so both engines approximate the same
    // way. A product that can exceed 2^53 needs a different lowering
    // (aggregate() over collect_list with Long multiplication), not this
    // one.
    QueryDef(
      "agg_product",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .filter($"l_orderkey" <= 500)
          .groupBy($"l_orderkey")
          .agg(round(exp(sum(log($"l_linenumber".cast("double")))), 0).cast("long").as("line_product"),
            count(lit(1)).as("n_lines"))
          .orderBy($"l_orderkey")
      },
      Some("""SELECT l_orderkey,
             |  CAST(round(product(CAST(l_linenumber AS DOUBLE)), 0) AS BIGINT) AS line_product,
             |  count(*) AS n_lines
             |FROM lineitem WHERE l_orderkey <= 500
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
      Seq("product", "sum", "exponential", "logarithm")),

    // zef: date/time projection (Time values, to_graph_slice-style truncation)
    QueryDef(
      "date_trunc_monthly",
      (s, d) => {
        import s.implicits._
        ord(s, d)
          .groupBy(date_trunc("month", $"o_orderdate").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum($"o_totalprice"), 2).as("monthly_total"))
          .orderBy($"month")
      },
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
             |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS monthly_total
             |FROM orders GROUP BY 1 ORDER BY month""".stripMargin),
      Seq("time", "to_graph_slice", "group_by")),

    // zef: explain[VT] (implementation_typing_functions.py:10335) — WHY a
    // value fails a composite type, as data, evaluated distributed. The
    // DuckDB mirror reconstructs the same branch messages as CASE arms in
    // the same flattening order (union header, union legs, complement),
    // so a diagnostic that misattributes the failing branch diverges.
    QueryDef(
      "vt_explain",
      (s, d) => {
        import s.implicits._
        import graft.ops.VT
        val vt = (VT.Between(1L, 1500L) | VT.InSet(9999L)) &
          !VT.Is(_ % 13 === 0, "MultipleOf13")
        ord(s, d)
          .filter($"o_orderkey" <= 2000)
          .select($"o_orderkey", vt.explain($"o_orderkey").as("e"))
          .select($"o_orderkey",
            $"e.is_a".as("is_a"),
            $"e.specified_type".as("spec_type"),
            $"e.actual_type".as("actual_type"),
            concat_ws("; ", $"e.explanation").as("why"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  (o_orderkey BETWEEN 1 AND 1500 OR o_orderkey = 9999)
             |    AND NOT (o_orderkey % 13 = 0) AS is_a,
             |  'Intersection[Union[Between[1, 1500] | SetOf[9999]] & Complement[MultipleOf13]]' AS spec_type,
             |  'bigint' AS actual_type,
             |  coalesce(concat_ws('; ',
             |    CASE WHEN o_orderkey BETWEEN 1 AND 1500 OR o_orderkey = 9999
             |         THEN NULL
             |         ELSE '$: value ' || o_orderkey ||
             |           ' matched no alternative of Union[Between[1, 1500] | SetOf[9999]]' END,
             |    CASE WHEN o_orderkey BETWEEN 1 AND 1500 OR o_orderkey = 9999
             |         THEN NULL
             |         ELSE '$: value ' || o_orderkey || ' is not Between[1, 1500]' END,
             |    CASE WHEN o_orderkey BETWEEN 1 AND 1500 OR o_orderkey = 9999
             |         THEN NULL
             |         ELSE '$: value ' || o_orderkey || ' is not SetOf[9999]' END,
             |    CASE WHEN o_orderkey % 13 = 0
             |         THEN '$: value ' || o_orderkey ||
             |           ' matched complemented type MultipleOf13'
             |         ELSE NULL END), '') AS why
             |FROM orders WHERE o_orderkey <= 2000
             |ORDER BY o_orderkey""".stripMargin),
      Seq("explain", "is_a", "Union", "Intersection", "Complement"))
  )
}
