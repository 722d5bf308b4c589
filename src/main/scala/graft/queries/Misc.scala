package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Tables

/** Serialization / JSON / distinct-exact operators (SURVEY §2.8, §2.5)
  * plus the spark.sql text surface — oracle-verified. */
object Misc {

  val entries: Seq[QueryDef] = Seq(

    // zef from_json (impl.py:7656): parse the events props JSON column and
    // aggregate an extracted field.
    QueryDef(
      "json_extract_agg",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.withColumn("k",
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            round(avg(col("k")), 4).as("avg_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      Seq("from_json", "to_json", "get_in", "group_by")),

    // zef base64 codecs (impl.py:9047-9142).
    QueryDef(
      "base64_roundtrip",
      (s, d) => {
        Tables.documents(s, d)
          .filter(col("doc_id") <= 30)
          .select(col("doc_id"),
            base64(col("source").cast("binary")).as("b64"),
            unbase64(base64(col("source").cast("binary"))).cast("string").as("back"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, base64(encode(source)) AS b64, source AS back
             |FROM documents WHERE doc_id <= 30 ORDER BY doc_id""".stripMargin),
      Seq("base64", "to_bytes", "utf8bytes_to_string")),

    // exact distinct-count family (zef distinct is exact; superset
    // approx_count_distinct is library-available but not oracle-comparable).
    QueryDef(
      "count_distinct_exact",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("n_orders"),
            countDistinct(col("l_partkey")).as("n_parts"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_orderkey) AS n_orders,
             |  count(DISTINCT l_partkey) AS n_parts
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      Seq("distinct", "is_distinct", "count")),

    // infer_types at the driver surface: shape+predicate rules over the
    // events props JSON, aggregated per inferred type.
    QueryDef(
      "er_infer_types",
      (s, d) => {
        import graft.wrangling.EntityResolution._
        // the numeric predicate guards its cast (ANSI: a non-numeric k
        // would abort the job; guarded it falls through to BigK, exactly
        // the oracle's CASE order)
        inferTypes(Tables.events(s, d), "props", Seq(
          TypeRule("SmallK", Seq("k"),
            m => when(element_at(m, "k").rlike("^-?\\d+$"),
              element_at(m, "k").cast("long") < 50).otherwise(lit(false))),
          TypeRule("BigK", Seq("k"))))
          .groupBy(col("inferred_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("inferred_type"))
      },
      // mirrors the SHAPE rule exactly: a props row without a k key is
      // ZEF_Unknown (not BigK), and TRY_CAST keeps a non-numeric k from
      // aborting the whole oracle query — the current corpus has k on
      // every row, but the oracle must not depend on that
      Some("""SELECT CASE
             |  WHEN json_extract_string(props, '$.k') IS NULL THEN 'ZEF_Unknown'
             |  WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?\d+$')
             |    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) < 50
             |    THEN 'SmallK' ELSE 'BigK' END AS inferred_type,
             |  count(*) AS n
             |FROM events GROUP BY 1 ORDER BY inferred_type""".stripMargin),
      Seq("infer_types", "pattern", "match")),

    // Embedding near-dup pairs, LSH-blocked. The md5-derived planes make
    // the blocking deterministic across engines, so the DuckDB oracle
    // regenerates the SAME candidate set and verifies the SAME pairs —
    // the approximate pipeline is hash-checked end-to-end, blocking
    // recall included.
    QueryDef(
      "wr_embedding_near_dups",
      (s, d) => {
        // bits/chunkBits PINNED: annSigCtes inlines exactly these 16 planes
        // and 4-bit chunks — the oracle replays the identical blocking.
        // Unpinned callers get the corpus-sized default (chunkBitsFor).
        // FIXTURE BOUNDED (wr_dedup_clusters policy, no-op at every tested
        // sf — embeddings tops out at 2,000 rows at sf0.1): a pinned
        // 2^4-value bucket keyspace is quadratic in corpus size BY
        // CONSTRUCTION (r15 probe: exponent 2.26 at 5,000 vectors), and
        // this query exists to replay the oracle's exact blocking, not to
        // probe scale — the auto variant below is the scale path.
        graft.wrangling.Similarity.cosineNearDupPairs(
          Tables.embeddings(s, d).filter(col("vec_id") <= 2000),
          "vec_id", "embedding",
          threshold = 0.35, dim = 64, bits = 16, chunkBits = 4)
          .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(
        s"""WITH ${Wrangling.annSigCtes},
           |cand AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM chunks a JOIN chunks b
           |    ON a.ci = b.ci AND a.cv = b.cv AND a.vec_id < b.vec_id
           |  WHERE a.vec_id <= 2000 AND b.vec_id <= 2000
           |  GROUP BY 1, 2),
           |sims AS (
           |  SELECT c.id_a, c.id_b,
           |    sum(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) /
           |      (sqrt(sum(CAST(ea.embedding[i] AS DOUBLE) ^ 2)) *
           |       sqrt(sum(CAST(eb.embedding[i] AS DOUBLE) ^ 2))) AS cs
           |  FROM cand c
           |  JOIN embeddings ea ON ea.vec_id = c.id_a
           |  JOIN embeddings eb ON eb.vec_id = c.id_b,
           |  generate_series(1, 64) AS g(i)
           |  GROUP BY c.id_a, c.id_b)
           |SELECT id_a, id_b, round(cs, 4) AS cos_sim
           |FROM sims WHERE cs >= 0.35 ORDER BY id_a, id_b""".stripMargin),
      Seq("similarity_search", "near_dup", "lsh", "cosine")),

    // The AUTO-SIZED near-dup path: blocking derived from a one-pass corpus
    // count (Similarity.chunkBitsFor — expected bucket size stays constant
    // as the corpus grows; the r12 scale probe measured exponent 1.11 under
    // the old fixed 16/4 default). The oracle replays the SAME derivation
    // end-to-end in SQL: integer-exact chunkBits from its own count(*),
    // md5-parity planes regenerated per bit — so the corpus-sized blocking
    // is hash-checked at whatever size the table has, not just the fixture.
    QueryDef(
      "wr_embedding_near_dups_auto",
      (s, d) => {
        graft.wrangling.Similarity.cosineNearDupPairs(
          Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.35, dim = 64)
          .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(
        """WITH cbf AS (
          |  SELECT LEAST(30, GREATEST(4, COALESCE(
          |    (SELECT MIN(k) FROM range(0, 31) t(k)
          |     WHERE (CAST(1 AS BIGINT) << CAST(k AS INT)) >=
          |       ((SELECT count(*) FROM embeddings) + 63) // 64), 30))) AS cb),
          |planes AS (
          |  SELECT i, list(CASE WHEN substr(md5('p:' || i || ':' || j), 2, 1)
          |                      IN ('1','3','5','7','9','b','d','f')
          |                 THEN CAST(1.0 AS DOUBLE)
          |                 ELSE CAST(-1.0 AS DOUBLE) END ORDER BY j) AS arr
          |  FROM range(0, 120) t1(i), range(0, 64) t2(j)
          |  WHERE i < 4 * (SELECT cb FROM cbf)
          |  GROUP BY i),
          |proj AS (
          |  SELECT e.vec_id, p.i,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list_transform(range(1, 65),
          |        j -> CAST(e.embedding[j] AS DOUBLE) * p.arr[j])),
          |      (acc, x) -> acc + x) AS pr
          |  FROM embeddings e, planes p),
          |chunks AS (
          |  SELECT vec_id, i // (SELECT cb FROM cbf) AS ci,
          |    sum(CASE WHEN pr > 0
          |             THEN 1 << CAST(i % (SELECT cb FROM cbf) AS INT)
          |             ELSE 0 END) AS cv
          |  FROM proj GROUP BY 1, 2),
          |cand AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
          |  FROM chunks a JOIN chunks b
          |    ON a.ci = b.ci AND a.cv = b.cv AND a.vec_id < b.vec_id
          |  GROUP BY 1, 2),
          |sims AS (
          |  SELECT c.id_a, c.id_b,
          |    sum(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) /
          |      (sqrt(sum(CAST(ea.embedding[i] AS DOUBLE) ^ 2)) *
          |       sqrt(sum(CAST(eb.embedding[i] AS DOUBLE) ^ 2))) AS cs
          |  FROM cand c
          |  JOIN embeddings ea ON ea.vec_id = c.id_a
          |  JOIN embeddings eb ON eb.vec_id = c.id_b,
          |  generate_series(1, 64) AS g(i)
          |  GROUP BY c.id_a, c.id_b)
          |SELECT id_a, id_b, round(cs, 4) AS cos_sim
          |FROM sims WHERE cs >= 0.35 ORDER BY id_a, id_b""".stripMargin),
      Seq("similarity_search", "near_dup", "lsh", "cosine", "auto_sizing")),

    // part/supplier coverage: brand-level stats with a size filter.
    QueryDef(
      "part_brand_stats",
      (s, d) => {
        Tables.part(s, d)
          .filter(col("p_size").between(10, 40))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"),
            round(avg(col("p_retailprice")), 4).as("avg_price"),
            max(col("p_size")).as("max_size"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(*) AS n_parts,
             |  round(avg(p_retailprice), 4) AS avg_price,
             |  max(p_size) AS max_size
             |FROM part WHERE p_size BETWEEN 10 AND 40
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      Seq("group_by", "mean", "max", "is_between", "filter")),

    // 3-table supply chain: supplier -> lineitem -> part, nation-joined.
    QueryDef(
      "supplier_part_chain",
      (s, d) => {
        val sup = Tables.supplier(s, d); val li = Tables.lineitem(s, d)
        val nat = Tables.nation(s, d)
        sup.join(li, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(countDistinct(col("s_suppkey")).as("n_suppliers"),
            round(sum(col("l_extendedprice")), 2).as("shipped_value"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
             |  count(DISTINCT s_suppkey) AS n_suppliers,
             |  round(sum(l_extendedprice), 2) AS shipped_value
             |FROM supplier
             |JOIN lineitem ON s_suppkey = l_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      Seq("Outs", "group_by", "distinct", "sum", "broadcast_join")),

    // Misra–Gries heavy hitters (custom TypedImperativeAggregate): most
    // active users per event type. Capacity (4096) exceeds the distinct
    // users at every tested sf, so the sketch is EXACT and the oracle
    // hash-checks the full partial/merge/shuffle machinery; the
    // undercapacity bounds are spec'd in FunctionsSpec.
    QueryDef(
      "agg_heavy_hitters",
      (s, d) => {
        import graft.functions.HeavyHittersAgg.heavyHitters
        // capacity ABOVE the per-type user cardinality at every tested sf
        // (sf0.1 has ~1,500 distinct users per event_type): the exact-count
        // oracle is only comparable while the sketch is in its exact
        // regime. Capacity-pressure semantics (est_count overshoot bounds,
        // guaranteed-hitter retention) are spec'd in FunctionsSpec, which
        // is where approximation belongs — a hash-compared oracle can't
        // check an approximation.
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(heavyHitters(col("user_id"), 4096).as("hh"))
          .select(col("event_type"), explode(col("hh")).as("e"))
          .select(col("event_type"), col("e.item").as("user_id"),
            col("e.est_count").as("n"))
          .orderBy(col("event_type"), col("user_id"))
      },
      Some("""SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1, 2
             |ORDER BY event_type, user_id""".stripMargin),
      Seq("frequencies", "heavy_hitters", "group_by", "sketch")),

    // As-of join (pandas merge_asof / DuckDB ASOF JOIN; the operator class
    // SURVEY §4.2 flags as "Spark lacks"): per click, the most recent prior
    // purchase of the same user — union+window lowering, one shuffle.
    QueryDef(
      "asof_join_events",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        // one purchase per (user, ts) on BOTH sides: DuckDB's plain ASOF
        // tie choice on duplicate right timestamps is unspecified (the
        // pinned tie contract lives in asof_join_dup_ties; here the oracle
        // must stay a plain ASOF JOIN, so the tie class is removed)
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("p_value"))
        graft.ops.AsOfJoin.backward(clicks, purchases,
            Seq("user_id"), "ts", "ts")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_clicks"),
            count(col("p_value")).as("n_matched"),
            round(sum(coalesce(col("value") - col("p_value"), lit(0.0))), 3)
              .as("diff_sum"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT l.user_id AS user_id, count(*) AS n_clicks,
             |  count(r.value) AS n_matched,
             |  round(sum(coalesce(l.value - r.value, 0)), 3) AS diff_sum
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (
             |  SELECT user_id, ts, max(value) AS value FROM events
             |  WHERE event_type = 'purchase' GROUP BY user_id, ts) r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |GROUP BY l.user_id ORDER BY user_id""".stripMargin),
      Seq("asof_join", "time_travel", "group_by")),

    // As-of join over a right side where EVERY (key, ts) is duplicated —
    // pins the tie contract (AsOfJoin doc): among duplicate right
    // (key, ts) rows the winner is the max payload struct, mirrored by
    // both lowerings. Purchases are unioned with a value-1000 shadow copy
    // at identical timestamps, so every match is a tie and the winner
    // must be the ORIGINAL (higher) value; the oracle expresses the same
    // contract as a pre-aggregation to max(value) per (user_id, ts) —
    // exactly what "max payload struct" means for a single payload
    // column — then a plain ASOF JOIN over the now-unique right side.
    QueryDef(
      "asof_join_dup_ties",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("p_value"))
        val dup = purchases.unionByName(
          purchases.withColumn("p_value", col("p_value") - 1000.0))
        graft.ops.AsOfJoin.backward(clicks, dup, Seq("user_id"), "ts", "ts")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_clicks"),
            count(col("p_value")).as("n_matched"),
            round(sum(col("p_value")), 3).as("matched_sum"))
          .orderBy(col("user_id"))
      },
      Some("""WITH p AS (
             |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, ts, value - 1000.0 FROM events WHERE event_type = 'purchase'),
             |r AS (
             |  SELECT user_id, ts, max(value) AS p_value FROM p GROUP BY user_id, ts)
             |SELECT l.user_id AS user_id, count(*) AS n_clicks,
             |  count(r.p_value) AS n_matched,
             |  round(sum(r.p_value), 3) AS matched_sum
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |GROUP BY l.user_id ORDER BY user_id""".stripMargin),
      Seq("asof_join", "tie_break", "group_by")),

    // Salted equi-join under a genuinely hot key: events carry only a
    // handful of event_type values, so a plain hash join on event_type
    // pins whole executors at scale — SkewJoin.saltedJoin spreads each
    // hot key across 8 sub-partitions and replicates the dimension side
    // 8x. Join OUTPUT is identical to the plain join (the oracle runs the
    // plain join), which is exactly the property under test; the plan pin
    // shows the salted path buys no extra shuffle (the dimension is
    // broadcast, salt riding in the join key).
    QueryDef(
      "skew_salted_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val dim = ev.groupBy(col("event_type"))
          .agg(round(avg(col("value")), 6).as("type_avg"))
        graft.ops.SkewJoin.saltedJoin(ev, dim, Seq("event_type"), salt = 8)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value") - col("type_avg")), 2).as("dev_sum"))
          .orderBy(col("user_id"))
      },
      Some("""WITH dim AS (
             |  SELECT event_type, round(avg(value), 6) AS type_avg
             |  FROM events GROUP BY 1)
             |SELECT e.user_id, count(*) AS n,
             |  round(sum(e.value - dim.type_avg), 2) AS dev_sum
             |FROM events e JOIN dim USING (event_type)
             |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin),
      Seq("salted_join", "skew", "join", "group_by")),

    // As-of join, broadcast-right lowering (AsOfJoin.backwardSmallRight —
    // collect the small side's history per key into a sorted array,
    // broadcast, binary-search-equivalent array filter; previously
    // parity-spec'd only, no oracle). Same per-click semantics as
    // asof_join_events plus a 6-hour tolerance: a prior purchase older
    // than that matches as NULL (reference merge_asof tolerance).
    QueryDef(
      "asof_join_small_dim",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        // same (user, ts) purchase dedup as asof_join_events/_tolerance
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("p_value"))
        graft.ops.AsOfJoin.backwardSmallRight(clicks, purchases,
            Seq("user_id"), "ts", "ts", toleranceSec = Some(21600.0))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_clicks"),
            count(col("p_value")).as("n_matched"),
            round(sum(coalesce(col("value") - col("p_value"), lit(0.0))), 3)
              .as("diff_sum"))
          .orderBy(col("user_id"))
      },
      // the tolerance bound replays the ENGINE'S arithmetic bit-for-bit
      // (double epoch-seconds, TimeAxis.seconds) like asof_join_tolerance —
      // an exact INTERVAL compare can disagree with the double form right
      // at the 6-hour boundary (each /1e6 rounds by up to ~1e-7 s)
      Some("""SELECT l.user_id AS user_id, count(*) AS n_clicks,
             |  count(CASE WHEN
             |      CAST(epoch_us(l.ts) AS DOUBLE) / 1000000.0
             |        - CAST(epoch_us(r.ts) AS DOUBLE) / 1000000.0 <= 21600.0
             |    THEN r.value END) AS n_matched,
             |  round(sum(CASE WHEN
             |      CAST(epoch_us(l.ts) AS DOUBLE) / 1000000.0
             |        - CAST(epoch_us(r.ts) AS DOUBLE) / 1000000.0 <= 21600.0
             |    THEN l.value - r.value ELSE 0 END), 3) AS diff_sum
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (
             |  SELECT user_id, ts, max(value) AS value FROM events
             |  WHERE event_type = 'purchase' GROUP BY user_id, ts) r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |GROUP BY l.user_id ORDER BY user_id""".stripMargin),
      Seq("asof_join", "broadcast", "tolerance", "group_by")),

    // Range (point-in-interval) join with NO equi-key — binned lowering
    // (RangeJoin): events landing in the first 6 hours of each day. The
    // naive plan is a nested-loop cross product; the binned plan is a plain
    // equi-join on the bin id.
    QueryDef(
      "range_join_windows",
      (s, d) => {
        val wins = s.sql(
          """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
            |  timestamp'2024-01-30 00:00:00', interval 1 day)) AS lo""".stripMargin)
          .withColumn("hi", col("lo") + expr("INTERVAL 6 HOURS"))
        val pts = Tables.events(s, d).select(col("ts"), col("value"))
        graft.ops.RangeJoin.pointInInterval(
            pts, "ts", wins, "lo", "hi", binWidth = 6 * 3600.0)
          .groupBy(to_date(col("lo")).as("day"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 3).as("value_sum"))
          .orderBy(col("day"))
      },
      Some("""WITH wins AS (
             |  SELECT d AS lo, d + INTERVAL 6 HOUR AS hi
             |  FROM generate_series(TIMESTAMP '2024-01-01',
             |    TIMESTAMP '2024-01-30', INTERVAL 1 DAY) t(d))
             |SELECT CAST(w.lo AS DATE) AS day, count(*) AS n_events,
             |  round(sum(e.value), 3) AS value_sum
             |FROM wins w JOIN events e ON e.ts >= w.lo AND e.ts <= w.hi
             |GROUP BY 1 ORDER BY day""".stripMargin),
      Seq("range_join", "is_between", "group_by")),

    // Interval×interval overlap join (RangeJoin.intervalOverlap): 6-hour
    // morning windows vs 48-hour spans starting at noon — each span
    // overlaps the NEXT two days' mornings, so the pairing is non-trivial
    // and the canonical-bin dedup is load-bearing (spans cover many bins).
    QueryDef(
      "range_join_overlap",
      (s, d) => {
        val days = s.sql(
          """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
            |  timestamp'2024-01-28 00:00:00', interval 1 day)) AS day""".stripMargin)
        val a = days.select(to_date(col("day")).as("a_day"),
          col("day").as("alo"),
          (col("day") + expr("INTERVAL 6 HOURS")).as("ahi"))
        val b = days.select(to_date(col("day")).as("b_day"),
          (col("day") + expr("INTERVAL 12 HOURS")).as("blo"),
          (col("day") + expr("INTERVAL 60 HOURS")).as("bhi"))
        graft.ops.RangeJoin.intervalOverlap(
            a, "alo", "ahi", b, "blo", "bhi", binWidth = 24 * 3600.0)
          .groupBy(col("b_day"))
          .agg(count(lit(1)).as("n_mornings"),
            min(col("a_day")).as("first_morning"))
          .orderBy(col("b_day"))
      },
      Some("""WITH days AS (
             |  SELECT d AS day FROM generate_series(TIMESTAMP '2024-01-01',
             |    TIMESTAMP '2024-01-28', INTERVAL 1 DAY) t(d)),
             |a AS (SELECT CAST(day AS DATE) AS a_day, day AS alo,
             |        day + INTERVAL 6 HOUR AS ahi FROM days),
             |b AS (SELECT CAST(day AS DATE) AS b_day,
             |        day + INTERVAL 12 HOUR AS blo,
             |        day + INTERVAL 60 HOUR AS bhi FROM days)
             |SELECT b_day, count(*) AS n_mornings,
             |  min(a_day) AS first_morning
             |FROM a JOIN b ON a.alo <= b.bhi AND b.blo <= a.ahi
             |GROUP BY b_day ORDER BY b_day""".stripMargin),
      Seq("range_join", "interval_overlap", "group_by")),

    // As-of join WITH tolerance (merge_asof `tolerance`): clicks match
    // their latest preceding purchase only within 6 hours — stale matches
    // null out but the left row survives (left-join semantics). The oracle
    // replays the bound with the same double-seconds arithmetic the Spark
    // lowering uses (epoch_us/1e6 subtraction), so IEEE results agree
    // bit-for-bit at the boundary.
    QueryDef(
      "asof_join_tolerance",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        // one purchase per (user, ts): both engines' as-of tie handling
        // is unspecified for duplicate right timestamps (same hazard —
        // and same dedup — as stream_asof_enrich below); max(value)
        // makes the tie winner deterministic on both sides
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("p_value"))
        graft.ops.AsOfJoin.backward(clicks, purchases,
            Seq("user_id"), "ts", "ts", toleranceSec = Some(6 * 3600.0))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_clicks"),
            count(col("p_value")).as("n_matched"),
            round(sum(col("p_value")), 3).as("matched_sum"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT l.user_id AS user_id, count(*) AS n_clicks,
             |  count(m) AS n_matched, round(sum(m), 3) AS matched_sum
             |FROM (
             |  SELECT l.user_id, CASE WHEN
             |      CAST(epoch_us(l.ts) AS DOUBLE) / 1000000.0
             |        - CAST(epoch_us(r.ts) AS DOUBLE) / 1000000.0 <= 21600.0
             |    THEN r.value END AS m
             |  FROM (SELECT * FROM events WHERE event_type = 'click') l
             |  ASOF LEFT JOIN (
             |    SELECT user_id, ts, max(value) AS value FROM events
             |    WHERE event_type = 'purchase' GROUP BY user_id, ts) r
             |    ON l.user_id = r.user_id AND l.ts >= r.ts) l
             |GROUP BY l.user_id ORDER BY user_id""".stripMargin),
      Seq("asof_join", "tolerance", "time_travel", "group_by")),

    // Streaming as-of enrichment (Streams.asofEnrich) in its batch face:
    // the keyed-state CDC-enrichment operator must reproduce the exact
    // as-of join when one batch holds everything (the spec asserts the
    // stream face equals this plan). Purchases dedup to one row per
    // (user, ts) first — both engines' as-of tie handling is otherwise
    // unspecified for duplicate right timestamps.
    QueryDef(
      "stream_asof_enrich",
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("user_id") <= 40)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("event_id"))
        graft.streaming.Streams.asofEnrich(clicks, purchases, "user_id", "ts")
          .toDF().orderBy(col("key"), col("ts"), col("payload"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, ts, event_id FROM events
             |  WHERE event_type = 'click' AND user_id <= 40),
             |p AS (
             |  SELECT user_id, ts, max(event_id) AS event_id FROM events
             |  WHERE event_type = 'purchase' AND user_id <= 40
             |  GROUP BY user_id, ts),
             |j AS (
             |  SELECT c.user_id, c.ts, c.event_id AS cid,
             |    r.ts AS pts, r.event_id AS pid
             |  FROM c ASOF LEFT JOIN p r
             |    ON c.user_id = r.user_id AND c.ts >= r.ts)
             |SELECT CAST(user_id AS VARCHAR) AS key,
             |  CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS ts,
             |  '{"event_id":' || CAST(cid AS VARCHAR) || '}' AS payload,
             |  CAST(epoch_us(pts) AS DOUBLE) / 1000000.0 AS matched_ts,
             |  CASE WHEN pid IS NOT NULL
             |    THEN '{"event_id":' || CAST(pid AS VARCHAR) || '}'
             |  END AS matched_payload
             |FROM j ORDER BY key, ts, payload""".stripMargin),
      Seq("asof_enrich", "subscribe", "stateful", "asof_join")),

    // Quantity algebra (zef QuantityFloat, scalars.h:133-230) under the
    // hash gate: same-unit add/subtract/scale/compare over unit-carrying
    // structs built from lineitem quantities. Same-unit by construction
    // here (the gate can't check the raise_error mismatch branch — that
    // contract is QuantitySpec's); values/units flatten to plain columns
    // so DuckDB replays the arithmetic directly. Duplicate
    // (l_orderkey, l_linenumber) keys exist in this corpus — both sides
    // pre-aggregate to one deterministic row per order first.
    QueryDef(
      "quantity_unit_math",
      (s, d) => {
        import graft.functions.Quantity
        val li = Tables.lineitem(s, d)
        def side(ln: Int, as: String) = li.filter(col("l_linenumber") === ln)
          .groupBy(col("l_orderkey"))
          .agg(max(col("l_quantity")).as("__q"))
          .select(col("l_orderkey"),
            Quantity.quantity(col("__q"), "kg").as(as))
        val joined = side(1, "qa").join(side(2, "qb"), "l_orderkey")
        val total = Quantity.qAdd(col("qa"), col("qb"))
        joined.select(col("l_orderkey"),
            Quantity.value(total).as("total"),
            Quantity.unit(total).as("unit"),
            Quantity.value(Quantity.qSubtract(col("qb"), col("qa"))).as("diff"),
            Quantity.value(Quantity.qScale(col("qa"), lit(2.5))).as("scaled"),
            Quantity.qLt(col("qa"), col("qb")).as("a_lt_b"),
            Quantity.qEq(col("qa"), col("qb")).as("a_eq_b"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH a AS (
             |  SELECT l_orderkey, max(l_quantity) AS q FROM lineitem
             |  WHERE l_linenumber = 1 GROUP BY l_orderkey),
             |b AS (
             |  SELECT l_orderkey, max(l_quantity) AS q FROM lineitem
             |  WHERE l_linenumber = 2 GROUP BY l_orderkey)
             |SELECT a.l_orderkey,
             |  CAST(a.q + b.q AS DOUBLE) AS total, 'kg' AS unit,
             |  CAST(b.q - a.q AS DOUBLE) AS diff,
             |  CAST(a.q * 2.5 AS DOUBLE) AS scaled,
             |  a.q < b.q AS a_lt_b, a.q = b.q AS a_eq_b
             |FROM a JOIN b USING (l_orderkey)
             |ORDER BY l_orderkey""".stripMargin),
      Seq("quantity", "unit_algebra", "compare", "group_by")),

    // The spark.sql text surface over registered views — SQL parity path.
    QueryDef(
      "sql_text_surface",
      (s, d) => {
        // register only the tables the statement reads: registering all
        // ten paid eight parquet footer loads per run and left a session-
        // global 'events' view with the RAW (non-TimeAxis-normalized)
        // schema for unrelated code to trip over
        Seq("customer", "nation").foreach(t =>
          Tables.table(s, d, t).createOrReplaceTempView(t))
        s.sql("""
          SELECT n_name, count(*) AS n_customers,
                 round(sum(c_acctbal), 2) AS total_bal
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""")
      },
      Some("""SELECT n_name, count(*) AS n_customers,
             |  round(sum(c_acctbal), 2) AS total_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      Seq("sql_surface", "join", "group_by"))
  )
}
