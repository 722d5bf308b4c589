package graft.queries

import org.apache.spark.sql.functions._
import graft.core.GraphEncoder

/** Temporal property-graph operators (SURVEY.md §2.1 traversal, §2.2
  * temporal) as verifiable queries.
  *
  * The graph is encoded deterministically from the relational testdata
  * (GraphEncoder), so every graph-side answer has a relational DuckDB
  * oracle over the ORIGINAL tables — the strongest correctness argument
  * available: two independent data representations, two engines, same rows.
  */
object GraphQueries {

  val entries: Seq[QueryDef] = Seq(

    // zef `blueprint` (impl.py:9225): observed schema with counts.
    QueryDef(
      "graph_blueprint_counts",
      (s, d) => {
        val g = GraphEncoder.encodeTpch(s, d)
        g.atoms.groupBy(col("kind"), col("atype"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("kind"), col("atype"))
      },
      Some("""WITH c AS (SELECT count(*) AS n FROM customer),
             |     o AS (SELECT count(*) AS n FROM orders),
             |     na AS (SELECT count(*) AS n FROM nation)
             |SELECT kind, atype, n FROM (
             |  SELECT 'ae' AS kind, 'c_acctbal' AS atype, n FROM c UNION ALL
             |  SELECT 'ae', 'c_mktsegment', n FROM c UNION ALL
             |  SELECT 'ae', 'c_name', n FROM c UNION ALL
             |  SELECT 'ae', 'n_name', n FROM na UNION ALL
             |  SELECT 'ae', 'o_orderdate', n FROM o UNION ALL
             |  SELECT 'ae', 'o_orderstatus', n FROM o UNION ALL
             |  SELECT 'ae', 'o_totalprice', n FROM o UNION ALL
             |  SELECT 'entity', 'Customer', n FROM c UNION ALL
             |  SELECT 'entity', 'Nation', n FROM na UNION ALL
             |  SELECT 'entity', 'Order', n FROM o UNION ALL
             |  SELECT 'relation', 'MemberOf', n FROM c UNION ALL
             |  SELECT 'relation', 'Placed', n FROM o UNION ALL
             |  SELECT 'relation', 'c_acctbal', n FROM c UNION ALL
             |  SELECT 'relation', 'c_mktsegment', n FROM c UNION ALL
             |  SELECT 'relation', 'c_name', n FROM c UNION ALL
             |  SELECT 'relation', 'n_name', n FROM na UNION ALL
             |  SELECT 'relation', 'o_orderdate', n FROM o UNION ALL
             |  SELECT 'relation', 'o_orderstatus', n FROM o UNION ALL
             |  SELECT 'relation', 'o_totalprice', n FROM o
             |) ORDER BY kind, atype""".stripMargin),
      Seq("blueprint", "delegate_of", "all")),

    // zef `all[ET.Customer] | Outs[RT.Placed] | field[o_totalprice]`:
    // slice scan + traversal join + as-of field resolution, aggregated.
    QueryDef(
      "graph_traversal_outs_agg",
      (s, d) => {
        val g = GraphEncoder.encodeTpch(s, d)
        // provenance-preserving traversal: ONE Placed-relations scan/join;
        // field() carries the src column through, so no second relation
        // join is needed to recover which customer placed each order.
        g.now.all("Customer").outsWithSource("Placed", "customer_id")
          .field("o_totalprice")
          .groupBy(col("customer_id"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("v_double")), 2).as("sum_total"))
          .orderBy(col("customer_id"))
      },
      Some("""SELECT 'e:Customer/' || CAST(o_custkey AS VARCHAR) AS customer_id,
             |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
             |FROM orders GROUP BY o_custkey
             |ORDER BY customer_id""".stripMargin),
      Seq("Outs", "field", "value", "all", "now", "group_by")),

    // Entity-table projection out of the 6NF graph: fields() multi-join —
    // zef `fields`/object re-assembly, verified cell-for-cell.
    QueryDef(
      "graph_fields_projection",
      (s, d) => {
        val g = GraphEncoder.encodeTpch(s, d)
        g.now.all("Customer")
          .fields(
            ("c_name", "v_str", "name"),
            ("c_acctbal", "v_double", "acctbal"),
            ("c_mktsegment", "v_str", "segment"))
          .filter(col("acctbal") > 9000.0)
          .orderBy(col("atom_id"))
      },
      Some("""SELECT 'e:Customer/' || CAST(c_custkey AS VARCHAR) AS atom_id,
             |  c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
             |FROM customer WHERE c_acctbal > 9000.0
             |ORDER BY atom_id""".stripMargin),
      Seq("field", "fields", "get_field", "select_keys", "filter")),

    // 2-hop traversal with Ins: Nation <- MemberOf <- Customer counts.
    QueryDef(
      "graph_ins_traversal",
      (s, d) => {
        val g = GraphEncoder.encodeTpch(s, d)
        g.now.allRelations("MemberOf").df
          .groupBy(col("dst_id").as("nation_id"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("nation_id"))
      },
      Some("""SELECT 'e:Nation/' || CAST(c_nationkey AS VARCHAR) AS nation_id,
             |  count(*) AS n_customers
             |FROM customer GROUP BY c_nationkey ORDER BY nation_id""".stripMargin),
      Seq("Ins", "in_rels", "source", "target", "group_by")),

    // zef `has_out` as set filter: customers with at least one order whose
    // totalprice field (as-of now) exceeds a threshold — semi-join through
    // the graph; relational EXISTS oracle.
    QueryDef(
      "graph_has_out_filter",
      (s, d) => {
        val g = GraphEncoder.encodeTpch(s, d)
        val bigOrders = g.now.all("Order")
          .fieldValue("o_totalprice", "v_double", "total")
          .filter(col("total") > 300000.0)
        g.now.allRelations("Placed").df
          .join(bigOrders.select(col("atom_id").as("dst_id")), "dst_id")
          .select(col("src_id").as("customer_id")).distinct()
          .orderBy(col("customer_id"))
      },
      Some("""SELECT DISTINCT 'e:Customer/' || CAST(o_custkey AS VARCHAR) AS customer_id
             |FROM orders WHERE o_totalprice > 300000.0
             |ORDER BY customer_id""".stripMargin),
      Seq("has_out", "select_by_field", "distinct", "filter")),

    // === The zef signature: as-of (time-travel) field values. ===
    // Event history: each event is a tx slice assigning the user's Value AE.
    // Frame at the midpoint slice; field() must return exactly the latest
    // assignment ≤ mid per user. Oracle reconstructs with a window over the
    // original events table.
    QueryDef(
      "graph_asof_value_mid",
      (s, d) => {
        val g = GraphEncoder.encodeEventHistory(s, d)
        val mid = g.maxSlice / 2
        g.at(mid).all("User")
          .fieldValue("Value", "v_double", "value_asof")
          .select(col("atom_id").as("user_id"),
            round(col("value_asof"), 6).as("value_asof"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ranked AS (
             |  SELECT user_id, value,
             |    row_number() OVER (ORDER BY ts, event_id) + 1 AS tx_slice
             |  FROM events),
             |mid AS (SELECT (count(*) + 1) // 2 AS m FROM events)
             |SELECT 'e:User/' || CAST(user_id AS VARCHAR) AS user_id,
             |  round(max_by(value, tx_slice), 6) AS value_asof
             |FROM ranked, mid WHERE tx_slice <= m
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      Seq("time_travel", "value", "to_frame", "at", "field", "exists_at")),

    // Same frame logic, `now`: latest value per user — proves now == max
    // slice and as-of degenerates to last-value.
    QueryDef(
      "graph_now_latest_value",
      (s, d) => {
        val g = GraphEncoder.encodeEventHistory(s, d)
        g.now.all("User")
          .fields(("Value", "v_double", "last_value"),
            ("EventType", "v_str", "last_type"))
          .select(col("atom_id").as("user_id"),
            round(col("last_value"), 6).as("last_value"), col("last_type"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ranked AS (
             |  SELECT user_id, value, event_type,
             |    row_number() OVER (ORDER BY ts, event_id) AS rn
             |  FROM events)
             |SELECT 'e:User/' || CAST(user_id AS VARCHAR) AS user_id,
             |  round(max_by(value, rn), 6) AS last_value,
             |  max_by(event_type, rn) AS last_type
             |FROM ranked GROUP BY user_id ORDER BY user_id""".stripMargin),
      Seq("now", "value", "field", "fields")),

    // zef `exists_at`/`aware_of`: users alive (first event ≤ S) at the
    // quarter slice vs the full population.
    QueryDef(
      "graph_exists_at_quarter",
      (s, d) => {
        val g = GraphEncoder.encodeEventHistory(s, d)
        val q = g.maxSlice / 4
        val alive = g.at(q).all("User").count()
        val total = g.now.all("User").count()
        val spark = s
        import spark.implicits._
        Seq((alive, total)).toDF("n_alive_at_quarter", "n_total")
      },
      Some("""WITH ranked AS (
             |  SELECT user_id, row_number() OVER (ORDER BY ts, event_id) + 1 AS tx_slice
             |  FROM events),
             |q AS (SELECT (count(*) + 1) // 4 AS m FROM events)
             |SELECT
             |  (SELECT count(DISTINCT user_id) FROM ranked, q WHERE tx_slice <= m) AS n_alive_at_quarter,
             |  (SELECT count(DISTINCT user_id) FROM events) AS n_total""".stripMargin),
      Seq("exists_at", "aware_of", "time_travel", "count")),

    // zef `events[assigned]` (impl.py:5168): assignment events in a slice
    // range, grouped per event kind.
    QueryDef(
      "graph_events_window",
      (s, d) => {
        val g = GraphEncoder.encodeEventHistory(s, d)
        val hi = g.maxSlice / 10
        g.events(2, hi)
          .groupBy(col("event")).agg(count(lit(1)).as("n"))
          .orderBy(col("event"))
      },
      // Window [2, N/10]: 'assigned' = 2 AEs × events in range; entities/AEs/
      // relations instantiate at the user's first event slice (3 atoms + 2
      // assignments land on the same first slice).
      // each leg emits only when the window has rows (HAVING): Spark's
      // groupBy yields ZERO rows over an empty slice window, while a bare
      // ungrouped count emitted ('assigned', 0) — a tiny fixture (< ~19
      // events, so maxSlice/10 < 2) would diverge on row count alone
      Some("""WITH ranked AS (
             |  SELECT user_id, row_number() OVER (ORDER BY ts, event_id) + 1 AS tx_slice
             |  FROM events),
             |hi AS (SELECT (count(*) + 1) // 10 AS m FROM events),
             |inrange AS (SELECT r.user_id, r.tx_slice FROM ranked r, hi WHERE r.tx_slice BETWEEN 2 AND hi.m),
             |firsts AS (SELECT user_id, min(tx_slice) AS fs FROM ranked GROUP BY user_id)
             |SELECT * FROM (
             |  SELECT 'assigned' AS event, 2 * count(*) AS n FROM inrange
             |  HAVING count(*) > 0
             |  UNION ALL
             |  SELECT 'instantiated', 5 * count(*)
             |  FROM firsts, hi WHERE fs BETWEEN 2 AND hi.m
             |  HAVING count(*) > 0
             |) ORDER BY event""".stripMargin),
      Seq("events", "preceding_events", "instantiated", "assigned")),

    // Time-travel diff — zef pattern `g | at(t1) ... vs now`: users whose
    // Value changed between the midpoint frame and now.
    QueryDef(
      "graph_time_travel_diff",
      (s, d) => {
        val g = GraphEncoder.encodeEventHistory(s, d)
        val mid = g.maxSlice / 2
        val before = g.at(mid).all("User")
          .fieldValue("Value", "v_double", "v_before")
        val after = g.now.all("User")
          .fieldValue("Value", "v_double", "v_after")
        before.join(after, "atom_id")
          .filter(col("v_before") =!= col("v_after"))
          .select(col("atom_id").as("user_id")).orderBy(col("user_id"))
      },
      Some("""WITH ranked AS (
             |  SELECT user_id, value, row_number() OVER (ORDER BY ts, event_id) + 1 AS tx_slice
             |  FROM events),
             |mid AS (SELECT (count(*) + 1) // 2 AS m FROM events),
             |b AS (SELECT user_id, max_by(value, tx_slice) AS v FROM ranked, mid
             |      WHERE tx_slice <= m GROUP BY user_id),
             |a AS (SELECT user_id, max_by(value, tx_slice) AS v FROM ranked GROUP BY user_id)
             |SELECT 'e:User/' || CAST(b.user_id AS VARCHAR) AS user_id
             |FROM b JOIN a USING (user_id) WHERE b.v <> a.v
             |ORDER BY user_id""".stripMargin),
      Seq("time_travel", "now", "value", "filter", "not_equals")),

    // assignFieldBulk end-to-end: the distributed bulk-UPDATE write path
    // (Transact.scala assignFieldBulk — set-level `set_field` with a
    // DataFrame delta, anti-join atom discovery, NO collect). One tx stamps
    // a computed score on every Customer; the result reads BOTH frames of
    // the new graph — the new field as-of now, the pre-existing acctbal
    // as-of the bulk-load slice — plus a proof the score is absent in the
    // earlier frame. The oracle recomputes both frames relationally.
    QueryDef(
      "graph_bulk_rescore",
      (s, d) => {
        import graft.core.Transactor
        val g = GraphEncoder.encodeTpch(s, d)
        val assignments = graft.Tables.customer(s, d).select(
          GraphEncoder.entityId("Customer", col("c_custkey")).as("owner_id"),
          (col("c_acctbal") * 2).as("value"))
        // three as-of frames read the same delta below — materialize it
        // once (update-sized) instead of re-deriving it per frame, which
        // instantiated the whole encode+anti-join subtree per read and
        // made this the largest analyzed plan in the registry
        val g2 = Transactor.assignFieldBulk(g, assignments, "score", "double",
          materializeDelta = true)
        val after = g2.now.all("Customer")
          .fieldValue("score", "v_double", "score")
        val balBefore = g2.at(g.maxSlice).all("Customer")
          .fieldValue("c_acctbal", "v_double", "bal_before")
        val s1Rows = g2.at(g.maxSlice).all("Customer")
          .fieldValue("score", "v_double", "s")
          .agg(count(lit(1)).as("s1_score_rows"))
        after.join(balBefore, "atom_id").crossJoin(s1Rows)
          .select(col("atom_id"), col("bal_before"), col("score"),
            col("s1_score_rows"))
          .orderBy(col("atom_id"))
      },
      Some("""SELECT 'e:Customer/' || CAST(c_custkey AS VARCHAR) AS atom_id,
             |  c_acctbal AS bal_before, c_acctbal * 2 AS score,
             |  CAST(0 AS BIGINT) AS s1_score_rows
             |FROM customer ORDER BY atom_id""".stripMargin),
      Seq("assign_field_bulk", "set_field", "time_travel", "value")),

    // Fixed-iteration PageRank over the encoded graph's MemberOf + Placed
    // relations — the DETERMINISTIC power-iteration variant, which is what
    // makes distributed graph analytics ORACLE-ABLE: DuckDB replays the
    // identical recurrence (r_{k+1} = 0.15 + 0.85·Σ r_k/outdeg, r_0 = 1)
    // as unrolled per-iteration CTEs over the original tables, so the
    // candidate mass flowing customer→nation (outdeg varies per customer:
    // 1 + its order count) must agree to 4 decimals. Per iteration the
    // Spark side is one join + one keyed aggregate, chained lazily into
    // ONE plan (a checkpoint every 8 rounds bounds lineage for long runs);
    // only edge-active vertices iterate — isolated ones are resetProb
    // constants. The GraphX tolerance-based pageRank stays the
    // convergence variant (spec-only).
    QueryDef(
      "graph_pagerank_static",
      (s, d) => {
        val g = GraphEncoder.encodeTpch(s, d)
        graft.analytics.GraphAlgos
          .pageRankStatic(g.now, Seq("MemberOf", "Placed"), iters = 5)
          .filter(col("atom_id").startsWith("e:Nation/"))
          .select(col("atom_id").as("nation_id"),
            round(col("rank"), 4).as("rank"))
          .orderBy(col("nation_id"))
      },
      Some {
        val iterCtes = (1 to 5).map { k =>
          s"""pr$k AS (
             |  SELECT verts.v, 0.15 + 0.85 * coalesce(s.m, 0.0) AS r
             |  FROM verts LEFT JOIN (
             |    SELECT ed.dst AS v2, sum(p.r / ed.d) AS m
             |    FROM ed JOIN pr${k - 1} p ON p.v = ed.src
             |    GROUP BY ed.dst) s ON s.v2 = verts.v)""".stripMargin
        }.mkString(",\n")
        s"""WITH verts AS (
           |  SELECT 'e:Customer/' || CAST(c_custkey AS VARCHAR) AS v
           |  FROM customer
           |  UNION ALL
           |  SELECT 'e:Nation/' || CAST(n_nationkey AS VARCHAR) FROM nation
           |  UNION ALL
           |  SELECT 'e:Order/' || CAST(o_orderkey AS VARCHAR) FROM orders),
           |edges AS (
           |  SELECT 'e:Customer/' || CAST(c_custkey AS VARCHAR) AS src,
           |         'e:Nation/' || CAST(c_nationkey AS VARCHAR) AS dst
           |  FROM customer
           |  UNION ALL
           |  SELECT 'e:Customer/' || CAST(o_custkey AS VARCHAR),
           |         'e:Order/' || CAST(o_orderkey AS VARCHAR) FROM orders),
           |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
           |ed AS (SELECT e.src, e.dst, deg.d FROM edges e
           |       JOIN deg ON deg.src = e.src),
           |pr0 AS (SELECT v, CAST(1.0 AS DOUBLE) AS r FROM verts),
           |$iterCtes
           |SELECT v AS nation_id, round(r, 4) AS rank FROM pr5
           |WHERE v LIKE 'e:Nation/%' ORDER BY nation_id""".stripMargin
      },
      Seq("pagerank", "graph_analytics", "power_iteration", "fixpoint")),

    // GraphVerify.danglingEndpointRelations — the auditable face of the
    // one-level termination-cascade contract (Transact culls a terminated
    // atom's incident relations one level deep, like the reference's
    // single PleaseTerminate pass, so a meta-relation on a cascaded
    // relation survives with a dead endpoint). Fixture: 20 customers each
    // in a Seg via an InSeg relation; even custkeys carry a Tagged
    // META-relation on their InSeg; terminating customers 1-10 cascades
    // InSeg closed — the even-key Tagged relations (2,4,6,8,10) outlive
    // their endpoint and the lint reports exactly them.
    QueryDef(
      "graph_dangling_lint",
      (s, d) => {
        import graft.core._
        val keys = graft.Tables.customer(s, d)
          .filter(col("c_custkey") <= 20)
          .select(col("c_custkey")).collect().map(_.getLong(0)).sorted
        val wishes: Seq[Wish] = Seq(PutEntity("Audit", "a")) ++
          keys.flatMap { k =>
            Seq(PutEntity("Cust", s"c$k"), PutEntity("Seg", s"s$k"),
              PutRelation("InSeg", s"c$k", s"s$k", s"is$k")) ++
              (if (k % 2 == 0)
                Seq(PutRelation("Tagged", s"is$k", "a", s"tg$k"))
              else Nil)
          }
        val (g1, _) = Transactor.transact(Graph.empty(s), wishes)
        val (g2, _) = Transactor.transact(g1,
          keys.filter(_ <= 10).map(k => TerminateAtom(s"e:Cust/c$k")))
        GraphVerify.danglingEndpointRelations(g2).orderBy(col("atom_id"))
      },
      Some("""SELECT 'r:Tagged/tg' || CAST(c_custkey AS VARCHAR) AS atom_id,
             |  2 AS last_visible_slice,
             |  'endpoint dead at last visible slice 2' AS detail
             |FROM customer WHERE c_custkey <= 10 AND c_custkey % 2 = 0
             |ORDER BY atom_id""".stripMargin),
      Seq("graph_verify", "terminate", "cascade", "meta_relation"))
  )
}
