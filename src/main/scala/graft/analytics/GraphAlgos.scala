package graft.analytics

import org.apache.spark.graphx.{Edge, Graph => XGraph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphSlice, Kind}

/** Graph analytics via GraphX (north star: "GraphX for graph analytics");
  * the reference exports to NetworkX for the same purpose
  * (`python/zef/experimental/networkx.py:57-160`) — here the export is a
  * view transformation inside the cluster, not a driver round-trip.
  *
  * Vertex ids: GraphX needs Long ids; atom_ids hash via xxhash64 with the
  * string kept alongside for the reverse mapping (collision probability at
  * corpus scale is negligible for analytics; exact algorithms stay on the
  * DataFrame representation).
  */
object GraphAlgos {

  /** Slice view → GraphX graph over the given relation types. Edges are
    * restricted to endpoints present in the vertex set: a relation whose
    * src/dst is itself a relation atom (meta-relation) or outside the alive
    * slice would otherwise materialize as a null-attr GHOST vertex inside
    * GraphX — silently absorbing pageRank mass, winning LPA labels, and
    * inflating triangle counts before the final atom_id join drops it. */
  def toGraphX(slice: GraphSlice, rts: Seq[String]): (XGraph[String, String], DataFrame) = {
    val atoms = slice.aliveAtoms
    val verts = atoms.filter(col("kind") =!= Kind.Relation)
      .select(xxhash64(col("atom_id")).as("vid"), col("atom_id"))
    val vids = verts.select(col("vid"))
    val rels = atoms.filter(
      col("kind") === Kind.Relation && col("atype").isInCollection(rts))
      .select(xxhash64(col("src_id")).as("src"),
        xxhash64(col("dst_id")).as("dst"), col("atype"))
      .join(vids.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
      .join(vids.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")
      // a usingColumns join reorders the join key FIRST — re-pin the
      // positional order the Edge mapper below reads
      .select(col("src"), col("dst"), col("atype"))
    val vrdd = verts.rdd.map(r => (r.getLong(0), r.getString(1)))
    val erdd = rels.rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    (XGraph(vrdd, erdd), verts)
  }

  /** PageRank over a relation type — returns (atom_id, rank). */
  def pageRank(slice: GraphSlice, rts: Seq[String], tol: Double = 0.001): DataFrame = {
    val spark = slice.graph.spark
    import spark.implicits._
    val (g, verts) = toGraphX(slice, rts)
    val ranks = g.pageRank(tol).vertices.toDF("vid", "rank")
    ranks.join(verts, "vid").select(col("atom_id"), col("rank"))
  }

  /** Fixed-iteration PageRank as a pure DataFrame power iteration —
    * r_{k+1}(v) = reset + (1−reset) · Σ_{u→v} r_k(u)/outdeg(u), r_0 = 1.
    * The deterministic variant an INDEPENDENT engine can replay exactly
    * (which is what lets DuckDB oracle it with unrolled-iteration CTEs);
    * [[pageRank]] stays the GraphX tolerance-based convergence form.
    * Per iteration: one edges⋈ranks join + one keyed aggregate, chained
    * LAZILY into one plan (small iteration counts run as ONE job; a
    * checkpoint every 8 rounds bounds lineage for long runs — the
    * materialize-per-round variant spent its wall time scheduling jobs).
    * Edges into non-vertex endpoints are dropped (same ghost rule as
    * [[toGraphX]]); dangling vertices lose mass (the GraphX convention)
    * and isolated vertices settle at resetProb — they are appended as
    * constants rather than iterated. */
  def pageRankStatic(slice: GraphSlice, rts: Seq[String], iters: Int,
      resetProb: Double = 0.15): DataFrame = {
    require(iters >= 1, "pageRankStatic: iters >= 1")
    val atoms = slice.aliveAtoms
    // ONE slim checkpoint of everything the iteration needs (vertices +
    // candidate edges) — deriving verts and edges from separate eager
    // materializations ran the whole upstream encode/slice plan twice;
    // filters over this checkpoint are in-memory scans
    val base = atoms.filter(col("kind") =!= Kind.Relation ||
        col("atype").isInCollection(rts))
      .select(col("atom_id"), col("kind"), col("src_id"), col("dst_id"))
      .localCheckpoint(true)
    val verts = base.filter(col("kind") =!= Kind.Relation).select(col("atom_id"))
    val rawEdges = base.filter(col("kind") === Kind.Relation)
      .select(col("src_id"), col("dst_id"))
      .join(verts.withColumnRenamed("atom_id", "src_id"), Seq("src_id"), "left_semi")
      .join(verts.withColumnRenamed("atom_id", "dst_id"), Seq("dst_id"), "left_semi")
      .select(col("src_id"), col("dst_id"))
    val outdeg = rawEdges.groupBy(col("src_id")).agg(count(lit(1)).as("__d"))
    // cache the edge table PRE-PARTITIONED on the message key: every
    // iteration streams it through a shuffle-hash join against that
    // round's ranks, so the cached hash(src_id) layout makes the edge side
    // exchange-free in all rounds. Without this (and the hints below) the
    // planner broadcast the SAME cached table once per round — ~2 builds ×
    // iters of duplicate driver memory and build time, because exchange
    // canonicalization does not unify the per-round join subtrees.
    val edges = graft.core.TransientCaches.trackTable(
      rawEdges.join(outdeg, "src_id").repartition(col("src_id")).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // iterate ONLY edge-touching vertices: an isolated vertex receives no
    // message in any round, so its rank is exactly resetProb from round 1
    // — re-materializing the (much larger, AE-heavy) full vertex set per
    // checkpointed round paid ~5× the data motion for constants
    val active = edges.select(col("src_id").as("atom_id"))
      .unionByName(edges.select(col("dst_id").as("atom_id")))
      .distinct().localCheckpoint(true)
    // rounds CHAIN LAZILY into one plan — a handful of join+agg layers is
    // exactly what Catalyst handles well, and one job beats one
    // materialization job PER round (the eager-checkpoint variant spent
    // its time scheduling, not computing). Long runs bound their lineage
    // with a checkpoint every 8 rounds.
    var ranks = active.withColumn("rank", lit(1.0))
    var it = 0
    while (it < iters) {
      // shuffle_hash hints on the PER-ROUND sides (ranks, msgs): the rank
      // frame changes every round so no broadcast could ever be reused —
      // hinting the hash build onto it keeps the invariant edge/active
      // caches as zero-exchange stream sides and caps per-round cost at
      // the inherent vertex-sized shuffle (scale-safe where per-round
      // broadcasts of a vertex-sized frame are not)
      val msgs = edges
        .join(ranks.withColumnRenamed("atom_id", "src_id").hint("shuffle_hash"),
          "src_id")
        .groupBy(col("dst_id").as("atom_id"))
        .agg(sum(col("rank") / col("__d")).as("__msg"))
      ranks = active.join(msgs.hint("shuffle_hash"), Seq("atom_id"), "left")
        .select(col("atom_id"),
          (lit(resetProb) + lit(1.0 - resetProb) *
            coalesce(col("__msg"), lit(0.0))).as("rank"))
      it += 1
      if (it % 8 == 0 && it < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks.unionByName(
      verts.join(active, Seq("atom_id"), "left_anti")
        .withColumn("rank", lit(resetProb)))
  }

  /** Hop distances to the given landmark atoms over the given relation
    * types — GraphX ShortestPaths (BFS pregel; distances follow out-edges,
    * `directed = false` symmetrizes first). Returns (atom_id, landmark,
    * dist); unreachable atoms are absent. */
  def shortestHops(slice: GraphSlice, rts: Seq[String],
      landmarks: Seq[String], directed: Boolean = false): DataFrame = {
    val spark = slice.graph.spark
    import spark.implicits._
    val (g0, verts) = toGraphX(slice, rts)
    val g = if (directed) g0
      else XGraph(g0.vertices,
        g0.edges.union(g0.edges.map(e => Edge(e.dstId, e.srcId, e.attr))))
    val lmMap = verts.filter(col("atom_id").isInCollection(landmarks))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    require(lmMap.size == landmarks.distinct.size,
      s"unknown landmark(s): ${landmarks.diff(lmMap.values.toSeq).mkString(", ")}")
    val res = org.apache.spark.graphx.lib.ShortestPaths
      .run(g, lmMap.keys.toSeq)
    val bc = spark.sparkContext.broadcast(lmMap)
    res.vertices
      .flatMap { case (vid, m) =>
        m.map { case (l, d) => (vid, bc.value(l), d) } }
      .toDF("vid", "landmark", "dist")
      .join(verts, "vid")
      .select(col("atom_id"), col("landmark"), col("dist"))
  }

  /** Community detection via label propagation over the given relation
    * types (messages flow both directions — undirected semantics). Returns
    * (atom_id, community) where community is the converged label's atom_id.
    *
    * DETERMINISTIC ties: GraphX's stock LabelPropagation breaks
    * equal-count label ties by message-map ITERATION order (Map.maxBy,
    * verified in the 4.1.2 bytecode), which varies with partitioning — a
    * vertex pulled equally by two communities could flip between runs.
    * This is the same Pregel shape with the one rule pinned: max count,
    * then MINIMUM label (vertex ids are xxhash64(atom_id), so the
    * tie-break is a pure function of the graph, never of partitioning). */
  def communities(slice: GraphSlice, rts: Seq[String],
      steps: Int = 5): DataFrame = {
    val spark = slice.graph.spark
    import spark.implicits._
    import org.apache.spark.graphx._
    val (g, verts) = toGraphX(slice, rts)
    val lpaGraph = g.mapVertices { case (vid, _) => vid }
    val labels = Pregel(lpaGraph,
        initialMsg = Map.empty[VertexId, Long],
        maxIterations = steps)(
      vprog = (_, attr, msg) =>
        if (msg.isEmpty) attr
        else {
          val top = msg.values.max
          msg.collect { case (l, c) if c == top => l }.min
        },
      sendMsg = e => Iterator(
        (e.srcId, Map(e.dstAttr -> 1L)), (e.dstId, Map(e.srcAttr -> 1L))),
      mergeMsg = (a, b) => (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
    labels.vertices.toDF("vid", "label")
      .join(verts, "vid")
      .join(verts.select(col("vid").as("label"),
        col("atom_id").as("community")), "label")
      .select(col("atom_id"), col("community"))
  }

  /** Per-atom triangle membership counts over the given relation types
    * (undirected; GraphX canonicalizes orientation and dedups edges
    * internally). The local clustering signal for community/quality
    * analysis. */
  def triangleCounts(slice: GraphSlice, rts: Seq[String]): DataFrame = {
    val spark = slice.graph.spark
    import spark.implicits._
    val (g, verts) = toGraphX(slice, rts)
    g.partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount()
      .vertices.toDF("vid", "triangles")
      .join(verts, "vid")
      .select(col("atom_id"), col("triangles"))
  }

  /** Connected components over candidate-duplicate PAIRS — the clustering
    * stage of scale-out dedup (SURVEY §2.12: "blocking + pairwise predicate
    * join + connected components"). Input (id_a, id_b) long pairs; output
    * (id, cluster_id) where cluster_id = min id in the component. */
  def dedupClusters(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // plan-time type check, task-time null check: a string atom-id column
    // (the graph's native id type) or an outer-join null used to surface
    // as an opaque executor NPE from Row.getLong deep inside a GraphX
    // task, with no hint the INPUT was wrong (corpusDedup rejects string
    // ids at its own boundary with this same message shape)
    Seq("id_a", "id_b").foreach { c =>
      pairs.schema(c).dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => ()
        case other => throw new IllegalArgumentException(
          s"dedupClusters: pair column '$c' is $other; the GraphX stage " +
            "requires integral ids — map string ids to a surrogate first")
      }
    }
    // materialize the pair set ONCE before GraphX touches it: Pregel
    // re-evaluates its input RDDs across iterations, and a live Catalyst
    // lineage (join/union trees upstream) does not guarantee a STABLE
    // partition count across evaluations — GraphX zips vertex partitions
    // internally and dies with "Can't zip RDDs with unequal numbers of
    // partitions" when two evaluations disagree (surfaced by corpusDedup's
    // union-shaped exact stage under AQE-off planning). The checkpointed
    // pair set is candidate-sized and pins the partitioning.
    val stable = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .repartition(col("id_a"), col("id_b")) // one candidate-sized exchange
      // pins ALL downstream partition counts to
      // spark.sql.shuffle.partitions — without it the pair plan's tail can
      // surface with a different count than the shuffles inside GraphX's
      // vertex build. Hash on BOTH endpoints: any deterministic exchange
      // pins the count equally, but a single-endpoint key funnels every
      // pair touching a high-degree hub (common in dedup candidate graphs)
      // into one partition of the eager checkpoint
      .localCheckpoint(true)
    val edges = stable.rdd.map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          "dedupClusters: null id in candidate pair — filter join misses " +
            "before clustering")
        Edge(r.getLong(0), r.getLong(1), ())
      }
    val verts = stable.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().rdd.map { r =>
        require(!r.isNullAt(0),
          "dedupClusters: null id in candidate pair — filter join misses " +
            "before clustering")
        (r.getLong(0), r.getLong(0))
      }
    val g = XGraph(verts, edges)
    // GraphX connectedComponents labels each vertex with the min VertexId
    g.connectedComponents().vertices.toDF("id", "cluster_id")
  }
}
