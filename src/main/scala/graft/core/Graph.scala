package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The eternal graph: all atoms/values/txs across all time slices.
  *
  * Reads never mutate; a [[GraphSlice]] is a pure view parameterized by a
  * slice number — zef's GraphSlice/reference-frame concept
  * (`python/zef/core/graph_slice.py:24-74`) — so time travel is a parameter
  * change, zero data movement (SURVEY §2.2, §4.2).
  */
final case class Graph(atoms: DataFrame, values: DataFrame, txs: DataFrame,
    tags: DataFrame, uniqueValuesThrough: Int = -1,
    /** Scheme-id field-resolution bound (r18): for every frame at slice ≤
      * this bound, (a) every field AE carrying a value visible in the frame
      * has a PLAIN scheme id `ae:rt/<ownerId>` (no `#instance` / `[pos]`
      * forms), and (b) the AE and its owning `rel:rt/<ownerId>` relation are
      * alive in the frame iff the AE has a visible value. Under the bound,
      * field resolution can read the latest-values table alone — owner and
      * type recovered from the id prefix — skipping the relation-atoms scan
      * and join entirely, and `fields()` can resolve without its pivoted
      * max_by (which falls back to SortAggregate: string/struct aggregation
      * buffers are not hash-aggregable). Set by GraphEncoder (all field AEs
      * plain, everything born alive); PRESERVED by append-only plain writes
      * (bulk field assignment, plain-field transacts) because later slices
      * are invisible to frames ≤ bound; CLAMPED to the pre-tx maxSlice by
      * any transact that terminates atoms or adds instanced fields (frames
      * from that slice on must take the general relation-join path). -1 =
      * never (foreign/merged/loaded graphs default conservative). */
    plainFieldAesThrough: Int = -1) {

  def spark: SparkSession = atoms.sparkSession

  /** Latest slice — zef `now` (impl.py:4848). One tiny agg over txs,
    * cached per Graph instance: the Graph is immutable (every transact
    * returns a NEW Graph), so the answer can never go stale, and caching
    * removes one Spark job from every `g.now` query. */
  lazy val maxSlice: Int = {
    val r = txs.agg(max("tx_id")).collect()(0)
    if (r.isNullAt(0)) 0 else r.getInt(0)
  }

  def now: GraphSlice = GraphSlice(this, maxSlice)

  /** Latest typed value per AE as of `slice` — THE hot derived table of
    * the as-of read path: every `field()`/`fields()` resolution reduces to
    * a join against it. Computed once per (graph instance, slice) and kept
    * persisted (the session-cached current-values table of SURVEY §7.4 /
    * BASELINE.md): graphs are immutable, so entries can never go stale,
    * and a transact produces a NEW instance with an empty cache. Includes
    * the winning tx_slice so consumers can still tie-break multi-AE
    * fields. */
  def latestValues(slice: Int): DataFrame = latestValuesCache.synchronized {
    val hit = latestValuesCache.get(slice) // LinkedHashMap access refreshes LRU order
    if (hit != null) hit
    else {
      val vcols = FieldIndex.vcols // ONE typed-column list, declared once
      val plan =
        if (slice <= uniqueValuesThrough)
          // Single-assignment fast path: a bulk-encoded graph carries AT
          // MOST ONE value row per AE ([[uniqueValuesThrough]] — the
          // guarantee is append-only-stable: later transacts only add rows
          // at later slices, and any subset of a unique set is unique), so
          // "latest value per AE as of `slice`" is just a filter — no
          // aggregate, no sort, no shuffle in the build. At 100 TB this is
          // the difference between reading the values table and globally
          // sorting it before every cold as-of frame. Still persisted
          // below: downstream field joins read this frame several times
          // per query, and an unpinned version gets re-broadcast at every
          // join site instead of scanned from the one cached build.
          values.filter(col("tx_slice") <= slice)
            .select((Seq("ae_id", "tx_slice") ++ vcols).map(col): _*)
        else
          values.filter(col("tx_slice") <= slice)
            .groupBy("ae_id")
            .agg(max_by(struct((Seq("tx_slice") ++ vcols).map(col): _*),
              col("tx_slice")).as("__v"))
            .select(col("ae_id") +:
              (Seq("tx_slice") ++ vcols).map(c => col(s"__v.$c").as(c)): _*)
      val df = plan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      latestValuesCache.put(slice, df)
      TransientCaches.trackGraph(this)
      df
    }
  }

  /** Bounded LRU of persisted [[latestValues]] tables. Entries never go
    * STALE (graphs are immutable; a transact returns a fresh instance with
    * an empty cache) but they do pin memory: a session that time-travels
    * across many frames would otherwise keep one aggregated table per
    * visited slice alive forever. Policy: the [[Graph.MaxCachedSlices]]
    * most recently USED slices stay persisted; older ones are unpersisted
    * on eviction and rebuilt on demand. */
  @transient private lazy val latestValuesCache =
    new java.util.LinkedHashMap[Int, DataFrame](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, DataFrame]): Boolean = {
        val evict = size() > Graph.MaxCachedSlices
        // only unpersist tables THIS graph pinned: a borrowed seed (the
        // prior frame's table, passed by reference for a no-new-values tx)
        // is still the parent graph's live cache. The bookkeeping must
        // leave WITH the entry: a later on-demand rebuild of this slice
        // is an OWNED fresh aggregate — a stale borrowed flag would make
        // it unevictable forever, and a stale seeded depth would
        // misreport lineage for a depth-0 rebuild.
        if (evict) {
          if (!borrowedSeeds.contains(e.getKey)) e.getValue.unpersist(false)
          borrowedSeeds -= e.getKey
          seededDepth -= e.getKey
        }
        evict
      }
    }

  /** Slices whose cached table is a BORROWED reference to another graph's
    * cache entry (seeded with owned=false) — never unpersisted here. */
  @transient private lazy val borrowedSeeds =
    scala.collection.mutable.Set.empty[Int]

  private[core] def cachedLatestValues(slice: Int): Option[DataFrame] =
    latestValuesCache.synchronized(Option(latestValuesCache.get(slice)))

  /** Lineage depth of a SEEDED latest-values table: how many incremental
    * merge layers sit between it and a fresh aggregation. Transactor caps
    * this so an unboundedly long transact chain falls back to one fresh
    * aggregation instead of an ever-deeper filter/union plan. */
  @transient private lazy val seededDepth =
    scala.collection.mutable.Map.empty[Int, Int]

  private[graft] def latestValuesDepth(slice: Int): Int =
    latestValuesCache.synchronized(seededDepth.getOrElse(slice, 0))

  /** Pre-populate the cache (incremental view maintenance — see
    * Transactor.transact): no-op if an entry already exists. `owned=false`
    * marks a table passed by REFERENCE from another graph's cache (the
    * no-new-values tx case): it is served from here but never unpersisted
    * by this instance's eviction or [[releaseDerived]]. */
  private[core] def seedLatestValues(slice: Int, df: DataFrame,
      depth: Int = 1, owned: Boolean = true): Unit =
    latestValuesCache.synchronized {
      if (latestValuesCache.get(slice) == null) {
        latestValuesCache.put(slice, df)
        seededDepth(slice) = depth
        if (!owned) borrowedSeeds += slice
        TransientCaches.trackGraph(this)
      }
    }

  /** The cache's current tables, by reference — lets [[TransientCaches]]
    * protect tables a SHARED graph serves via a borrowed seed from being
    * unpersisted through their OWNING (non-shared) parent's release. */
  private[graft] def cachedTables: Seq[DataFrame] =
    latestValuesCache.synchronized {
      import scala.jdk.CollectionConverters._
      latestValuesCache.values().asScala.toVector
    }

  /** Unpersist every derived table this instance pinned — for graphs that
    * turn out to be throwaway (the tentative frame of a hooked mutation:
    * GqlApi.commitWithHooks discards it after hooks run, and without this
    * its seeded latest-values block lingers until the ContextCleaner GCs
    * the abandoned instance). */
  def releaseDerived(): Unit =
    releaseDerived(java.util.Collections.emptySet[DataFrame]())

  /** Release variant that spares `protect`ed tables (identity set): a
    * no-new-values transact seeds the child's cache with the PARENT's
    * owned table by reference, so when only the child is marked shared,
    * releasing the parent must not unpersist the table the shared child
    * still serves. The entry still leaves this cache (a later use
    * re-aggregates fresh); the table itself stays persisted. */
  private[core] def releaseDerived(protect: java.util.Set[DataFrame]): Unit =
    latestValuesCache.synchronized {
      val it = latestValuesCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (!borrowedSeeds.contains(e.getKey) && !protect.contains(e.getValue))
          e.getValue.unpersist(false)
      }
      latestValuesCache.clear()
      seededDepth.clear()
      borrowedSeeds.clear()
    }

  private[graft] def hasCachedLatestValues(slice: Int): Boolean =
    latestValuesCache.synchronized(latestValuesCache.containsKey(slice))

  /** Absolute frame — zef `to_frame`/`at`. */
  def at(slice: Int): GraphSlice = GraphSlice(this, slice)

  /** Time → slice resolution: last tx at-or-before t — zef `to_graph_slice`
    * (graph_slice.py:53-72). */
  def at(t: java.sql.Timestamp): GraphSlice = {
    val r = txs.filter(col("ts") <= lit(t)).agg(max("tx_id")).collect()(0)
    GraphSlice(this, if (r.isNullAt(0)) 0 else r.getInt(0))
  }

  /** Delegate-level schema summary — zef `blueprint` (impl.py:9225): the
    * observed schema as (kind, atype) counts, relations annotated with
    * endpoint types via self-joins on the atoms table. */
  def blueprint: DataFrame = {
    // interval-row dedup: a terminate-then-reinstantiate atom carries one
    // row per lifetime; the schema summary counts ATOMS, and a duplicated
    // endpoint row would also fan the relation join out
    val a = atoms.select(col("atom_id"), col("kind"), col("atype"),
      col("src_id"), col("dst_id")).distinct()
    val ends = a.select(col("atom_id"), col("atype").as("end_type"))
    a.filter(col("kind") === Kind.Relation)
      .join(ends.withColumnRenamed("end_type", "src_type")
        .withColumnRenamed("atom_id", "src_id"), Seq("src_id"), "left")
      .join(ends.withColumnRenamed("end_type", "dst_type")
        .withColumnRenamed("atom_id", "dst_id"), Seq("dst_id"), "left")
      .groupBy(col("atype"), col("src_type"), col("dst_type"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .unionByName(
        a.filter(col("kind") =!= Kind.Relation)
          .groupBy(col("atype"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
          .withColumn("src_type", lit(null).cast("string"))
          .withColumn("dst_type", lit(null).cast("string")))
  }

  /** Observed-schema registry (SURVEY §1.3: token → observed cardinalities/
    * types): the delegate meta-layer with cardinality inference — per
    * (relation type, src type, dst type): instance count and whether the
    * out-degree is everywhere ≤1 (i.e. `Out[rt]` is safe vs `Outs[rt]`).
    * Derived, never materialized as delegate atoms (SURVEY §7.4). */
  def schemaRegistry: DataFrame = {
    // interval-row dedup, same reason as blueprint: counts and the
    // unique_out inference are per ATOM — a re-instantiated endpoint or
    // relation would otherwise inflate n and flip unique_out to false
    // for a genuinely unique relation (yo dedups identically)
    val ends = atoms.select(col("atom_id"), col("atype").as("t"),
      col("kind").as("k")).distinct()
    val rels = atoms.filter(col("kind") === Kind.Relation)
      .select(col("atom_id"), col("atype"), col("src_id"), col("dst_id"))
      .distinct()
      .join(ends.select(col("atom_id").as("src_id"), col("t").as("src_type"),
        col("k").as("src_kind")), Seq("src_id"), "left")
      .join(ends.select(col("atom_id").as("dst_id"), col("t").as("dst_type"),
        col("k").as("dst_kind")), Seq("dst_id"), "left")
    val grouped = rels
      .groupBy(col("atype"), col("src_type"), col("dst_type"), col("dst_kind"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("src_id")).as("n_sources"))
    // unique_out answers "is Out[rt] safe from this src type" — the
    // degree counts EVERY rt edge a source has, ACROSS target types: a
    // Person with Knows→Person and Knows→Company edges has out-degree 2
    // even though each per-target group reads one-edge-per-source, and
    // the per-group flag would misreport Out as safe (assertUnique then
    // throws at traversal time)
    val perSrc = rels.groupBy(col("atype"), col("src_type"))
      .agg((count(lit(1)) === countDistinct(col("src_id"))).as("unique_out"))
    // null-SAFE join on src_type: a relation whose source endpoint is
    // missing from atoms (merged/hand-built graphs — hardened elsewhere)
    // groups under src_type null on BOTH sides; an equi-join would
    // silently drop those rows from the report
    grouped.join(perSrc.withColumnRenamed("atype", "__pt")
        .withColumnRenamed("src_type", "__ps"),
        col("atype") === col("__pt") && col("src_type") <=> col("__ps"))
      .drop("__pt", "__ps")
      .withColumn("is_field", col("dst_kind") === Kind.AttributeEntity)
      .drop("dst_kind")
  }

  /** Instantiated/terminated/assigned events in a slice range — zef
    * `events[...]` (impl.py:5168). The event representation is derived from
    * the interval columns + value rows; no separate event log needed. */
  def events(fromSlice: Int, toSlice: Int): DataFrame = {
    val inst = atoms
      .filter(col("inst_slice").between(fromSlice, toSlice))
      .select(col("atom_id"), col("inst_slice").as("tx_slice"),
        lit("instantiated").as("event"))
    val term = atoms
      .filter(col("term_slice").between(fromSlice, toSlice))
      .select(col("atom_id"), col("term_slice").as("tx_slice"),
        lit("terminated").as("event"))
    val assigned = values
      .filter(col("tx_slice").between(fromSlice, toSlice))
      .select(col("ae_id").as("atom_id"), col("tx_slice"),
        lit("assigned").as("event"))
    inst.unionByName(term).unionByName(assigned)
  }
}

object Graph {

  /** How many slices' [[Graph.latestValues]] tables stay persisted per graph
    * instance (LRU). 2 covers the dominant access pattern — `now` plus one
    * historical frame under comparison (time_travel diffs) — without letting
    * a frame-hopping session pin unbounded derived tables. */
  val MaxCachedSlices: Int = 2

  /** How many incremental latest-values merge layers may stack before a
    * transact stops seeding and lets the next read re-aggregate fresh
    * (bounds plan lineage in long transact chains — see
    * [[Transactor.transact]]). */
  val MaxSeedDepth: Int = 12

  /** Back-compat constructor: graph without tag bindings. */
  def apply(atoms: DataFrame, values: DataFrame, txs: DataFrame): Graph =
    Graph(atoms, values, txs, emptyTags(atoms.sparkSession))

  private def emptyTags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[TagRow].toDF()
  }

  /** Union two graphs (e.g. a bulk-load snapshot + an event-history stream).
    * Identity of shared atoms is by atom_id — the cross-graph merge
    * semantics of zef's EternalUID (`core/include/uids.h`); see
    * [[mergeByOrigin]] when local ids differ.
    *
    * Dedup is interval-row-granular, not atom-granular: a re-instantiated
    * atom legitimately carries several (atom_id, inst_slice) interval rows
    * and ALL must survive — deduping on atom_id alone would drop temporal
    * history nondeterministically. Where both graphs carry the same
    * interval with different closure knowledge (one open, one terminated),
    * the terminated row wins (more information), earliest termination
    * first for determinism. Values/tags dedup symmetrically so overlapping
    * graphs don't double-count assignment events in events(). */
  def merge(a: Graph, b: Graph): Graph = {
    val atomCols = a.atoms.columns.map(col)
    // full-row tiebreak behind the closure rank: two graphs carrying the
    // same open interval with DIVERGENT payloads (same atom_id +
    // inst_slice, different src/dst — fabricated histories) tied on the
    // bare coalesce() and kept a partition-order-dependent survivor, the
    // exact defect dedupBy below exists to prevent for the other tables
    val mergedAtoms = a.atoms.unionByName(b.atoms)
      .groupBy(col("atom_id"), col("inst_slice"))
      .agg(min_by(struct(atomCols: _*),
        struct(coalesce(col("term_slice"), lit(Int.MaxValue)).as("__t"),
          struct(atomCols: _*).as("__row"))).as("__r"))
      .select("__r.*")
    // DETERMINISTIC dedup for the other three tables: dropDuplicates on a
    // key subset keeps a partition-order-dependent survivor, so two
    // graphs carrying DIVERGENT same-key rows (same ae_id+slice,
    // different payload — fabricated overlapping histories) would merge
    // differently run to run. min_by over the full row struct picks the
    // least payload, every run, both sides agree.
    def dedupBy(df: DataFrame, keys: Seq[String]): DataFrame = {
      val cols = df.columns.map(col)
      df.groupBy(keys.map(col): _*)
        .agg(min_by(struct(cols: _*), struct(cols: _*)).as("__r"))
        .select("__r.*")
    }
    Graph(
      mergedAtoms,
      dedupBy(a.values.unionByName(b.values), Seq("ae_id", "tx_slice", "vtype")),
      dedupBy(a.txs.unionByName(b.txs), Seq("tx_id")),
      dedupBy(a.tags.unionByName(b.tags), Seq("tag", "tx_slice")))
  }

  /** Cross-graph merge by ETERNAL identity — zef's origin_uid semantics
    * (`python/zef/core/graph_delta.py:643`, `internals/merges.py`): two
    * graphs that encoded the same real-world atom under DIFFERENT local
    * atom_ids still merge to one surviving identity when their origin_uid
    * matches. `a` is the receiving graph: its local ids win; every
    * reference in `b` (relation endpoints, value assignments, tags) is
    * re-pointed to the surviving id, then the result is deduped like
    * [[merge]]. All re-pointing is equi-joins on the (usually small)
    * shared-identity map — no driver-side iteration. */
  def mergeByOrigin(a: Graph, b: Graph): Graph = {
    // one canonical local id per origin in the receiving graph
    val canonical = a.atoms.groupBy(col("origin_uid"))
      .agg(min(col("atom_id")).as("__a_id"))
    val bmap = b.atoms.select(col("atom_id").as("__b_id"), col("origin_uid"))
      .distinct()
      .join(canonical, "origin_uid")
      .filter(col("__b_id") =!= col("__a_id"))
      .select(col("__b_id"), col("__a_id"))
    def remap(df: DataFrame, c: String): DataFrame =
      df.join(bmap.withColumnRenamed("__b_id", c), Seq(c), "left")
        .withColumn(c, coalesce(col("__a_id"), col(c)))
        .drop("__a_id")
    val bAtoms = remap(remap(remap(b.atoms, "atom_id"), "src_id"), "dst_id")
    merge(a, Graph(bAtoms, remap(b.values, "ae_id"),
      b.txs, remap(b.tags, "atom_id")))
  }

  def empty(spark: SparkSession): Graph = {
    import spark.implicits._
    Graph(
      spark.emptyDataset[AtomRow].toDF(),
      spark.emptyDataset[ValueRow].toDF(),
      spark.emptyDataset[TxRow].toDF(),
      emptyTags(spark))
  }

  /** Validity predicate: atom alive in slice S (SURVEY §1.1 GraphSlice row). */
  def aliveAt(slice: Int): Column =
    col("inst_slice") <= slice &&
      (col("term_slice").isNull || col("term_slice") > slice)

  /** Known by slice S, possibly already terminated — zef `aware_of`
    * (impl.py:6885). */
  def awareAt(slice: Int): Column = col("inst_slice") <= slice
}

/** The graph in one reference frame. All traversals/scans below are as-of
  * this slice: every atom access composes the validity interval predicate —
  * the Spark analogue of zef's frame-carrying ZefRef.
  */
final case class GraphSlice(graph: Graph, slice: Int) {

  /** All alive atoms in this frame. The filter is a pushable predicate on
    * interval columns — at scale this prunes via (kind, atype) partitioning
    * plus parquet min/max on inst_slice. */
  def aliveAtoms: DataFrame = graph.atoms.filter(Graph.aliveAt(slice))

  /** zef `all[ET.X]` (impl.py:2048): type-pruned scan of alive entities. */
  def all(et: String): AtomSet =
    AtomSet(this, aliveAtoms.filter(col("kind") === Kind.Entity && col("atype") === et))

  /** zef `all[RT.X]` over relations. */
  def allRelations(rt: String): AtomSet =
    AtomSet(this, aliveAtoms.filter(col("kind") === Kind.Relation && col("atype") === rt))

  /** Relative time travel — zef `time_travel[n]` (impl.py:5493): pure slice
    * arithmetic, no data movement. */
  def timeTravel(delta: Int): GraphSlice = GraphSlice(graph, slice + delta)

  /** zef `select_by_field[rt][val]` (impl.py:6143) — THE indexed lookup the
    * reference added because filter-after-resolve was too slow
    * (benchmark_filter.py:24-31). Same inversion here, in plan form: the
    * value predicate is applied to the VALUES SCAN first (pushdown-able
    * column predicate; at rest this scan is further pruned by min/max +
    * bloom on the value columns), THEN the late assignments are resolved
    * as-of, then the tiny survivor set joins up to entities — instead of
    * resolving every entity's field and filtering last. */
  def selectByField(et: String, rt: String, vcol: String, value: Any): AtomSet = {
    // under the plain-scheme bound the rt-typing predicate rides the values
    // SCAN as a pushable string-prefix filter (instead of arriving only at
    // the relation join): the as-of re-check below then runs over this
    // field's matches only, not every field whose value collides
    val rtPrune =
      if (slice <= graph.plainFieldAesThrough)
        col("ae_id").startsWith(s"ae:$rt/") else lit(true)
    val hits = graph.values
      .filter(col("tx_slice") <= slice && col(vcol) === lit(value) && rtPrune)
      .select(col("ae_id"), col("tx_slice"))
    // as-of check: the matching assignment must be the LATEST ≤ slice.
    // The aggregate runs over values SEMI-JOINED down to the hit AEs first,
    // so its cost is ∝ the lookup's selectivity (the hit set's history),
    // NOT the whole values table — a full-table groupBy here would make
    // every point lookup pay a 100 TB shuffle regardless of selectivity.
    val latest = graph.values.filter(col("tx_slice") <= slice)
      .join(hits.select("ae_id").distinct(), Seq("ae_id"), "left_semi")
      .groupBy("ae_id").agg(max(col("tx_slice")).as("__top"))
    val currentHits = hits.join(latest, "ae_id")
      .filter(col("tx_slice") === col("__top"))
      .select("ae_id").distinct()
    entitiesOwning(currentHits, et, rt)
  }

  /** Indexed `select_by_field` — probes a [[FieldIndex]] table instead of
    * scanning values: the rt partition-prunes the index directory, the
    * constant-folded vhash predicate skips row groups (files are
    * vhash-sorted), and only the surviving candidate AEs touch the values
    * table for the exact as-of re-check. Collisions/stale index entries
    * only widen the candidate set — the re-check keeps results identical
    * to [[selectByField]] (the reference's declared-index promise,
    * test_simplegql.py:50-60 + graph.h:223-226). */
  def selectByFieldIndexed(index: org.apache.spark.sql.DataFrame, et: String,
      rt: String, vcol: String, value: Any): AtomSet = {
    val cand = index.filter(col("rt") === rt &&
        col("vhash") === FieldIndex.vhashOf(vcol, value) && col("tx_slice") <= slice)
      .select("ae_id").distinct()
    val currentHits = graph.values.filter(col("tx_slice") <= slice)
      .join(cand, Seq("ae_id"), "left_semi")
      .groupBy("ae_id")
      .agg(max_by(col(vcol), col("tx_slice")).as("__cur"))
      .filter(col("__cur") === lit(value))
      .select("ae_id")
    entitiesOwning(currentHits, et, rt)
  }

  /** Shared tail of the select_by_field paths: current-hit AEs → alive
    * owning relations of type rt → alive entities of type et. */
  private def entitiesOwning(currentHits: DataFrame, et: String,
      rt: String): AtomSet = {
    // Scheme-id fast path ([[Graph.plainFieldAesThrough]]): under the bound
    // every hit AE is `ae:rt/<ownerId>` and its owning relation is alive,
    // so the owner id is a prefix strip — the relation-atoms scan+join is
    // pure re-derivation of what the id already says
    val owners =
      if (slice <= graph.plainFieldAesThrough) {
        // the prefix filter does the rt-typing the relation join did: the
        // hit set matched on VALUE alone and may contain other fields' AEs
        val p = s"ae:$rt/"
        currentHits.filter(col("ae_id").startsWith(p))
          .select(col("ae_id")
            .substr(lit(p.length + 1), lit(Int.MaxValue)).as("atom_id"))
      } else graph.atoms.filter(
        col("kind") === Kind.Relation && col("atype") === rt && Graph.aliveAt(slice))
        .join(currentHits.withColumnRenamed("ae_id", "dst_id"), "dst_id")
        .select(col("src_id").as("atom_id"))
    // LEFT SEMI: an entity owning SEVERAL matching field instances (two
    // instanced AEs both equal to the probe) must appear once, not fan
    // out every downstream join — the semi join dedups without the extra
    // exchange a distinct() would add
    AtomSet(this, graph.atoms.filter(
      col("kind") === Kind.Entity && col("atype") === et && Graph.aliveAt(slice))
      .join(owners, Seq("atom_id"), "left_semi"))
  }

  /** Tag lookup `g[tag]` as of this frame (zef tag resolution,
    * blobs.h:314-330): latest binding ≤ slice; tombstoned or never-bound →
    * empty set. */
  def byTag(tag: String): AtomSet = {
    // tie key beyond tx_slice: the WRITER dedups tag wishes per tx
    // (Transactor's last-wish-wins, as for values), so same-slice
    // duplicates shouldn't exist — but a merged/hand-built graph can
    // carry them, and a bare max_by(_, tx_slice) then picks a
    // partition-order-dependent winner on every cold read. Canonical
    // rule for such rows: the tombstone outranks a binding (the tag
    // reads unbound — conservative), two bindings break on max atom_id.
    val latest = graph.tags
      .filter(col("tag") === tag && col("tx_slice") <= slice)
      .groupBy(col("tag"))
      .agg(max_by(col("atom_id"),
        struct(col("tx_slice"),
          when(col("atom_id").isNull, 1).otherwise(0).as("__tomb"),
          coalesce(col("atom_id"), lit("")).as("__id"))).as("atom_id"))
      .filter(col("atom_id").isNotNull)
      .select("atom_id")
    AtomSet(this, graph.atoms.filter(Graph.aliveAt(slice)).join(latest, "atom_id"))
  }

  private[core] def aliveRelations(rt: String): DataFrame =
    graph.atoms.filter(
      col("kind") === Kind.Relation && col("atype") === rt && Graph.aliveAt(slice))
}

/** A set of atoms within a frame — the plural ZefRef. Traversals are
  * equi-joins against the relation atoms of the same frame (SURVEY §2.1:
  * "graph traversal *is* zef's join").
  *
  * Scale notes: each hop is join(relations on src/dst) + join(atoms on id).
  * With atoms bucketed by atom_id both joins are co-partitioned; small
  * frontier sets broadcast automatically under AQE.
  */
final case class AtomSet(frame: GraphSlice, df: DataFrame) {

  private def atoms = frame.graph.atoms
  private def spark = frame.graph.spark

  private def hop(rt: String, fromCol: String, toCol: String): DataFrame =
    df.select(col("atom_id").as("__from"))
      .join(frame.aliveRelations(rt).select(
        col(fromCol).as("__from"), col(toCol).as("__to")), "__from")

  private def resolve(ids: DataFrame): AtomSet =
    AtomSet(frame,
      atoms.filter(Graph.aliveAt(frame.slice))
        .join(ids.select(col("__to").as("atom_id")).distinct(), "atom_id"))

  /** zef `Outs[rt]` (impl.py:6334): all targets of outgoing rt. */
  def outs(rt: String): AtomSet = resolve(hop(rt, "src_id", "dst_id"))

  /** Provenance-preserving `Outs[rt]`: the target atoms PLUS a column naming
    * the source atom each was reached from. One relations scan, one join —
    * downstream per-source aggregations need no second relation join to
    * recover who pointed at what (the zef pipeline keeps provenance by
    * carrying the originating ZefRef; a plain `outs` drops it). */
  def outsWithSource(rt: String, srcCol: String = "src_atom_id"): AtomSet = {
    val pairs = hop(rt, "src_id", "dst_id")
      .select(col("__to").as("atom_id"), col("__from").as(srcCol))
    AtomSet(frame,
      atoms.filter(Graph.aliveAt(frame.slice)).join(pairs, "atom_id"))
  }

  def insWithSource(rt: String, srcCol: String = "src_atom_id"): AtomSet = {
    val pairs = hop(rt, "dst_id", "src_id")
      .select(col("__to").as("atom_id"), col("__from").as(srcCol))
    AtomSet(frame,
      atoms.filter(Graph.aliveAt(frame.slice)).join(pairs, "atom_id"))
  }

  /** zef `Ins[rt]` (impl.py:6397): all sources of incoming rt. */
  def ins(rt: String): AtomSet = resolve(hop(rt, "dst_id", "src_id"))

  /** zef `Out[rt]` (impl.py:6288): unique hop; error if any source has 0
    * or >1 outgoing rt. Cardinality is asserted distributed (one agg),
    * not per-row on the driver. */
  def out(rt: String): AtomSet = { assertUnique(rt, "src_id"); outs(rt) }

  /** zef `In[rt]` (impl.py:6363). */
  def in(rt: String): AtomSet = { assertUnique(rt, "dst_id"); ins(rt) }

  private def assertUnique(rt: String, endCol: String): Unit = {
    val degrees = frame.aliveRelations(rt)
      .groupBy(col(endCol).as("__from"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    val bad = df.select(col("atom_id").as("__from"))
      .join(degrees, Seq("__from"), "left")
      .filter(col("n").isNull || col("n") =!= 1)
      .limit(1).count()
    require(bad == 0, s"traversal '$rt' is not unique (some atom has 0 or >1)")
  }

  /** zef `out_rels[rt]` (impl.py:6512): step onto the relation atoms
    * themselves — relations are first-class and can be traversed onward. */
  def outRels(rt: String): AtomSet =
    AtomSet(frame, frame.aliveRelations(rt)
      .join(df.select(col("atom_id").as("src_id")), "src_id"))

  def inRels(rt: String): AtomSet =
    AtomSet(frame, frame.aliveRelations(rt)
      .join(df.select(col("atom_id").as("dst_id")), "dst_id"))

  /** zef `source`/`target` (impl.py:6667): endpoints of relation atoms. */
  def sources: AtomSet =
    resolve(df.filter(col("kind") === Kind.Relation).select(col("src_id").as("__to")))
  def targets: AtomSet =
    resolve(df.filter(col("kind") === Kind.Relation).select(col("dst_id").as("__to")))

  /** zef `ins_and_outs` (impl.py:6426): neighbors in both directions. */
  def insAndOuts(rt: String): AtomSet =
    resolve(hop(rt, "src_id", "dst_id").unionByName(hop(rt, "dst_id", "src_id")))

  /** zef `relations(z1, rt, z2)` / `has_relation` (impl.py:7012, 7005): the
    * relation atoms running from this set to `other`. Semi-joins on both
    * endpoints; emptiness = has_relation false. */
  def relationsTo(other: AtomSet, rt: String): AtomSet =
    AtomSet(frame, frame.aliveRelations(rt)
      .join(df.select(col("atom_id").as("src_id")), Seq("src_id"), "left_semi")
      .join(other.df.select(col("atom_id").as("dst_id")), Seq("dst_id"), "left_semi"))

  /** zef `has_out[rt]` as a set filter (impl.py:5728): left-semi join. */
  def hasOut(rt: String): AtomSet =
    AtomSet(frame, df.join(
      frame.aliveRelations(rt).select(col("src_id").as("atom_id")),
      Seq("atom_id"), "left_semi"))

  def hasIn(rt: String): AtomSet =
    AtomSet(frame, df.join(
      frame.aliveRelations(rt).select(col("dst_id").as("atom_id")),
      Seq("atom_id"), "left_semi"))

  /** zef `field[rt] | value` (impl.py:9295, 6701): for each atom, the value
    * of its rt-attribute as of this frame.
    *
    * As-of resolution is a single partial-aggregable `max_by(value, tx_slice)`
    * over assignments ≤ S — no window over full history, no per-row lookups
    * (SURVEY §7.4 "as-of value semantics at scale").
    * Returns all non-core columns carried on this set (e.g. the provenance
    * column from `outsWithSource`) plus atom_id and the typed value columns
    * (v_str, v_long, v_double, v_bool, v_ts).
    */
  def field(rt: String): DataFrame = {
    val carried = df.columns.filterNot(Schema.atomCols.contains)
    // Scheme-id fast path ([[Graph.plainFieldAesThrough]]): under the bound
    // every visible rt-AE is `ae:rt/<owner>` with its relation alive iff the
    // value is visible, so the owner is a prefix strip of the ae_id — no
    // relation scan, no ae_id join. One latest-values read, one join.
    if (frame.slice <= frame.graph.plainFieldAesThrough) {
      val p = s"ae:$rt/"
      val latest = frame.graph.latestValues(frame.slice)
        .filter(col("ae_id").startsWith(p))
        .withColumn("atom_id",
          col("ae_id").substr(lit(p.length + 1), lit(Int.MaxValue)))
        .drop("ae_id", "tx_slice")
      df.select((col("atom_id") +: carried.map(col)): _*)
        .join(latest, "atom_id")
    } else {
      val rels = frame.aliveRelations(rt)
        .select(col("src_id").as("atom_id"), col("dst_id").as("ae_id"))
      // as-of resolution reads the session-cached current-values table —
      // the aggregate runs once per (graph, slice), every field access after
      // the first is a pure join
      val latest = AtomSet.pruneToFields(frame, Seq(rt)).drop("tx_slice")
      df.select((col("atom_id") +: carried.map(col)): _*)
        .join(rels, "atom_id").join(latest, "ae_id")
        .drop("ae_id")
    }
  }

  /** zef `gather[rules]` (impl.py:9800): bounded BFS collecting the
    * reachable subgraph along the given relation types (both directions),
    * relation atoms included. Iterative frontier joins — each step is one
    * distributed join round; the loop is driver-side but bounded by
    * maxSteps and stops early on an empty frontier (one cheap count per
    * step, the unavoidable BFS synchronization point). */
  def gather(rts: Seq[String], maxSteps: Int): AtomSet = {
    // seed ids are caller-bounded small; eager checkpoint so the seed's
    // defining subtree (often a full-atom-table filter) is computed once
    // instead of once per branch that references visited/frontier (step-1
    // join, anti-join, final union all re-derive it otherwise)
    var visited = df.select("atom_id").localCheckpoint(true)
    var frontier = visited
    var relIds = spark.emptyDataFrame.select(lit("").as("atom_id")).limit(0)
    var step = 0
    var done = false
    // cache hygiene (was: a persist per step, never freed — pinned one
    // frontier in executor storage per BFS step for the session): frontiers
    // are still persisted while the loop runs (each is read by the next
    // step's two joins + the emptiness check + the final union), but the
    // final id set is materialized with an EAGER localCheckpoint — lineage
    // truncates there, so every frontier cache can be dropped before
    // returning. Storage after gather(): one small checkpointed id list,
    // auto-cleaned by the ContextCleaner when the result is released.
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // one relations view for ALL requested types (single isin filter),
    // materialized BIDIRECTIONALLY (src→dst and dst→src stacked) so each
    // BFS step is ONE join instead of an out-join + in-join + union —
    // halves the per-step stage count for the cost of one extra copy of a
    // 3-column view. Persisted for the loop's lifetime: every step's join
    // re-reads it (2 × maxSteps scans of the full atoms table otherwise —
    // the filter keeps only the named relation types, a small fraction of
    // the graph)
    val relsOneWay = frame.graph.atoms.filter(
      col("kind") === Kind.Relation && col("atype").isInCollection(rts) &&
        Graph.aliveAt(frame.slice))
      .select(col("atom_id"), col("src_id"), col("dst_id"))
    val rels = relsOneWay
      .select(col("atom_id").as("rel_id"), col("src_id").as("from_id"),
        col("dst_id").as("next_id"))
      .unionByName(relsOneWay
        .select(col("atom_id").as("rel_id"), col("dst_id").as("from_id"),
          col("src_id").as("next_id")))
      .persist()
    persisted += rels
    // BFS frontiers are usually tiny relative to the relation table, and
    // their size is KNOWN (seed count here, next.count() per step) — so
    // broadcast them and the per-step joins become map-side over the
    // in-place rels scan, zero shuffles per hop. Frontiers past the bound
    // fall back to shuffle joins, the right plan when a hop genuinely
    // explodes (same adaptive dispatch as NestedInfer's rule scan).
    val bcLimit = 5000000L
    // seeds are broadcastable by contract (gather = bounded neighborhood
    // exploration from a caller-bounded set); later frontiers re-decide
    // from the per-step count that the early-stop check pays for anyway
    var frontierSmall = true
    def fhint(f: DataFrame): DataFrame =
      if (frontierSmall) broadcast(f) else f
    while (step < maxSteps && !done) {
      val hops = rels
        .join(fhint(frontier.withColumnRenamed("atom_id", "from_id")),
          "from_id")
        .select(col("rel_id"), col("next_id"))
      // dedup only the next frontier (keeps joins small); the running
      // visited/rel unions stay dup-tolerant and are distinct'd ONCE at
      // the end — anti-joins don't need distinct inputs, and a distinct
      // per step would add two shuffles per hop
      relIds = relIds.unionByName(hops.select(col("rel_id").as("atom_id")))
      val next = hops.select(col("next_id").as("atom_id")).distinct()
        .join(visited, Seq("atom_id"), "left_anti")
      step += 1
      // early-stop action only when another iteration would follow — the
      // last step's emptiness check would be a wasted job; the same count
      // also drives the next step's broadcast-vs-shuffle dispatch
      if (step < maxSteps) {
        next.persist(); persisted += next
        val n = next.count()
        done = n == 0
        frontierSmall = n <= bcLimit
      }
      visited = visited.unionByName(next)
      frontier = next
    }
    // eager materialization truncates lineage at the id list; frontier
    // caches are then dead weight and are freed before returning
    val ids = visited.unionByName(relIds).distinct().localCheckpoint(true)
    persisted.foreach(_.unpersist(blocking = false))
    AtomSet(frame, atoms.filter(Graph.aliveAt(frame.slice)).join(ids, "atom_id"))
  }

  /** Field value as a single aliased column (picks the typed column). */
  def fieldValue(rt: String, vcol: String, as: String): DataFrame =
    field(rt).select(col("atom_id"), col(vcol).as(as))

  /** Multi-field pivot: one row per atom with one column per requested
    * field — the workhorse for "entity table" projections out of the 6NF
    * graph. ONE relation join + ONE pivoted max_by aggregate resolves all
    * fields as-of the frame (vs a join+agg per field): at 100 TB this is
    * the difference between 1 shuffle and N. */
  def fields(rts: (String, String, String)*): DataFrame = {
    // Scheme-id fast path ([[Graph.plainFieldAesThrough]]): one AE per
    // (owner, rt) with the owner recoverable from the id prefix, so the
    // multi-field pivot needs NO relation scan and NO aggregate at all —
    // each field is a left join of its prefix-pruned latest-values frame
    // (unique per owner under the bound). This also sidesteps the pivoted
    // max_by's SortAggregate fallback (string/struct aggregation buffers
    // are not hash-aggregable — verified on Spark 4.1: even max(string)
    // plans as SortAggregate). At scale each per-field frame is strictly
    // smaller than the general path's single values-side join input, and
    // the joins share the one atom_id key.
    if (frame.slice <= frame.graph.plainFieldAesThrough) {
      var out = df.select("atom_id")
      rts.foreach { case (rt, vcol, as) =>
        val p = s"ae:$rt/"
        val f = frame.graph.latestValues(frame.slice)
          .filter(col("ae_id").startsWith(p))
          .select(col("ae_id").substr(lit(p.length + 1), lit(Int.MaxValue))
            .as("atom_id"), col(vcol).as(as))
        out = out.join(f, Seq("atom_id"), "left")
      }
      out
    } else {
      val rtNames = rts.map(_._1)
      val vcols = FieldIndex.vcols // ONE typed-column list, declared once
      val rels = frame.graph.atoms.filter(
        col("kind") === Kind.Relation && col("atype").isInCollection(rtNames) &&
          Graph.aliveAt(frame.slice))
        .select(col("src_id").as("atom_id"), col("dst_id").as("ae_id"),
          col("atype"))
      val resolved = rels
        .join(AtomSet.pruneToFields(frame, rtNames), "ae_id")
        .groupBy(col("atom_id"))
        .pivot("atype", rtNames)
        // ae_id tie-break: two INSTANCES of the same field assigned in one
        // tx share tx_slice — without the secondary key the pivot's winner
        // is partitioning-dependent
        .agg(max_by(struct(vcols.map(col): _*),
          struct(col("tx_slice"), col("ae_id"))))
      val out = rts.map { case (rt, vcol, as) => col(s"`$rt`.$vcol").as(as) }
      df.select("atom_id")
        .join(resolved, Seq("atom_id"), "left")
        .select(col("atom_id") +: out: _*)
    }
  }

  /** zef `yo` on atoms (`op_implementations/yo.py:243` eternalist_view) —
    * the per-atom summary report, AS DATA: one row per fact, for every atom
    * in the set, fully distributed (yo of a billion atoms is just a
    * DataFrame; the reference prints one atom to stdout). Sections mirror
    * the reference's view:
    *
    *  - `identity`   — label = kind, detail = atom type (the uid IS atom_id)
    *  - `endpoint`   — relations only: label ∈ {source,target}, detail = id
    *  - `history`    — label ∈ {instantiated,terminated}, `at` = tx time
    *    (terminated only when visible in this frame — absent means alive,
    *    like the reference's '/')
    *  - `field`      — label = field name, detail = current value as-of the
    *    frame, n = assignment count up to the frame (the reference's
    *    timeline density), `at` = winning assignment's tx time
    *  - `relation_out`/`relation_in` — entity-entity relations grouped by
    *    (type, counterpart type), n = count (the reference's relations_view
    *    `group_by` + count)
    *
    * Value rendering is canonical so reports are engine-portable: doubles
    * print at fixed decimal(28,6) scale, longs/bools via plain casts,
    * timestamps at second precision. */
  def yo: DataFrame = {
    val slice = frame.slice
    val noAt = lit(null).cast("timestamp").as("at")
    val noDetail = lit(null).cast("string").as("detail")
    val one = lit(1L).as("n")

    // yo is a per-atom diagnostic over a caller-bounded set (same contract
    // as gather's seeds), and its report sections each branch off the same
    // two small intermediates: the set's own rows and its incident
    // relations. Spark shares no subplans across DataFrame branches, so a
    // fully-lazy formulation re-scans the whole atom table once per
    // section (7+ scans) and — worse — shuffle-dedups the FULL atom table
    // to resolve endpoint kinds. Instead: eagerly materialize the small
    // intermediates with localCheckpoint (lineage truncates, caches are
    // ContextCleaner-freed — gather's pattern), so the full-table work is
    // exactly three cached scans (own rows, incident relations, touched
    // endpoint kinds) plus one values scan, each reused by every section.
    // distinct: a provenance-carrying set (outsWithSource) holds one row
    // per (atom, provenance) — identical under this projection once the
    // provenance column drops — and each duplicate would emit duplicate
    // identity/endpoint/history rows while the field/relation sections
    // (which dedup via myIds) stayed single: an internally inconsistent
    // report. Legitimate re-instantiation rows differ in inst_slice and
    // survive the distinct.
    val me = df.select(col("atom_id"), col("kind"), col("atype"),
      col("src_id"), col("dst_id"), col("inst_slice"), col("term_slice"))
      .distinct()
      .localCheckpoint(true)

    val kindName = when(col("kind") === Kind.AttributeEntity,
      "attribute_entity").otherwise(col("kind"))
    val identity = me.select(col("atom_id"), lit("identity").as("section"),
      kindName.as("label"), col("atype").as("detail"), one, noAt)

    val endpoints = me.filter(col("kind") === Kind.Relation)
      .select(col("atom_id"), explode(array(
        struct(lit("source").as("l"), col("src_id").as("d")),
        struct(lit("target").as("l"), col("dst_id").as("d")))).as("__e"))
      .select(col("atom_id"), lit("endpoint").as("section"),
        col("__e.l").as("label"), col("__e.d").as("detail"), one, noAt)

    // LEFT joins on the tx timestamp throughout: a merged or
    // externally-constructed graph may lack a txs row for some slice —
    // the report keeps the fact with a null timestamp instead of
    // silently dropping the row
    val txTs = frame.graph.txs.select(col("tx_id"), col("ts"))
    val inst = me.select(col("atom_id"), col("inst_slice"))
      .join(txTs.withColumnRenamed("tx_id", "inst_slice"), Seq("inst_slice"), "left")
      .select(col("atom_id"), lit("history").as("section"),
        lit("instantiated").as("label"), noDetail, one, col("ts").as("at"))
    val term = me.filter(col("term_slice").isNotNull && col("term_slice") <= slice)
      .select(col("atom_id"), col("term_slice"))
      .join(txTs.withColumnRenamed("tx_id", "term_slice"), Seq("term_slice"), "left")
      .select(col("atom_id"), lit("history").as("section"),
        lit("terminated").as("label"), noDetail, one, col("ts").as("at"))

    // one alive-relations pass, materialized BIDIRECTIONALLY in a single
    // job, serves fields + both relation directions. The two directions
    // come from one explode over one scan (a self-union would scan the
    // atom table twice); myIds is checkpointed-small so the join is a
    // broadcast probe over that single streamed scan.
    val rels = atoms.filter(col("kind") === Kind.Relation && Graph.aliveAt(slice))
      .select(col("atype").as("__rt"), col("src_id"), col("dst_id"))
    val myIds = me.select(col("atom_id")).distinct()
    val incident = rels
      .select(col("__rt"), explode(array(
        struct(lit("out").as("dir"), col("src_id").as("id"),
          col("dst_id").as("other")),
        struct(lit("in").as("dir"), col("dst_id").as("id"),
          col("src_id").as("other")))).as("__e"))
      .select(col("__e.dir").as("__dir"), col("__rt"),
        col("__e.id").as("atom_id"), col("__e.other").as("other_id"))
      .join(myIds, "atom_id")
      .localCheckpoint(true)
    val outRels = incident.filter(col("__dir") === "out")
      .select(col("atom_id"), col("__rt"), col("other_id").as("dst_id"))
    val inRels = incident.filter(col("__dir") === "in")
      .select(col("atom_id"), col("__rt"), col("other_id").as("src_id"))

    // endpoint-kind resolution: narrow the atom table to the endpoints this
    // set's relations actually touch BEFORE deduping validity intervals.
    // The semi-join streams atoms once (AQE broadcasts the endpoint-id set
    // when small — the common yo shape — and degrades to a shuffle join for
    // set-of-everything reports), so the interval dedup below runs over the
    // touched endpoints only, not a full-table shuffle.
    val touched = incident.select(col("other_id").as("atom_id")).distinct()
    // one row per atom, not per validity interval: a terminate-then-
    // recreate leaves 2+ interval rows per atom_id and an undeduped
    // projection would fan the joins below out, doubling every field and
    // relation count (kind/atype are interval-invariant, so dedup is exact)
    val kinds = atoms.join(touched, Seq("atom_id"), "left_semi")
      .select(col("atom_id"), col("kind").as("__k"), col("atype").as("__t"))
      .dropDuplicates("atom_id")
      .localCheckpoint(true)

    val out = outRels
      .join(kinds.select(col("atom_id").as("dst_id"), col("__k"), col("__t")),
        "dst_id")

    // field section: AE-target relations, as-of value + assignment count.
    // Values are joined down to the set's own AEs BEFORE aggregating —
    // yo of a small set never scan-aggregates the full values table.
    val vcols = FieldIndex.vcols // ONE typed-column list, declared once
    val myAes = out.filter(col("__k") === Kind.AttributeEntity)
      .select(col("atom_id"), col("__rt"), col("dst_id").as("ae_id"))
    val assigns = myAes.join(
        frame.graph.values.filter(col("tx_slice") <= slice), "ae_id")
      .groupBy(col("atom_id"), col("__rt"), col("ae_id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        max_by(struct((Seq("tx_slice", "vtype") ++ vcols).map(col): _*),
          col("tx_slice")).as("__v"))
    val v = col("__v")
    val rendered = when(v("vtype") === "str", v("v_str"))
      .when(v("vtype") === "long", v("v_long").cast("string"))
      .when(v("vtype") === "double",
        v("v_double").cast("decimal(28,6)").cast("string"))
      .when(v("vtype") === "bool", v("v_bool").cast("string"))
      .otherwise(date_format(v("v_ts"), "yyyy-MM-dd HH:mm:ss"))
    val fieldRows = assigns
      .join(txTs.withColumnRenamed("tx_id", "__ts_slice"),
        v("tx_slice") === col("__ts_slice"), "left")
      .select(col("atom_id"), lit("field").as("section"),
        col("__rt").as("label"), rendered.as("detail"), col("n"),
        col("ts").as("at"))

    val relOut = out.filter(col("__k") =!= Kind.AttributeEntity)
      .groupBy(col("atom_id"), col("__rt"), col("__t"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .select(col("atom_id"), lit("relation_out").as("section"),
        col("__rt").as("label"), col("__t").as("detail"), col("n"), noAt)
    val relIn = inRels
      .join(kinds.select(col("atom_id").as("src_id"), col("__k"), col("__t")),
        "src_id")
      .groupBy(col("atom_id"), col("__rt"), col("__t"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .select(col("atom_id"), lit("relation_in").as("section"),
        col("__rt").as("label"), col("__t").as("detail"), col("n"), noAt)

    Seq(identity, endpoints, inst, term, fieldRows, relOut, relIn)
      .reduce(_ unionByName _)
  }

  def count(): Long = df.count()
}

object AtomSet {

  /** The frame's latest-values table, pre-pruned to the AEs of the given
    * field types when the graph's ids are known to follow the deterministic
    * scheme (encoder-built graphs — the same provenance
    * [[Graph.uniqueValuesThrough]] records): `ae:rt/` / `ae:rt#instance/` /
    * `ae:rt[pos]/` prefixes (Transactor.aeId and NestedInfer's array-element
    * form) select exactly the requested fields' assignments BEFORE the
    * relation join, so the join's values side carries one field's rows
    * instead of every field of every entity. The relation join still does
    * the exact matching — the prefix cut only ever drops rows that join
    * could never keep. On non-scheme graphs (merged/foreign ids) this is
    * an identity. */
  private[core] def pruneToFields(frame: GraphSlice,
      rts: Seq[String]): DataFrame = {
    val latest = frame.graph.latestValues(frame.slice)
    if (rts.nonEmpty && frame.slice <= frame.graph.uniqueValuesThrough)
      latest.filter(rts.flatMap(rt =>
        Seq(s"ae:$rt/", s"ae:$rt#", s"ae:$rt[")
          .map(p => col("ae_id").startsWith(p)))
        .reduce(_ || _))
    else latest
  }
}
