package graft.fx

import org.apache.spark.sql.DataFrame
import graft.core._

/** zef_function registry (SURVEY §2.11; reference
  * `python/zef/core/zef_functions.py:268-448`): functions persisted ON the
  * graph as entities carrying their source and content hash, callable by
  * name/ref.
  *
  * The JVM can't compile arbitrary source at runtime without shipping a
  * compiler, so the contract is split exactly like the reference's
  * (source persisted for audit/distribution; a process-local table maps
  * content hash → compiled lambda): `register` stores source+hash as an
  * `ET.ZefFunction` entity; `bind` attaches the compiled implementation
  * for this process; `invoke` resolves name → hash → implementation.
  */
object FnRegistry {

  final case class ZefFunction(name: String, source: String, hash: String)

  private val impls =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame => DataFrame]

  def sourceHash(source: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(source.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Persist a function onto the graph (source + hash as fields), tagged by
    * name for as-of lookup. Content-addressed and IDEMPOTENT: re-registering
    * the same name with the same source is a pure binding refresh — no new
    * transaction, the input graph is returned unchanged (so a hot loop that
    * re-registers on a cached graph keeps that graph's warm derived
    * tables). */
  def register(g: Graph, name: String, source: String,
      impl: DataFrame => DataFrame): (Graph, String) = {
    val h = sourceHash(source)
    impls.put(h, impl)
    persist(g, name, source, h)
  }

  private def persist(g: Graph, name: String, source: String,
      h: String): (Graph, String) =
    lookup(g.now, name) match {
      case Some(fn) if fn.hash == h => (g, h) // already on the graph, as-is
      case _ =>
        val (g2, _) = Transactor.transact(g, Seq(
          PutEntity("ZefFunction", name),
          PutField(name, "Source", source),
          PutField(name, "SourceHash", h),
          TagAtom(name, s"fn:$name")))
        (g2, h)
    }

  // Graph is immutable (Transactor.transact returns a NEW Graph), so a
  // (graph-instance, slice, name) resolution can never go stale — memoize
  // it and the register-once/serve-many server shape resolves warm
  // functions with ZERO Spark jobs per query. Weak keys let retired graph
  // versions GC their memo with them.
  private val lookupMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Graph,
      scala.collection.concurrent.TrieMap[(Int, String), Option[ZefFunction]]]())

  /** Resolve a function by name in a frame (as-of semantics apply: the
    * binding visible in THAT slice). Two cheap reads, not a graph join:
    * the tag table (small) resolves name → atom id, and the field AE ids
    * are deterministic (Transactor id scheme), so source + hash come
    * straight off the cached current-values table as a map-only filter —
    * no full atoms scan per resolution. Memoized per immutable graph
    * instance (see [[lookupMemo]]). */
  def lookup(slice: GraphSlice, name: String): Option[ZefFunction] = {
    val memo = lookupMemo.computeIfAbsent(slice.graph,
      _ => scala.collection.concurrent.TrieMap.empty)
    memo.getOrElseUpdate((slice.slice, name), lookupUncached(slice, name))
  }

  private def lookupUncached(slice: GraphSlice, name: String): Option[ZefFunction] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, max_by, struct, when}
    val g = slice.graph
    // the SAME canonical tie key byTag uses (tombstone outranks a
    // binding, then max atom_id): a bare max_by(_, tx_slice) resolved a
    // same-slice duplicate (merged/hand-built graphs) to a
    // partition-order-dependent winner — invoke() could dispatch to a
    // different persisted hash across identical reads of one frame
    val bound = g.tags
      .filter(col("tag") === lit(s"fn:$name") && col("tx_slice") <= slice.slice)
      .agg(max_by(col("atom_id"),
        struct(col("tx_slice"),
          when(col("atom_id").isNull, 1).otherwise(0).as("__tomb"),
          coalesce(col("atom_id"), lit("")).as("__id"))).as("atom_id"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))
    bound.flatMap { atomId =>
      val srcAe = Transactor.aeId(atomId, "Source", "")
      val hashAe = Transactor.aeId(atomId, "SourceHash", "")
      // the tag may outlive the function: a terminated ZefFunction entity
      // must not resolve (the old byTag path joined aliveAtoms). The
      // aliveness probe rides the SAME job as the value read (cross-join
      // with a limit-1 alive row: dead atom → empty probe → no rows), so
      // resolution still costs two Spark jobs, not three.
      val alive = g.atoms
        .filter(col("atom_id") === lit(atomId) && Graph.aliveAt(slice.slice))
        .select(lit(1).as("__alive")).limit(1)
      val m = g.latestValues(slice.slice)
        .filter(col("ae_id").isin(srcAe, hashAe) &&
          col("tx_slice") <= slice.slice)
        .crossJoin(alive)
        .select("ae_id", "v_str").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      for { s <- m.get(srcAe); h <- m.get(hashAe) }
        yield ZefFunction(name, s, h)
    }
  }

  /** Invoke by name: hash-addressed dispatch, erroring if this process has
    * no implementation bound for the persisted hash (same failure mode as
    * the reference when source can't be resolved). */
  def invoke(slice: GraphSlice, name: String, arg: DataFrame): DataFrame = {
    val fn = lookup(slice, name).getOrElse(
      throw new NoSuchElementException(s"no ZefFunction '$name' in slice"))
    val impl = impls.getOrElse(fn.hash,
      throw new IllegalStateException(
        s"function '$name' (hash ${fn.hash}) has no bound implementation"))
    impl(arg)
  }

  // ---- Non-DataFrame-shaped functions (mutation hooks, dynamic-field
  // resolvers — graft.gql.GqlHooks defines the shapes): the on-graph
  // contract is identical (source + hash persisted, tag-addressed), only
  // the process-local binding table differs. ----
  private val rawImpls =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  /** Persist + bind an implementation of a caller-defined shape. Same
    * idempotent contract as [[register]]. */
  def registerRaw(g: Graph, name: String, source: String,
      impl: AnyRef): (Graph, String) = {
    val h = sourceHash(source)
    rawImpls.put(h, impl)
    persist(g, name, source, h)
  }

  /** Resolve name → persisted hash → bound raw implementation; the caller
    * owns the downcast to its declared shape. */
  def rawImpl(slice: GraphSlice, name: String): AnyRef = {
    val fn = lookup(slice, name).getOrElse(
      throw new NoSuchElementException(s"no ZefFunction '$name' in slice"))
    rawImpls.getOrElse(fn.hash,
      throw new IllegalStateException(
        s"function '$name' (hash ${fn.hash}) has no bound implementation"))
  }
}
