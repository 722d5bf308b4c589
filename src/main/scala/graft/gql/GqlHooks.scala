package graft.gql

import org.apache.spark.sql.{Column, DataFrame}
import graft.core.{Graph, GraphSlice}
import graft.fx.FnRegistry

/** Schema-attached server functions for the SimpleGQL front-end: mutation
  * hooks (`@hook(onCreate|onUpdate|onRemove: "fn")`) and dynamic-field
  * resolvers (`@dynamic(hook: "fn")`), both resolved by name through
  * [[graft.fx.FnRegistry]] so the binding is graph-persisted (source +
  * content hash) exactly like any other zef function.
  *
  * Reference semantics (`generate_api2.py:1310-1380`
  * `commit_with_post_checks`): hooks run INSIDE the mutation's transaction
  * against the post-write frame; a hook may write more fields on the
  * affected object, and a thrown exception aborts the whole transaction.
  * Graft restates that over immutable graph frames as a two-pass staged
  * commit (see [[GqlApi.mutate]]): pass 1 transacts tentatively and shows
  * hooks the would-be frame; hook-returned follow-up mutations are folded
  * into a single re-transact from the ORIGINAL graph, so the committed
  * history holds exactly ONE transaction and an exception anywhere leaves
  * the input graph untouched.
  */
object GqlHooks {

  /** What a mutation hook sees: the pre-write and (tentative) post-write
    * frames plus the affected object. For `onRemove` the object is already
    * terminated in `after` — read its final state from `before` (the
    * reference views it with `allow_tombstone`). */
  final case class HookCtx(before: GraphSlice, after: GraphSlice,
      atomId: String, et: String, kind: String)

  /** What a BATCH hook sees: the frames plus ALL affected objects of one
    * (event, type) in this mutation — the set-level contract that keeps a
    * 10k-row bulk add at O(1) Spark jobs instead of one job per object
    * (the reference's per-object `resolve_field` loop is the anti-pattern
    * this replaces). `affected(...)` reads the objects' fields as ONE
    * plan; `idsDf` exposes the bare id set for custom joins. */
  final case class BatchHookCtx(before: GraphSlice, after: GraphSlice,
      atomIds: Seq[String], et: String, kind: String) {

    /** Frame the affected objects are readable in: the tentative
      * post-write frame, except `onRemove` where they are already
      * terminated there (tombstone view → pre-write frame). */
    def frame: GraphSlice = if (kind == "onRemove") before else after

    /** The affected id set as a one-column (`atom_id`) DataFrame. */
    def idsDf: DataFrame = {
      val spark = frame.graph.spark
      import spark.implicits._
      atomIds.toDF("atom_id")
    }

    /** Affected objects with the requested `(rt, value column, alias)`
      * fields resolved from [[frame]] — one plan for the whole set. The
      * id probe goes through [[GqlLite.inFilter]]: a batch hook exists
      * precisely for 10k+-row bulk mutations, where an isInCollection
      * literal is a 10k-node Catalyst tree (the analysis blowup the
      * InProbeCutoff semi-join path was built for). */
    def affected(fields: (String, String, String)*): DataFrame =
      graft.core.AtomSet(frame,
        GqlLite.inFilter(frame.all(et).df, "atom_id", atomIds.distinct))
        .fields(fields: _*)
  }

  /** A registered mutation hook implementation (either granularity). */
  sealed trait HookImpl

  /** A per-object mutation hook: returns follow-up mutations committed
    * atomically in the same transaction (the reference's hooks write via
    * `set_field` inside the open tx, test_simplegql.py:83); throws to
    * reject. Hooks fire once per affected object — follow-up mutations do
    * NOT re-trigger hooks, matching the reference's single post-check
    * sweep. Dispatch is a driver loop: fine for interactive mutations,
    * O(objects) for bulk — write a [[BatchMutationHook]] for those. */
  final case class MutationHook(run: HookCtx => Seq[GqlLite.Mutation])
    extends HookImpl

  /** A set-level mutation hook: called ONCE per (event, type) with every
    * affected object, returns the follow-up mutations for the whole set.
    * Same transactional semantics as [[MutationHook]] (single committed
    * tx, atomic abort on throw, no re-triggering). */
  final case class BatchMutationHook(run: BatchHookCtx => Seq[GqlLite.Mutation])
    extends HookImpl

  /** A dynamic-field resolver compiled INTO the one query plan: `needs`
    * lists the stored scalar fields the expression reads (they join the
    * plan's projection), `build` produces the Column over that frame.
    * The reference evaluates `@dynamic` per object on the server
    * (generate_api2.py:938-947 GQL_FunctionResolver); a per-row driver
    * callback cannot distribute, so graft requires the resolver to be
    * expressible as a Column — arbitrary driver-eval fallback is
    * deliberately unsupported. */
  final case class DynamicField(needs: Seq[String], build: DataFrame => Column)

  def registerHook(g: Graph, name: String, source: String,
      run: HookCtx => Seq[GqlLite.Mutation]): (Graph, String) =
    FnRegistry.registerRaw(g, name, source, MutationHook(run))

  def registerBatchHook(g: Graph, name: String, source: String,
      run: BatchHookCtx => Seq[GqlLite.Mutation]): (Graph, String) =
    FnRegistry.registerRaw(g, name, source, BatchMutationHook(run))

  def registerDynamic(g: Graph, name: String, source: String,
      needs: Seq[String], build: DataFrame => Column): (Graph, String) =
    FnRegistry.registerRaw(g, name, source, DynamicField(needs, build))

  def resolveHook(slice: GraphSlice, name: String): HookImpl =
    FnRegistry.rawImpl(slice, name) match {
      case h: HookImpl => h
      case other => throw new IllegalStateException(
        s"function '$name' is bound as ${other.getClass.getSimpleName}, " +
          "not a mutation hook")
    }

  def resolveDynamic(slice: GraphSlice, name: String): DynamicField =
    FnRegistry.rawImpl(slice, name) match {
      case d: DynamicField => d
      case other => throw new IllegalStateException(
        s"function '$name' is bound as ${other.getClass.getSimpleName}, " +
          "not a DynamicField")
    }
}
