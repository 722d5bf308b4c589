package graft.gql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.GraphSlice

/** SimpleGQL-style query front-end (SURVEY §3.3; reference
  * `python/zef/graphql/simplegql/generate_api2.py`): a GraphQL-shaped query
  * AST compiled to ONE DataFrame plan per query.
  *
  * This kills the reference's N+1 resolver pattern (`generate_api2.py:454`
  * maps a resolver over every entity): filters/sort/pagination/aggregates
  * become Catalyst operators over the slice's field-projected entity table,
  * so the whole query is one optimized plan — pushdown, join selection and
  * codegen included.
  *
  * Field selection maps to the as-of field projection; `@incoming`-style
  * relation hops map to traversal joins.
  */
object GqlLite {

  /** Filter expression tree — mirrors the SimpleGQL filter dict grammar
    * (`build_filter_zefop`, generate_api2.py:785-838). */
  sealed trait Filter
  final case class Eq(field: String, v: Any) extends Filter
  final case class In(field: String, vs: Seq[Any]) extends Filter
  final case class Cmp(field: String, op: String, v: Any) extends Filter // le lt ge gt
  final case class BetweenF(field: String, lo: Any, hi: Any) extends Filter
  final case class Contains(field: String, substr: String) extends Filter
  final case class And(fs: Filter*) extends Filter
  final case class Or(fs: Filter*) extends Filter
  final case class Not(f: Filter) extends Filter
  /** Pre-compiled predicate over synthetic columns (list-quantifier
    * filters reference count-join columns materialized by [[CondHop]]). */
  final case class Raw(c: Column) extends Filter

  /** Above this many values an In probe stops compiling to a literal
    * list: `isin(vs…)` builds an O(batch) Catalyst expression tree, and
    * a 100k-row bulk mutation makes ANALYSIS the bottleneck long before
    * data does. Past the cutoff the probe becomes a broadcast semi-join
    * against a one-node local relation. Below it the literal list wins —
    * the optimizer folds it to an InSet hash probe with no join
    * machinery at all. */
  private[graft] val InProbeCutoff = 1000

  /** The batch-membership probe at any size: literal InSet below the
    * cutoff, broadcast semi-join (`negate` → anti-join) above it. Null
    * semantics match the literal path ON BOTH SIDES of the cutoff: a
    * null field value never matches AND never survives a negated probe
    * (SQL NOT IN drops unknowns; a bare anti-join would KEEP null rows,
    * so the join path filters them explicitly — without that, the same
    * call returned different row sets at 1000 vs 1001 values). Falls
    * back to the literal path for value types without a local-relation
    * encoding. */
  private[graft] def inFilter(df: DataFrame, field: String, vs: Seq[Any],
      negate: Boolean = false): DataFrame = {
    def literal: DataFrame = {
      val c = col(field).isin(vs.map(lit(_)): _*)
      df.filter(if (negate) !c else c)
    }
    if (vs.size <= InProbeCutoff) literal
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val probe: Option[DataFrame] =
        if (vs.forall(_.isInstanceOf[String]))
          Some(vs.asInstanceOf[Seq[String]].toDF(field))
        else if (vs.forall(_.isInstanceOf[Int]))
          Some(vs.asInstanceOf[Seq[Int]].map(_.toLong).toDF(field))
        else if (vs.forall(_.isInstanceOf[Long]))
          Some(vs.asInstanceOf[Seq[Long]].toDF(field))
        else if (vs.forall(_.isInstanceOf[Double]))
          Some(vs.asInstanceOf[Seq[Double]].toDF(field))
        else None
      probe.fold(literal) { p =>
        val base = if (negate) df.filter(col(field).isNotNull) else df
        base.join(broadcast(p.distinct()),
          Seq(field), if (negate) "left_anti" else "left_semi")
      }
    }
  }

  /** Apply a filter tree to a frame: large In probes at the TOP LEVEL
    * (bare, or conjuncts directly under the root And) peel off into
    * [[inFilter]] semi-joins — exactly the shapes batch-derived probes
    * take (upfetch key resolution, post-mutation auth's
    * And(In(atom_id…), authFilter)) — and the remainder compiles to one
    * Column. An In nested deeper (under Or/Not) keeps the literal
    * compilation: those come from hand-written query filters, not
    * O(batch) machinery. */
  private[gql] def applyFilter(df: DataFrame, f: Filter): DataFrame = {
    def isBigIn(f0: Filter): Boolean = f0 match {
      case In(_, vs) => vs.size > InProbeCutoff
      case _ => false
    }
    f match {
      case In(field, vs) if vs.size > InProbeCutoff => inFilter(df, field, vs)
      case And(fs @ _*) if fs.exists(isBigIn) =>
        val (big, rest) = fs.partition(isBigIn)
        val probed = big.foldLeft(df) {
          case (d, In(field, vs)) => inFilter(d, field, vs)
          case (d, _) => d // unreachable: big is all In by partition
        }
        rest.map(compileFilter).reduceOption(_ && _)
          .fold(probed)(probed.filter)
      case other => df.filter(compileFilter(other))
    }
  }

  def compileFilter(f: Filter): Column = f match {
    case Eq(field, v) => col(field) === lit(v)
    case In(field, vs) => col(field).isin(vs.map(lit(_)): _*)
    case Cmp(field, "le", v) => col(field) <= lit(v)
    case Cmp(field, "lt", v) => col(field) < lit(v)
    case Cmp(field, "ge", v) => col(field) >= lit(v)
    case Cmp(field, "gt", v) => col(field) > lit(v)
    case Cmp(field, op, _) => throw new IllegalArgumentException(s"op $op")
    case BetweenF(field, lo, hi) => col(field).between(lit(lo), lit(hi))
    case Contains(field, s) => col(field).contains(s)
    // empty And()/Or() are reachable from user input ({and: []} parses to
    // And() in GqlApi) — conventional identities, not an empty.reduce crash
    case And(fs @ _*) =>
      fs.map(compileFilter).reduceOption(_ && _).getOrElse(lit(true))
    case Or(fs @ _*) =>
      fs.map(compileFilter).reduceOption(_ || _).getOrElse(lit(false))
    case Not(f0) => !compileFilter(f0)
    case Raw(c) => c
  }

  /** Sort keys with `asc/desc` + `then` chaining (generate_api2.py:871-898). */
  final case class SortKey(field: String, asc: Boolean = true)

  /** Relation-hop projection (`@relation`/`@incoming` fields,
    * generate_api2.py:911-970): count of related atoms per entity, as one
    * aggregated join — still no per-entity resolution. */
  final case class Hop(rt: String, incoming: Boolean, as: String)

  /** Conditional count-hop: per-parent count of related atoms that satisfy
    * a child query — the join shape behind list-quantifier filters
    * (`any`/`all`/`size`, build_filter_zefop, generate_api2.py:839-862).
    * `any` → count > 0 (semi-join); `all` → count == total (two counts);
    * `size` → scalar comparison on a plain [[Hop]]'s total. Child queries
    * recurse: an inner filter may carry its own cond-hops. */
  final case class CondHop(rt: String, incoming: Boolean, as: String,
      childQ: Query)

  /** Nested entity sub-selection (internal_resolve_field,
    * generate_api2.py:911-970) as ONE aggregated join: the child selection
    * compiles to its own frame (atom_id + projected columns), joined
    * through the relation table and packed per parent as a sorted
    * array<struct> column — no per-entity resolver calls.
    *
    * Nested list-params (handle_list_params applied per parent): `sort`
    * orders INSIDE the packed array via an `array_sort` comparator —
    * per-parent ordering costs no extra shuffle; `first`/`offset` slice
    * the array. Sort keys may be hidden columns of `child` (not part of
    * the emitted payload); ties break on child atom_id. */
  final case class NestedJoin(rt: String, incoming: Boolean, as: String,
      child: DataFrame, childCols: Seq[String], single: Boolean = false,
      sort: Seq[SortKey] = Nil, first: Option[Int] = None,
      offset: Option[Int] = None)

  /** One query-root: entity type + field projections (+ optional filter,
    * sort, pagination, hops, aggregates) — `queryType { field, ... }`. */
  final case class Query(
      et: String,
      fields: Seq[(String, String, String)], // (relationType, typedCol, outName)
      filter: Option[Filter] = None,
      sort: Seq[SortKey] = Nil,
      first: Option[Int] = None,
      offset: Option[Int] = None,
      hops: Seq[Hop] = Nil,
      condHops: Seq[CondHop] = Nil,
      nested: Seq[NestedJoin] = Nil)

  /** Count-join columns (plain + conditional) onto an atom_id-keyed frame —
    * shared by [[run]] and [[aggregate]]. Each hop is one aggregated join;
    * absent parents read 0. */
  private def applyCountJoins(slice: GraphSlice, df0: DataFrame,
      hops: Seq[Hop], condHops: Seq[CondHop]): DataFrame = {
    var df = df0
    hops.foreach { h =>
      val endCol = if (h.incoming) "dst_id" else "src_id"
      val counts = slice.allRelations(h.rt).df
        .groupBy(col(endCol).as("atom_id"))
        .agg(count(lit(1)).as(h.as))
      df = df.join(counts, Seq("atom_id"), "left")
        .withColumn(h.as, coalesce(col(h.as), lit(0L)))
    }
    condHops.foreach { h =>
      val parentEnd = if (h.incoming) "dst_id" else "src_id"
      val childEnd = if (h.incoming) "src_id" else "dst_id"
      val ids = run(slice, h.childQ).select(col("atom_id").as(childEnd))
      val counts = slice.allRelations(h.rt).df
        .join(ids, Seq(childEnd), "left_semi")
        .groupBy(col(parentEnd).as("atom_id"))
        .agg(count(lit(1)).as(h.as))
      df = df.join(counts, Seq("atom_id"), "left")
        .withColumn(h.as, coalesce(col(h.as), lit(0L)))
    }
    df
  }

  /** Compile + run: one plan, no per-entity resolution. */
  def run(slice: GraphSlice, q: Query): DataFrame = {
    var df =
      if (q.fields.isEmpty) slice.all(q.et).df.select(col("atom_id"))
      else slice.all(q.et).fields(q.fields: _*)
    df = applyCountJoins(slice, df, q.hops, q.condHops)
    q.filter.foreach(f => df = applyFilter(df, f))
    // nested arrays join after the filter: only surviving parents pay
    q.nested.foreach { n =>
      val parentEnd = if (n.incoming) "dst_id" else "src_id"
      val childEnd = if (n.incoming) "src_id" else "dst_id"
      // prune to SURVIVING parents before touching the child frame: with a
      // selective parent filter, only their children's rows are computed,
      // packed and shuffled — nested cost ∝ parent selectivity, not child
      // table size (the selectByField semi-join lesson applied here)
      val rel = slice.allRelations(n.rt).df
        .select(col(parentEnd).as("__parent"), col(childEnd).as("atom_id"))
        .join(df.select(col("atom_id").as("__parent")), Seq("__parent"),
          "left_semi")
      val joined = rel.join(n.child, Seq("atom_id"))
      val packed =
        if (n.sort.isEmpty && n.first.isEmpty && n.offset.isEmpty)
          joined.select(col("__parent"),
              struct(n.childCols.map(col): _*).as("__c"))
            .groupBy(col("__parent").as("atom_id"))
            .agg(sort_array(collect_list(col("__c"))).as(n.as)) // deterministic
        else {
          // pack (sort keys…, tiebreak, payload), order inside the array
          // (array_sort comparator — per-parent sort, no extra shuffle),
          // slice for offset/first, strip to the payload
          val keyed = struct(
            n.sort.zipWithIndex.map { case (k, i) =>
              col(k.field).as(s"__s$i") } ++
              Seq(col("atom_id").as("__tie"),
                struct(n.childCols.map(col): _*).as("__p")): _*)
          def compare(l: Column, r: Column): Column = {
            val tie = when(l.getField("__tie") < r.getField("__tie"), -1)
              .when(l.getField("__tie") > r.getField("__tie"), 1)
              .otherwise(0)
            n.sort.zipWithIndex.foldRight(tie: Column) { case ((k, i), acc) =>
              val (lv, rv) = (l.getField(s"__s$i"), r.getField(s"__s$i"))
              val lt = if (k.asc) -1 else 1
              // total order: nulls sort LAST in either direction (matching
              // the window pre-prune below), equal keys fall through
              when(lv.isNull && rv.isNull, acc)
                .when(lv.isNull, lit(1)).when(rv.isNull, lit(-1))
                .when(lv < rv, lit(lt)).when(lv > rv, lit(-lt)).otherwise(acc)
            }
          }
          // with `first: k` the final array keeps ≤ offset+k children per
          // parent — prune to exactly those BEFORE collecting, via a rank
          // window whose ordering matches `compare` (nulls last). Spark
          // lowers the rank filter to WindowGroupLimit: each input
          // partition forwards only its own top offset+k rows per parent,
          // so the shuffle and the collected arrays are bounded by the
          // page size, not the child count — a million-order customer
          // costs what a 20-order customer costs. The groupBy after the
          // window reuses its hash partitioning (no extra Exchange).
          val prePruned = n.first match {
            case Some(k) =>
              val ord = n.sort.map(s =>
                if (s.asc) col(s.field).asc_nulls_last
                else col(s.field).desc_nulls_last) :+ col("atom_id").asc
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col("__parent")).orderBy(ord: _*)
              joined.withColumn("__rn", row_number().over(w))
                .filter(col("__rn") <= n.offset.getOrElse(0) + k)
                .drop("__rn")
            case None => joined
          }
          val agged = prePruned.select(col("__parent"), keyed.as("__c"))
            .groupBy(col("__parent").as("atom_id"))
            .agg(collect_list(col("__c")).as("__arr"))
            .withColumn("__arr", array_sort(col("__arr"), compare))
          val arraySlice: (Column, Column, Column) => Column =
            org.apache.spark.sql.functions.slice
          val off = n.offset.getOrElse(0)
          val sliced = n.first match {
            case Some(k) => arraySlice(col("__arr"), lit(off + 1), lit(k))
            case None if off > 0 => arraySlice(col("__arr"), lit(off + 1),
              greatest(size(col("__arr")) - off, lit(0)))
            case None => col("__arr")
          }
          agged.select(col("atom_id"),
            transform(sliced, x => x.getField("__p")).as(n.as))
        }
      df = df.join(packed, Seq("atom_id"), "left")
      // single (non-list) relation field → one struct, null when absent;
      // list field → empty array when absent
      df =
        if (n.single) df.withColumn(n.as, element_at(col(n.as), 1))
        else df.withColumn(n.as,
          coalesce(col(n.as), array().cast(df.schema(n.as).dataType)))
    }
    // a global sort only when the query asks for order or pagination.
    // nulls LAST in both directions — the same total order the nested
    // path's window/comparator use (Spark's default asc = nulls FIRST
    // would paginate null sort keys differently at the root than one
    // level down, for the identical sort spec)
    if (q.sort.nonEmpty || q.first.isDefined || q.offset.isDefined) {
      val sortCols = q.sort.map(s =>
        if (s.asc) col(s.field).asc_nulls_last
        else col(s.field).desc_nulls_last) :+
        col("atom_id").asc // deterministic pagination tiebreak
      df = df.orderBy(sortCols: _*)
    }
    q.offset.foreach(o => df = df.offset(o))
    q.first.foreach(n => df = df.limit(n))
    df
  }

  // ---- Mutations (generate_api2.py:525-702): add/update/delete compile
  // to Wish lists and run through the staged write path (§3.2 reuse). ----
  sealed trait Mutation
  final case class AddEntity(et: String, key: String,
      fields: Map[String, Any]) extends Mutation
  final case class UpdateEntity(atomId: String,
      fields: Map[String, Any]) extends Mutation
  final case class DeleteEntity(atomId: String) extends Mutation
  /** Drop a field from an entity — the update mutation's `remove` clause
    * (update_entity's remove path, generate_api2.py): terminates the
    * field's AE, closing its validity interval; history stays readable at
    * earlier frames. */
  final case class RemoveField(atomId: String, rt: String,
      instanceKey: String = "") extends Mutation
  /** Relation between two entities of the batch (tx-local keys) or
    * existing atoms (full atom ids) — the `{T}Ref` nested-input link
    * (add_new_entity's ref branch, generate_api2.py). */
  final case class LinkEntities(rt: String, srcKey: String,
      dstKey: String) extends Mutation

  def compileMutation(m: Mutation): Seq[graft.core.Wish] = m match {
    case AddEntity(et, key, fields) if fields.values.exists(_ == null) =>
      throw new IllegalArgumentException(
        s"null field value in add of $et/$key — omit the field instead " +
          "(a value row cannot hold null)")
    case UpdateEntity(id, fields) if fields.values.exists(_ == null) =>
      throw new IllegalArgumentException(
        s"null field value in update of $id — use RemoveField to clear " +
          "a field (a value row cannot hold null)")
    case AddEntity(et, key, fields) =>
      // fields reference the FULL type-scoped atom id, not the bare key:
      // one document may add entities of DIFFERENT types under the same
      // input id (ids are type-scoped), and a bare-key field reference
      // would be ambiguous there (the Transactor rejects it loudly)
      val fullId = graft.core.Transactor.atomId(graft.core.Kind.Entity, et, key)
      graft.core.PutEntity(et, key) +:
        fields.toSeq.sortBy(_._1).map { case (rt, v) =>
          graft.core.PutField(fullId, rt, v) }
    case UpdateEntity(id, fields) =>
      // PutField = the reference's set_field (create-or-assign): an update
      // may set a field the entity never carried — including @hook writes
      // stamping new fields on just-created atoms — where assign-only
      // semantics would orphan the value row (no AE atom to anchor it)
      fields.toSeq.sortBy(_._1).map { case (rt, v) =>
        graft.core.PutField(id, rt, v) }
    case DeleteEntity(id) => Seq(graft.core.TerminateAtom(id))
    case RemoveField(id, rt, inst) =>
      Seq(graft.core.TerminateAtom(graft.core.Transactor.aeId(id, rt, inst)))
    case LinkEntities(rt, src, dst) =>
      Seq(graft.core.PutRelation(rt, src, dst, s"$src>$dst:$rt"))
  }

  /** Declared-schema constraints enforced in the write path
    * (SimpleGQL `@unique` / required `!`, generate_api2.py:976-1010,
    * SURVEY §1.3): checked against the CURRENT frame + the incoming batch
    * before any write; violation rejects the whole transaction. */
  final case class Constraints(
      unique: Map[String, Seq[String]] = Map(), // et -> unique field rts
      required: Map[String, Seq[String]] = Map()) // et -> required field rts

  /** Entity type from a scheme atom id ("e:ET/key") — the same prefix
    * parse the pure-id mutation vetting uses. */
  private def etOfId(id: String): Option[String] =
    if (id.startsWith("e:")) Some(id.drop(2).takeWhile(_ != '/')) else None

  private def checkConstraints(g: graft.core.Graph, ms: Seq[Mutation],
      c: Constraints): Unit = {
    val adds = ms.collect { case a: AddEntity => a }
    val updates = ms.collect { case u: UpdateEntity => u }
    // required: every AddEntity carries all required fields, and no
    // RemoveField may strip a declared-required field from a live entity
    // (an update that unset it would leave the entity schema-invalid)
    adds.foreach { a =>
      c.required.getOrElse(a.et, Nil).foreach { rt =>
        if (!a.fields.contains(rt))
          throw new IllegalArgumentException(
            s"constraint violation: ${a.et}.$rt is required")
      }
    }
    ms.foreach {
      case RemoveField(id, rt, _)
        if etOfId(id).exists(et => c.required.getOrElse(et, Nil).contains(rt)) =>
        throw new IllegalArgumentException(
          s"constraint violation: cannot remove required field $rt from $id")
      case _ => ()
    }
    // unique: no duplicate within the batch, none colliding with the store —
    // for ADDS and UPDATES both (an update setting a unique field to a value
    // another entity holds violates the declaration exactly as a create
    // does; update-blind checking silently committed the collision).
    // RELEASED rows don't collide: the store probe excludes every owner
    // whose value for this rt is REPLACED by this transaction (any UPDATE
    // carrying the field, and any deleted entity), not merely each
    // updater's own re-set value. Adds are deliberately NOT released —
    // a re-add carrying an existing entity's own unchanged unique value
    // is rejected, because add is not the idempotent path (upfetch is;
    // pinned GqlParserSpec contract — see the per-probe comment below).
    // Value-only exclusion falsely rejected legal MOVES: A updates
    // "x" -> "y" while E adds "x" (A's old row matched the probe), swaps,
    // and delete-then-reuse. Null values are not unique-constrained
    // (SQL convention; a null-set clears the field) and are dropped from
    // both the batch-dup check and the probe.
    // The store check reads the TYPED value column for each value's runtime
    // type (mirroring ValueRow.of) — a v_str-only compare would silently
    // pass long/double/bool/ts collisions (their v_str is null).
    // All (et, rt, typed-col) probes run as ONE Spark job: each probe frame
    // is tagged with its constraint and unioned, and a single take(1) finds
    // any violation — a multi-constraint schema pays one job, not one per
    // constraint.
    val deletes = ms.collect { case DeleteEntity(id) => id }
    val probes = c.unique.toSeq.flatMap { case (et, rts) =>
      rts.flatMap { rt =>
        // released PER rt: only owners whose value for THIS field is
        // replaced by an UPDATE carrying rt, or whose whole row dies
        // (deletes) — an updater not touching rt keeps its value and
        // must still collide. Adds are deliberately NOT released: add is
        // not the idempotent path (upfetch is, per the pinned
        // GqlParserSpec contract), so replaying an add of an existing
        // key + its own unique value still trips the check.
        val releasedIds = (
          updates.collect {
            case u if etOfId(u.atomId).contains(et) &&
                u.fields.contains(rt) => u.atomId } ++
          deletes.filter(id => etOfId(id).contains(et))).distinct
        val addVals = adds.filter(_.et == et)
          .flatMap(_.fields.get(rt)).filter(_ != null)
        val updVals = updates.collect {
          case u if etOfId(u.atomId).contains(et) &&
              u.fields.get(rt).exists(_ != null) => u.fields(rt)
        }
        // widen to the STORED representation BEFORE the batch-dup check:
        // boxed Int 5 and Long 5 are != under equals, so a mixed-width
        // pair for the same unique field slipped the in-batch check (and
        // the store probe only sees store rows) — one tx committed two
        // rows holding the same stored v_long value
        val batchVals = (addVals ++ updVals)
          .map { case i: Int => i.toLong: Any; case x => x }
        if (batchVals.distinct.size != batchVals.size)
          throw new IllegalArgumentException(
            s"constraint violation: duplicate $et.$rt within transaction")
        batchVals.groupBy(typedCol).map { case (vcol, vs) =>
          val asStored = vs
          // value probe then released-owner exclusion, both batch-sized
          // and both analysis-cheap at any size (inFilter: literal InSet
          // small, broadcast semi/anti-join large)
          val hit = inFilter(g.now.all(et).fieldValue(rt, vcol, "__v"),
            "__v", asStored)
          val unreleased =
            if (releasedIds.isEmpty) hit
            else inFilter(hit, "atom_id", releasedIds, negate = true)
          unreleased.select(lit(et).as("__et"), lit(rt).as("__rt"))
        }
      }
    }
    if (probes.nonEmpty) {
      probes.reduce(_ unionByName _).limit(1).collect().foreach { row =>
        throw new IllegalArgumentException(
          s"constraint violation: ${row.getString(0)}.${row.getString(1)} " +
            "value already exists")
      }
    }
  }

  /** Typed values column holding a runtime value — mirrors
    * graft.core.ValueRow.of's dispatch. */
  private def typedCol(v: Any): String = v match {
    case null => throw new IllegalArgumentException(
      "null has no typed value column — unique-field nulls are filtered " +
        "before probing (nulls are not unique-constrained)")
    case _: String => "v_str"
    case _: Int | _: Long => "v_long"
    case _: Double => "v_double"
    case _: Boolean => "v_bool"
    case _: java.sql.Timestamp => "v_ts"
    case other => throw new IllegalArgumentException(
      s"unsupported unique-field value type: ${other.getClass}")
  }

  /** Set-based mutation auth — the SimpleGQL auth hook
    * (test_simplegql.py:28-77) as ONE Spark plan per transaction: the vet
    * builds the AUTHORIZED id set for the frame (an `atom_id` column,
    * with the whole slice DSL available — field-value joins, hops), and
    * [[mutate]] semi-joins the transaction's update/delete targets
    * against it. A target outside the set rejects the whole transaction
    * before any write. This replaces the former opaque per-id
    * `(slice, id) => Boolean` hook, which invoked the predicate per
    * target on the driver — O(targets) Spark jobs when the predicate
    * read the slice. Declarative claim-based rules compile to the same
    * shape via GqlApi's `@auth`. */
  type AuthVet = graft.core.GraphSlice => org.apache.spark.sql.DataFrame

  /** Run mutations with an optional set-based auth vet ([[AuthVet]]):
    * every mutation of an EXISTING atom — update/delete/remove-field
    * targets, an AddEntity whose key lands on an already-alive id
    * (PutEntity is idempotent and PutField overwrites: an add on an
    * existing key IS an update), and LinkEntities endpoints that resolve
    * to alive atoms — must be IN the vet's authorized set for the
    * current frame, or the whole transaction is rejected before any
    * write. Ids created by this very batch are exempt (they don't exist
    * to be authorized). One existence probe + one vet probe for the
    * whole batch, never a per-target driver loop.
    *
    * Independent of auth, update/delete/remove-field targets that are
    * NOT alive in the frame (and not created by this batch) reject
    * loudly: PutField on a missing owner would otherwise append AE/
    * value rows anchored to no entity — a transaction that "succeeds"
    * while no read ever sees the value. */
  def mutate(g: graft.core.Graph, ms: Seq[Mutation],
      auth: Option[AuthVet] = None,
      constraints: Constraints = Constraints())
      : (graft.core.Graph, graft.core.Receipt) = {
    val addIds = ms.collect { case AddEntity(et, key, _) =>
      graft.core.Transactor.atomId(graft.core.Kind.Entity, et, key) }.toSet
    val updateTargets = ms.collect {
      case UpdateEntity(id, _) => id
      case DeleteEntity(id) => id
      case RemoveField(id, _, _) => id
    }.distinct.filterNot(addIds) // created-in-batch ids can't pre-exist
    // atoms an add/link may MUTATE if they already exist: add keys land
    // on their deterministic ids; link endpoints given as full scheme
    // ids (a tx-local bare key normally carries no ':' — and one that
    // does is excluded below by matching the batch's own add keys)
    val batchKeys = ms.collect { case AddEntity(_, key, _) => key }.toSet
    // relation ids THIS batch's links create (compileMutation's PutRelation
    // key scheme) — a meta-link endpoint naming one is in-batch, not a
    // ref. Both spellings Transactor.ref accepts are excluded: the full
    // relation atom-id AND the tx-local key itself ("s>d:rt"), which ref
    // resolves via relationIds BEFORE the ':' passthrough — treating it
    // as a ref here falsely tripped the liveness rejection on a form the
    // transactor happily resolves in-batch.
    val linkRelIds = ms.collect { case LinkEntities(rt, s, d) =>
      val k = s"$s>$d:$rt"
      Seq(k, graft.core.Transactor.atomId(graft.core.Kind.Relation, rt, k))
    }.flatten.toSet
    val linkRefs = ms.collect {
      case LinkEntities(_, s, d) =>
        Seq(s, d).filter(k => k.contains(":") && !batchKeys(k))
    }.flatten.distinct.filterNot(k => addIds(k) || linkRelIds(k))
    val overwriteCandidates = (addIds ++ linkRefs)
      .toSeq.distinct.filterNot(updateTargets.contains)
    val probeIds = (updateTargets ++ overwriteCandidates).distinct
    if (probeIds.nonEmpty &&
        (auth.nonEmpty || updateTargets.nonEmpty || linkRefs.nonEmpty)) {
      val alive = inFilter(g.now.aliveAtoms, "atom_id", probeIds)
        .select(col("atom_id")).collect().map(_.getString(0)).toSet
      val missing = updateTargets.filterNot(alive)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"mutation targets not alive in the current frame: " +
            s"${missing.mkString(", ")}")
      // a full-scheme-id link endpoint REFERS to an existing atom by
      // contract ("{T}Ref": link, don't create) — unvetted, a typo'd or
      // stale ref silently created a DANGLING relation no traversal
      // could follow (src/dst resolve to no atom in any frame)
      val dangling = linkRefs.filterNot(alive)
      if (dangling.nonEmpty)
        throw new IllegalArgumentException(
          s"link endpoints not alive in the current frame: " +
            s"${dangling.mkString(", ")}")
      auth.foreach { vet =>
        // everything this tx touches that EXISTS needs authorization
        val toVet = updateTargets ++ overwriteCandidates.filter(alive)
        if (toVet.nonEmpty) {
          val allowed = inFilter(vet(g.now), "atom_id", toVet)
            .select(col("atom_id"))
            .collect().map(_.getString(0)).toSet
          val rejected = toVet.filterNot(allowed)
          if (rejected.nonEmpty)
            throw new SecurityException(
              s"auth vet rejected mutation of ${rejected.mkString(", ")}")
        }
      }
    }
    checkConstraints(g, ms, constraints)
    graft.core.Transactor.transact(g, ms.flatMap(compileMutation))
  }

  /** Aggregate root (`resolve_aggregate`, generate_api2.py:442-481): count
    * + per-field min/max/sum/avg in one agg() pass. */
  def aggregate(slice: GraphSlice, et: String,
      fields: Seq[(String, String, String)],
      filter: Option[Filter] = None,
      filterFields: Seq[(String, String, String)] = Nil,
      hops: Seq[Hop] = Nil, condHops: Seq[CondHop] = Nil): DataFrame = {
    // filterFields are projected so the predicate can resolve, but take no
    // part in the min/max/sum/avg output
    val proj = fields ++ filterFields.filterNot(f =>
      fields.exists(_._3 == f._3))
    var df =
      if (proj.isEmpty) slice.all(et).df.select(col("atom_id"))
      else slice.all(et).fields(proj: _*)
    df = applyCountJoins(slice, df, hops, condHops)
    // same big-In peel as run(): an aggregate over a batch-derived id set
    // must not compile an O(batch) literal tree
    filter.foreach(f => df = applyFilter(df, f))
    val aggs = count(lit(1)).as("count") +: fields.flatMap { case (_, _, out) =>
      Seq(min(col(out)).as(s"${out}_min"), max(col(out)).as(s"${out}_max"),
        round(sum(col(out)), 2).as(s"${out}_sum"),
        round(avg(col(out)), 4).as(s"${out}_avg"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
