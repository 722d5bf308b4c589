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
    case And(fs @ _*) => fs.map(compileFilter).reduce(_ && _)
    case Or(fs @ _*) => fs.map(compileFilter).reduce(_ || _)
    case Not(f0) => !compileFilter(f0)
  }

  /** Sort keys with `asc/desc` + `then` chaining (generate_api2.py:871-898). */
  final case class SortKey(field: String, asc: Boolean = true)

  /** One query-root: entity type + field projections (+ optional filter,
    * sort, pagination, aggregates) — `queryType { field, ... }`. */
  final case class Query(
      et: String,
      fields: Seq[(String, String, String)], // (relationType, typedCol, outName)
      filter: Option[Filter] = None,
      sort: Seq[SortKey] = Nil,
      first: Option[Int] = None,
      offset: Option[Int] = None)

  /** Compile + run: one plan, no per-entity resolution. */
  def run(slice: GraphSlice, q: Query): DataFrame = {
    var df = slice.all(q.et).fields(q.fields: _*)
    q.filter.foreach(f => df = df.filter(compileFilter(f)))
    val sortCols = q.sort.map(s => if (s.asc) col(s.field).asc else col(s.field).desc) :+
      col("atom_id").asc // deterministic pagination tiebreak
    df = df.orderBy(sortCols: _*)
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

  def compileMutation(m: Mutation): Seq[graft.core.Wish] = m match {
    case AddEntity(et, key, fields) =>
      graft.core.PutEntity(et, key) +:
        fields.toSeq.sortBy(_._1).map { case (rt, v) =>
          graft.core.PutField(key, rt, v) }
    case UpdateEntity(id, fields) =>
      fields.toSeq.sortBy(_._1).map { case (rt, v) =>
        graft.core.AssignField(id, rt, v) }
    case DeleteEntity(id) => Seq(graft.core.TerminateAtom(id))
  }

  /** Run mutations with an optional auth predicate — the SimpleGQL auth
    * hook (test_simplegql.py:28-77): update/delete targets must satisfy
    * the predicate IN THE CURRENT FRAME or the whole transaction is
    * rejected (checked distributed, before any write). */
  def mutate(g: graft.core.Graph, ms: Seq[Mutation],
      auth: Option[(graft.core.GraphSlice, String) => Boolean] = None)
      : (graft.core.Graph, graft.core.Receipt) = {
    auth.foreach { check =>
      val targets = ms.collect {
        case UpdateEntity(id, _) => id
        case DeleteEntity(id) => id
      }
      targets.foreach { id =>
        if (!check(g.now, id))
          throw new SecurityException(s"auth hook rejected mutation of $id")
      }
    }
    graft.core.Transactor.transact(g, ms.flatMap(compileMutation))
  }

  /** Aggregate root (`resolve_aggregate`, generate_api2.py:442-481): count
    * + per-field min/max/sum/avg in one agg() pass. */
  def aggregate(slice: GraphSlice, et: String,
      fields: Seq[(String, String, String)],
      filter: Option[Filter] = None): DataFrame = {
    var df = slice.all(et).fields(fields: _*)
    filter.foreach(f => df = df.filter(compileFilter(f)))
    val aggs = count(lit(1)).as("count") +: fields.flatMap { case (_, _, out) =>
      Seq(min(col(out)).as(s"${out}_min"), max(col(out)).as(s"${out}_max"),
        round(sum(col(out)), 2).as(s"${out}_sum"),
        round(avg(col(out)), 4).as(s"${out}_avg"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
