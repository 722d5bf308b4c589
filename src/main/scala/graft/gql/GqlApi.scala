package graft.gql

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Graph, GraphSlice, Receipt}
import GqlParser._

/** Executable SimpleGQL API over a graft graph: GraphQL TEXT in, ONE
  * Catalyst plan (queries) or a staged transaction (mutations) out —
  * the reference's `generate_api2.py:80-293` resolver factory re-expressed
  * as a compiler onto [[GqlLite]]'s verified ASTs. HTTP serving stays a
  * non-goal (SURVEY §7.5); this is everything beneath it.
  *
  * Root-field dispatch mirrors the generated API surface exactly
  * (`generate_api2.py:225-266`): `get{T}(id:)`, `query{T}(filter:, order:,
  * first:, offset:)`, `aggregate{T}(filter:)` with count/{f}Min/{f}Max/
  * {f}Sum/{f}Avg selections, `add{T}(input: [...])`,
  * `update{T}(input: {filter:, set:})`, `delete{T}(filter:)`.
  */
object GqlApi {

  /** Typed values column for a schema field (ValueRow.of's dispatch). */
  def vcolOf(schema: SchemaDef, fd: FieldDef): String = fd.tpe match {
    case "String" | "ID" => "v_str"
    case "Int" => "v_long"
    case "Float" => "v_double"
    case "Boolean" => "v_bool"
    case "DateTime" => "v_ts"
    case e if schema.enums.contains(e) => "v_str"
    case other => throw new IllegalArgumentException(
      s"field ${fd.name}: '$other' is not a scalar type")
  }

  private def convert(schema: SchemaDef, fd: FieldDef, v: V): Any = (fd.tpe, v) match {
    case ("String" | "ID", VStr(s)) => s
    case ("Int", VInt(i)) => i
    case ("Float", VInt(i)) => i.toDouble
    case ("Float", VDbl(d)) => d
    case ("Boolean", VBool(b)) => b
    case ("DateTime", VStr(s)) =>
      Timestamp.valueOf(if (s.contains("T")) s.replace("T", " ") else s)
    case (e, VEnum(s)) if schema.enums.contains(e) => s
    case (e, VStr(s)) if schema.enums.contains(e) => s
    case (t, other) => throw new IllegalArgumentException(
      s"field ${fd.name}: cannot convert $other to $t")
  }

  // ------------------------------------------------------------------
  // Filter compilation (build_filter_zefop, generate_api2.py:785-860)
  // ------------------------------------------------------------------
  /** VObj filter → GqlLite.Filter + the set of field names it touches
    * (needed so the one-plan projection includes filtered-only fields). */
  def compileFilter(schema: SchemaDef, tpe: TypeDef, o: VObj)
      : (GqlLite.Filter, Set[String]) = {
    val touched = Set.newBuilder[String]
    def walk(o: VObj): GqlLite.Filter = {
      val parts = o.fields.map {
        case ("and", VList(vs)) => GqlLite.And(vs.map(asObj).map(walk): _*)
        case ("or", VList(vs)) => GqlLite.Or(vs.map(asObj).map(walk): _*)
        case ("not", v) => GqlLite.Not(walk(asObj(v)))
        case ("id", VList(ids)) => GqlLite.In("atom_id",
          ids.map { case VStr(s) => s; case other =>
            throw new IllegalArgumentException(s"id filter takes strings, got $other") })
        case ("id", VStr(s)) => GqlLite.Eq("atom_id", s)
        case (fname, VBool(b)) => // boolean short form: {flag: true}
          touched += fname; GqlLite.Eq(fname, b)
        case (fname, v) =>
          val fd = tpe.field(fname)
          touched += fname
          val cmp = asObj(v).fields.map {
            case ("eq", sv) => GqlLite.Eq(fname, convert(schema, fd, sv))
            case ("in", VList(vs)) =>
              GqlLite.In(fname, vs.map(convert(schema, fd, _)))
            case ("contains", VStr(s)) => GqlLite.Contains(fname, s)
            case ("le", sv) => GqlLite.Cmp(fname, "le", convert(schema, fd, sv))
            case ("lt", sv) => GqlLite.Cmp(fname, "lt", convert(schema, fd, sv))
            case ("ge", sv) => GqlLite.Cmp(fname, "ge", convert(schema, fd, sv))
            case ("gt", sv) => GqlLite.Cmp(fname, "gt", convert(schema, fd, sv))
            case ("between", bv) =>
              val b = asObj(bv)
              GqlLite.BetweenF(fname,
                convert(schema, fd, b.get("min").get),
                convert(schema, fd, b.get("max").get))
            case (op, _) => throw new IllegalArgumentException(
              s"unknown comparison operator '$op'")
          }
          if (cmp.isEmpty) throw new IllegalArgumentException(
            s"empty comparison object for field '$fname'")
          if (cmp.size == 1) cmp.head else GqlLite.And(cmp: _*)
      }
      if (parts.isEmpty)
        throw new IllegalArgumentException("empty filter object")
      if (parts.size == 1) parts.head else GqlLite.And(parts: _*)
    }
    val f = walk(o)
    (f, touched.result())
  }

  private def asObj(v: V): VObj = v match {
    case o: VObj => o
    case other => throw new IllegalArgumentException(s"expected an object, got $other")
  }

  /** order: {asc: f} / {desc: f} with `then` chaining
    * (maybe_sort_result, generate_api2.py:871-898). */
  private def compileSort(o: VObj): Seq[GqlLite.SortKey] = {
    def keyName(v: V): String = v match {
      case VEnum(s) => s; case VStr(s) => s
      case other => throw new IllegalArgumentException(s"bad sort key $other")
    }
    val here = (o.get("asc"), o.get("desc")) match {
      case (Some(v), None) => GqlLite.SortKey(keyName(v), asc = true)
      case (None, Some(v)) => GqlLite.SortKey(keyName(v), asc = false)
      case _ => throw new IllegalArgumentException(
        "order object needs exactly one of asc/desc")
    }
    here +: o.get("then").map(t => compileSort(asObj(t))).getOrElse(Nil)
  }

  // ------------------------------------------------------------------
  // Query execution
  // ------------------------------------------------------------------
  /** Type-level @auth enforcement (test_simplegql.py:28-77): the schema's
    * `@auth(<key>: "{...filter...}")` expression — a filter object over the
    * type's fields with `$claim` variables — compiles against the caller's
    * auth claims and is AND-ed into the plan. Declared auth with no claims
    * is an outright denial (the reference rejects tokenless requests).
    * Returns the compiled filter + the fields it touches (the projection
    * must include them). */
  private def authFilter(schema: SchemaDef, tpe: TypeDef, key: String,
      claims: Option[Map[String, Any]])
      : Option[(GqlLite.Filter, Set[String])] =
    tpe.auth.get(key).map { expr =>
      val c = claims.getOrElse(throw new SecurityException(
        s"type ${tpe.name} requires auth claims for '$key'"))
      compileFilter(schema, tpe, GqlParser.parseFilterObject(expr, c))
    }

  private def andOpt(a: Option[GqlLite.Filter], b: Option[GqlLite.Filter])
      : Option[GqlLite.Filter] = (a, b) match {
    case (Some(x), Some(y)) => Some(GqlLite.And(x, y))
    case (x, y) => x.orElse(y)
  }

  /** Run a query document against a frame. Exactly one root field.
    * `authClaims` feed the schema's type-level @auth(query:) expressions —
    * the result set is the auth-filtered subset, still one plan. */
  def query(slice: GraphSlice, schema: SchemaDef, text: String,
      vars: Map[String, Any] = Map(),
      authClaims: Option[Map[String, Any]] = None): DataFrame = {
    val op = parseOperation(text, vars)
    require(op.kind == "query", s"expected a query document, got ${op.kind}")
    require(op.roots.size == 1, "exactly one root field per query document")
    val root = op.roots.head
    root.name match {
      case n if n.startsWith("query") =>
        runQuery(slice, schema, schema.tpe(n.stripPrefix("query")), root,
          authClaims)
      case n if n.startsWith("get") =>
        val tpe = schema.tpe(n.stripPrefix("get"))
        val id = root.args.get("id") match {
          case Some(VStr(s)) => s
          case other => throw new IllegalArgumentException(s"get needs id:, got $other")
        }
        runQuery(slice, schema, tpe, root.copy(args =
          VObj(Seq("filter" -> VObj(Seq("id" -> VStr(id)))))), authClaims)
      case n if n.startsWith("aggregate") =>
        runAggregate(slice, schema, schema.tpe(n.stripPrefix("aggregate")),
          root, authClaims)
      case other => throw new IllegalArgumentException(s"unknown root field $other")
    }
  }

  private def runQuery(slice: GraphSlice, schema: SchemaDef, tpe: TypeDef,
      root: Sel, authClaims: Option[Map[String, Any]] = None): DataFrame = {
    // selections: scalar fields (+ aliases), `id`, and relation-field
    // count hops (`rel { count }` — the one-plan aggregated-join shape;
    // full nested-entity selection is the reference's N+1 resolver,
    // intentionally not reproduced)
    var hops = Vector.empty[GqlLite.Hop]
    var outs = Vector.empty[(String, String)] // (source col, alias)
    var scalarFields = Vector.empty[String]
    root.sels.foreach { s =>
      if (s.name == "id") outs :+= ("atom_id", s.alias)
      else {
        val fd = tpe.field(s.name)
        if (schema.isEntity(fd.tpe)) {
          require(s.sels.map(_.name) == Seq("count"),
            s"relation field '${s.name}': only {count} sub-selection is " +
              "supported (nested entity resolution is not one-plan)")
          hops :+= GqlLite.Hop(fd.rt, fd.incoming, s.alias)
          outs :+= ((s.alias, s.alias))
        } else {
          scalarFields :+= s.name
          outs :+= ((s.name, s.alias))
        }
      }
    }
    val (userFilter, userTouched) = root.args.get("filter") match {
      case Some(o: VObj) =>
        val (f, touched) = compileFilter(schema, tpe, o)
        (Some(f), touched)
      case Some(other) => throw new IllegalArgumentException(s"bad filter $other")
      case None => (None, Set.empty[String])
    }
    val auth = authFilter(schema, tpe, "query", authClaims)
    val filter = andOpt(userFilter, auth.map(_._1))
    val filterFields = userTouched ++ auth.map(_._2).getOrElse(Set())
    val sort = root.args.get("order").map(o => compileSort(asObj(o))).getOrElse(Nil)
    val first = root.args.get("first").map { case VInt(i) => i.toInt
      case other => throw new IllegalArgumentException(s"bad first $other") }
    val offset = root.args.get("offset").map { case VInt(i) => i.toInt
      case other => throw new IllegalArgumentException(s"bad offset $other") }
    // project every field the plan touches: selected ∪ filtered ∪ sorted
    val needed = (scalarFields ++ filterFields ++ sort.map(_.field))
      .distinct.filterNot(_ == "atom_id")
      .filterNot(f => hops.exists(_.as == f))
    val fieldSpecs = needed.map { f =>
      val fd = tpe.field(f)
      require(!schema.isEntity(fd.tpe),
        s"'$f' is a relation field; filter/sort on relation fields is not supported")
      (fd.rt, vcolOf(schema, fd), f)
    }
    val q = GqlLite.Query(tpe.name, fieldSpecs, filter, sort, first, offset, hops)
    val df = GqlLite.run(slice, q)
    df.select(outs.map { case (src, alias) => col(src).as(alias) }: _*)
  }

  private def runAggregate(slice: GraphSlice, schema: SchemaDef, tpe: TypeDef,
      root: Sel, authClaims: Option[Map[String, Any]] = None): DataFrame = {
    val stats = Seq("Min", "Max", "Sum", "Avg")
    // selections: count | {field}{Min|Max|Sum|Avg} (aggregate_fields_dict,
    // generate_api2.py:119-219)
    val parsed = root.sels.map { s =>
      if (s.name == "count") (s.alias, "count", None)
      else stats.collectFirst {
        case st if s.name.endsWith(st) &&
            tpe.fields.exists(_.name == s.name.dropRight(st.length)) =>
          (s.alias, st.toLowerCase, Some(s.name.dropRight(st.length)))
      }.getOrElse(throw new IllegalArgumentException(
        s"unknown aggregate selection '${s.name}'"))
    }
    val fields = parsed.flatMap(_._3).distinct.map { f =>
      val fd = tpe.field(f)
      (fd.rt, vcolOf(schema, fd), f)
    }
    val (userFilter, userTouched) = root.args.get("filter") match {
      case Some(o: VObj) =>
        val (f, t) = compileFilter(schema, tpe, o); (Some(f), t)
      case _ => (None, Set.empty[String])
    }
    val auth = authFilter(schema, tpe, "query", authClaims)
    val filter = andOpt(userFilter, auth.map(_._1))
    val filterTouched = userTouched ++ auth.map(_._2).getOrElse(Set())
    val filterFields = filterTouched.toSeq.sorted
      .filterNot(f => f == "atom_id" || fields.exists(_._3 == f))
      .map { f =>
        val fd = tpe.field(f)
        (fd.rt, vcolOf(schema, fd), f)
      }
    val agg = GqlLite.aggregate(slice, tpe.name, fields, filter, filterFields)
    agg.select(parsed.map {
      case (alias, "count", None) => col("count").as(alias)
      case (alias, st, Some(f)) => col(s"${f}_$st").as(alias)
      case other => throw new IllegalStateException(other.toString)
    }: _*)
  }

  // ------------------------------------------------------------------
  // Mutation execution
  // ------------------------------------------------------------------
  /** Run a mutation document through the staged write path with the
    * schema's declared constraints (+ an optional auth hook, the
    * programmatic stand-in for the reference's @auth expressions). */
  def mutate(g: Graph, schema: SchemaDef, text: String,
      vars: Map[String, Any] = Map(),
      auth: Option[(GraphSlice, String) => Boolean] = None,
      authClaims: Option[Map[String, Any]] = None)
      : (Graph, Receipt) = {
    val op = parseOperation(text, vars)
    require(op.kind == "mutation", s"expected a mutation document, got ${op.kind}")
    val muts = op.roots.flatMap { root =>
      root.name match {
        case n if n.startsWith("add") =>
          val tpe = schema.tpe(n.stripPrefix("add"))
          val inputs = root.args.get("input") match {
            case Some(VList(vs)) => vs.map(asObj)
            case Some(o: VObj) => Seq(o)
            case other => throw new IllegalArgumentException(s"add needs input:, got $other")
          }
          inputs.map { in =>
            val key = in.get("id") match {
              case Some(VStr(s)) => s
              case _ => // deterministic content-derived key, like the
                // reference's generated uids but replay-stable
                java.util.UUID.nameUUIDFromBytes(
                  (tpe.name + in.fields.sortBy(_._1).mkString(";"))
                    .getBytes("UTF-8")).toString
            }
            val fields = in.fields.filterNot(_._1 == "id").map { case (fname, v) =>
              val fd = tpe.field(fname)
              require(!schema.isEntity(fd.tpe),
                s"add: relation field '$fname' is not supported in input")
              fd.rt -> convert(schema, fd, v)
            }.toMap
            GqlLite.AddEntity(tpe.name, key, fields)
          }
        case n if n.startsWith("update") =>
          val tpe = schema.tpe(n.stripPrefix("update"))
          val input = asObj(root.args.get("input").getOrElse(
            throw new IllegalArgumentException("update needs input:")))
          val ids = resolveIds(g, schema, tpe, input.get("filter"),
            authFilter(schema, tpe, "update", authClaims))
          val set = asObj(input.get("set").getOrElse(
            throw new IllegalArgumentException("update needs set:")))
          val fields = set.fields.map { case (fname, v) =>
            val fd = tpe.field(fname)
            fd.rt -> convert(schema, fd, v)
          }.toMap
          ids.map(GqlLite.UpdateEntity(_, fields))
        case n if n.startsWith("delete") =>
          val tpe = schema.tpe(n.stripPrefix("delete"))
          resolveIds(g, schema, tpe, root.args.get("filter"),
            authFilter(schema, tpe, "delete", authClaims))
            .map(GqlLite.DeleteEntity(_))
        case other => throw new IllegalArgumentException(
          s"unknown mutation root '$other'")
      }
    }
    GqlLite.mutate(g, muts, auth, schema.constraints)
  }

  /** Filter → target atom ids (update/delete resolution,
    * resolve_update/resolve_delete in generate_api2.py). Mutations are
    * OLTP-scale like the reference's — the id list lands on the driver. */
  private def resolveIds(g: Graph, schema: SchemaDef, tpe: TypeDef,
      filterV: Option[V],
      auth: Option[(GqlLite.Filter, Set[String])] = None): Seq[String] = {
    val o = asObj(filterV.getOrElse(
      throw new IllegalArgumentException("mutation needs filter:")))
    // fast path: pure id filter needs no plan at all — unless an @auth
    // expression must vet the targets too
    if (auth.isEmpty) o.fields match {
      case Seq(("id", VStr(s))) => return Seq(s)
      case Seq(("id", VList(ids))) =>
        return ids.map { case VStr(s) => s; case other =>
          throw new IllegalArgumentException(s"bad id $other") }
      case _ => ()
    }
    val (f0, touched0) = compileFilter(schema, tpe, o)
    val f = auth.map(a => GqlLite.And(f0, a._1)).getOrElse(f0)
    val touched = touched0 ++ auth.map(_._2).getOrElse(Set())
    val fieldSpecs = touched.toSeq.sorted.map { fn =>
      val fd = tpe.field(fn)
      (fd.rt, vcolOf(schema, fd), fn)
    }
    GqlLite.run(g.now, GqlLite.Query(tpe.name, fieldSpecs, Some(f)))
      .select("atom_id").collect().map(_.getString(0)).toSeq
  }
}
