package graft.gql

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Graph, GraphSlice, Receipt}
import GqlParser._

/** Executable SimpleGQL API over a graft graph: GraphQL TEXT in, ONE
  * Catalyst plan (queries) or a staged transaction (mutations) out —
  * the reference's `generate_api2.py:80-293` resolver factory re-expressed
  * as a compiler onto [[GqlLite]]'s verified ASTs. HTTP/WS serving lives
  * in [[GqlServer]]/[[GqlHttp]]/[[GqlWs]] (since r8); this is everything
  * beneath it.
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
    case ("DateTime", VStr(s)) => parseDateTime(fd.name, s)
    case (e, VEnum(s)) if schema.enums.contains(e) => s
    case (e, VStr(s)) if schema.enums.contains(e) => s
    case (t, other) => throw new IllegalArgumentException(
      s"field ${fd.name}: cannot convert $other to $t")
  }

  /** GQL `DateTime` literals are ISO-8601. A zone suffix (`Z` or
    * `±hh:mm`) is honored and normalized to the UTC instant; a ZONELESS
    * wall-clock string is interpreted as UTC — the session's pinned zone
    * (GraftSession sets spark.sql.session.timeZone=UTC) — never the JVM
    * default, so the stored instant is machine-independent. A space may
    * stand in for the 'T' separator; a bare date is midnight UTC. */
  private[graft] def parseDateTime(field: String, s0: String): Timestamp = {
    import java.time._
    val s = {
      val t = s0.trim
      // ISO separator: first space between date and time becomes 'T'
      if (t.length > 10 && t.charAt(10) == ' ')
        t.substring(0, 10) + "T" + t.substring(11)
      else t
    }
    def fail() = throw new IllegalArgumentException(
      s"field $field: '$s0' is not an ISO-8601 DateTime " +
        "(want yyyy-MM-dd['T'HH:mm:ss[.SSS]][Z|±hh:mm])")
    val instant: Instant =
      try OffsetDateTime.parse(s).toInstant
      catch { case _: DateTimeException =>
        try LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
        catch { case _: DateTimeException =>
          try LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant
          catch { case _: DateTimeException => fail() }
        }
      }
    Timestamp.from(instant)
  }

  // ------------------------------------------------------------------
  // Filter compilation (build_filter_zefop, generate_api2.py:785-862)
  // ------------------------------------------------------------------
  /** A compiled filter: the predicate tree, the scalar field names it
    * touches (the one-plan projection must include them), and the
    * count-join columns it needs (list-quantifier predicates reference
    * per-parent counts materialized before the filter runs). */
  final case class CompiledFilter(f: GqlLite.Filter, touched: Set[String],
      hops: Vector[GqlLite.Hop] = Vector(),
      condHops: Vector[GqlLite.CondHop] = Vector())

  /** Synthetic column names for quantifier count-joins — unique
    * process-wide so user+auth filters on one query never collide. */
  private val qctr = new java.util.concurrent.atomic.AtomicInteger

  def compileFilter(schema: SchemaDef, tpe: TypeDef, o: VObj)
      : CompiledFilter = {
    val touched = Set.newBuilder[String]
    val hops = Vector.newBuilder[GqlLite.Hop]
    val condHops = Vector.newBuilder[GqlLite.CondHop]

    // inner filter over the child type → the child-side Query a CondHop
    // runs to get matching child ids (recursive: the inner filter may
    // itself carry quantifiers)
    def childQuery(childTpe: TypeDef, o: VObj): GqlLite.Query = {
      val cf = compileFilter(schema, childTpe, o)
      val fieldSpecs = cf.touched.toSeq.sorted.filterNot(_ == "atom_id").map { fn =>
        val fd = childTpe.field(fn)
        (fd.rt, vcolOf(schema, fd), fn)
      }
      GqlLite.Query(childTpe.name, fieldSpecs, Some(cf.f),
        hops = cf.hops, condHops = cf.condHops)
    }

    // size: {eq/in/le/lt/ge/gt/between} over the per-parent child count
    def countCmp(as: String, o: VObj): GqlLite.Filter = {
      def n(v: V): Long = v match {
        case VInt(i) => i
        case other => throw new IllegalArgumentException(s"size takes ints, got $other")
      }
      val cmp = o.fields.map {
        case ("eq", sv) => GqlLite.Eq(as, n(sv))
        case ("in", VList(vs)) => GqlLite.In(as, vs.map(n))
        case (op @ ("le" | "lt" | "ge" | "gt"), sv) => GqlLite.Cmp(as, op, n(sv))
        case ("between", bv) =>
          val b = asObj(bv)
          GqlLite.BetweenF(as, n(betweenBound(as, b, "min")),
            n(betweenBound(as, b, "max")))
        case (op, _) => throw new IllegalArgumentException(
          s"unknown size comparison operator '$op'")
      }
      if (cmp.size == 1) cmp.head else GqlLite.And(cmp: _*)
    }

    // relation field: {any: {...}} / {all: {...}} / {size: {cmp}} for list
    // fields; a bare inner filter on a single-entity field means "related
    // entity exists and satisfies it" (generate_api2.py:827-831)
    def relPred(fd: FieldDef, v: VObj): GqlLite.Filter = {
      val childTpe = schema.tpe(fd.tpe)
      if (!fd.list) {
        val as = s"__q${qctr.incrementAndGet()}"
        condHops += GqlLite.CondHop(fd.rt, fd.incoming, as, childQuery(childTpe, v))
        return GqlLite.Raw(col(as) > 0)
      }
      val parts = v.fields.map {
        case ("any", sub) =>
          val as = s"__q${qctr.incrementAndGet()}"
          condHops += GqlLite.CondHop(fd.rt, fd.incoming, as,
            childQuery(childTpe, asObj(sub)))
          GqlLite.Raw(col(as) > 0)
        case ("all", sub) =>
          val asM = s"__q${qctr.incrementAndGet()}"
          val asT = s"__q${qctr.incrementAndGet()}"
          condHops += GqlLite.CondHop(fd.rt, fd.incoming, asM,
            childQuery(childTpe, asObj(sub)))
          hops += GqlLite.Hop(fd.rt, fd.incoming, asT)
          GqlLite.Raw(col(asM) === col(asT)) // vacuously true at 0 children
        case ("size", sub) =>
          val asT = s"__q${qctr.incrementAndGet()}"
          hops += GqlLite.Hop(fd.rt, fd.incoming, asT)
          countCmp(asT, asObj(sub))
        case (k, _) => throw new IllegalArgumentException(
          s"unknown list filter keyword '$k' (want any/all/size)")
      }
      if (parts.isEmpty) throw new IllegalArgumentException(
        s"empty list filter for field '${fd.name}'")
      if (parts.size == 1) parts.head else GqlLite.And(parts: _*)
    }

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
          if (tpe.field(fname).dynamic.isDefined)
            throw new UnsupportedOperationException(
              s"filtering on @dynamic field '$fname' is not supported: the " +
                "computed column exists only inside the query plan")
          touched += fname; GqlLite.Eq(fname, b)
        case (fname, v) =>
          val fd = tpe.field(fname)
          if (fd.dynamic.isDefined) throw new UnsupportedOperationException(
            s"filtering on @dynamic field '$fname' is not supported: the " +
              "computed column exists only inside the query plan")
          if (schema.isEntity(fd.tpe)) relPred(fd, asObj(v))
          else {
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
                  convert(schema, fd, betweenBound(fname, b, "min")),
                  convert(schema, fd, betweenBound(fname, b, "max")))
              case (op, _) => throw new IllegalArgumentException(
                s"unknown comparison operator '$op'")
            }
            if (cmp.isEmpty) throw new IllegalArgumentException(
              s"empty comparison object for field '$fname'")
            if (cmp.size == 1) cmp.head else GqlLite.And(cmp: _*)
          }
      }
      if (parts.isEmpty)
        throw new IllegalArgumentException("empty filter object")
      if (parts.size == 1) parts.head else GqlLite.And(parts: _*)
    }
    val f = walk(o)
    CompiledFilter(f, touched.result(), hops.result(), condHops.result())
  }

  private def asObj(v: V): VObj = v match {
    case o: VObj => o
    case other => throw new IllegalArgumentException(s"expected an object, got $other")
  }

  /** `between` bound lookup with a usable error — a missing min:/max: used
    * to surface as a bare `None.get` NoSuchElementException. */
  private def betweenBound(field: String, b: VObj, k: String): V =
    b.get(k).getOrElse(throw new IllegalArgumentException(
      s"between on '$field' needs both min: and max: (missing '$k')"))

  /** Loud unknown-argument rejection for a field (root or nested).
    * Silently ignoring stray args turned a typo'd `queryUser(fliter:
    * {...})` into the FULL unfiltered result set (and a typo'd mutation
    * arg into a mutation of everything the filter-less path allowed) —
    * the worst failure shape a query API has. GraphQL validation rejects
    * unknown arguments; so do we, at every selection depth. */
  private def requireArgs(sel: Sel, allowed: String*): Unit =
    sel.args.fields.foreach { case (k, _) =>
      require(allowed.contains(k),
        s"unknown argument '$k' for ${sel.name} " +
          (if (allowed.isEmpty) "(accepts no arguments)"
           else s"(accepts: ${allowed.mkString(", ")})"))
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
      claims: Option[Map[String, Any]]): Option[CompiledFilter] =
    tpe.auth.get(key).map { expr =>
      val c = claims.getOrElse(throw new SecurityException(
        s"type ${tpe.name} requires auth claims for '$key'"))
      compileFilter(schema, tpe, GqlParser.parseFilterObject(expr, c))
    }

  /** The reference's auth fallback chain (pass_auth_generic,
    * generate_api2.py:1207-1214): the FIRST declared rule among `keys`
    * governs — e.g. pre-update auth is `update:` if declared, else
    * `query:`; no rule in the chain means unrestricted. Chains:
    * query=[query], add=[add, query], pre-update=[update, query],
    * post-update=[updatePost, update, query],
    * delete=[delete, update, query] (pass_add_auth/pass_pre_update_auth/
    * pass_post_update_auth/pass_delete_auth, :1230-1248). */
  private def authFilterChain(schema: SchemaDef, tpe: TypeDef,
      keys: Seq[String], claims: Option[Map[String, Any]])
      : Option[CompiledFilter] =
    keys.find(tpe.auth.contains).flatMap(k =>
      authFilter(schema, tpe, k, claims))

  /** AND two optional compiled filters, merging their join requirements. */
  private def andCf(a: Option[CompiledFilter], b: Option[CompiledFilter])
      : Option[CompiledFilter] = (a, b) match {
    case (Some(x), Some(y)) => Some(CompiledFilter(
      GqlLite.And(x.f, y.f), x.touched ++ y.touched,
      x.hops ++ y.hops, x.condHops ++ y.condHops))
    case (x, y) => x.orElse(y)
  }

  /** Run a query document against a frame. Exactly one root field.
    * `authClaims` feed the schema's type-level @auth(query:) expressions —
    * the result set is the auth-filtered subset, still one plan. */
  def query(slice: GraphSlice, schema: SchemaDef, text: String,
      vars: Map[String, Any] = Map(),
      authClaims: Option[Map[String, Any]] = None): DataFrame =
    query(slice, schema, parseOperation(text, vars), authClaims)

  /** Pre-parsed entry — a transport that already parsed the document to
    * route it (GqlServer) passes the Operation through instead of paying
    * a second full lex+parse per request. */
  def query(slice: GraphSlice, schema: SchemaDef, op: GqlParser.Operation,
      authClaims: Option[Map[String, Any]]): DataFrame = {
    require(op.kind == "query", s"expected a query document, got ${op.kind}")
    require(op.roots.size == 1, "exactly one root field per query document")
    val root = op.roots.head
    root.name match {
      case n if n.startsWith("query") =>
        requireArgs(root, "filter", "order", "first", "offset")
        runQuery(slice, schema, schema.tpe(n.stripPrefix("query")), root,
          authClaims)
      case n if n.startsWith("get") =>
        requireArgs(root, "id")
        val tpe = schema.tpe(n.stripPrefix("get"))
        val id = root.args.get("id") match {
          case Some(VStr(s)) => s
          case other => throw new IllegalArgumentException(s"get needs id:, got $other")
        }
        runQuery(slice, schema, tpe, root.copy(args =
          VObj(Seq("filter" -> VObj(Seq("id" -> VStr(id)))))), authClaims)
      case n if n.startsWith("aggregate") =>
        requireArgs(root, "filter")
        runAggregate(slice, schema, schema.tpe(n.stripPrefix("aggregate")),
          root, authClaims)
      case other => throw new IllegalArgumentException(s"unknown root field $other")
    }
  }

  /** Compile a selection set over `tpe` into an atom_id-keyed frame plus
    * the (source col → alias) output list. Relation fields compile to ONE
    * aggregated join each: `{count}` → a count hop; scalar/entity
    * sub-selections → a [[GqlLite.NestedJoin]] packing the recursively
    * compiled child frame into a sorted array<struct> column
    * (internal_resolve_field, generate_api2.py:911-970 — minus the
    * per-entity resolver calls). Nested fields accept their own `filter:`
    * argument; each level re-applies its own type's @auth(query:). */
  private def planSelections(slice: GraphSlice, schema: SchemaDef,
      tpe: TypeDef, sels: Seq[Sel], filterV: Option[V],
      authClaims: Option[Map[String, Any]], extraNeeded: Seq[String])
      : (DataFrame, Vector[(String, String)]) = {
    var hops = Vector.empty[GqlLite.Hop]
    var condHops = Vector.empty[GqlLite.CondHop]
    var nested = Vector.empty[GqlLite.NestedJoin]
    var outs = Vector.empty[(String, String)] // (source col, alias)
    var scalarFields = Vector.empty[String]
    var dynSelected = Vector.empty[String] // @dynamic fields to compute
    sels.foreach { s =>
      if (s.name == "id") {
        requireArgs(s)
        outs :+= (("atom_id", s.alias))
      }
      else {
        val fd = tpe.field(s.name)
        if (fd.dynamic.isDefined) {
          requireArgs(s)
          dynSelected :+= s.name
          outs :+= ((s.name, s.alias))
        } else if (schema.isEntity(fd.tpe)) {
          // `{count}` is the relation-count form ONLY when the child type
          // doesn't itself declare a field named `count` — a declared
          // field always wins, or selecting it would silently return the
          // aggregate instead of the stored values (the declared schema
          // outranks the generated convenience surface)
          if (s.sels.map(_.name) == Seq("count") &&
              !schema.tpe(fd.tpe).fields.exists(_.name == "count")) {
            // per-parent related count (aggregate resolution over the
            // filtered list, generate_api2.py:442-481). A filter:
            // argument and/or the child type's @auth(query:) fold into a
            // CondHop — the count-join counts ONLY children the caller
            // may read that satisfy the filter, still one plan. Bare
            // counts stay a plain Hop (no child-side probe at all).
            val childTpe = schema.tpe(fd.tpe)
            s.args.fields.foreach { case (k, _) => require(k == "filter",
              s"relation count '${s.name}' takes only filter:, got '$k'") }
            val childCf = andCf(
              s.args.get("filter").map(f =>
                compileFilter(schema, childTpe, asObj(f))),
              authFilter(schema, childTpe, "query", authClaims))
            childCf match {
              case None =>
                hops :+= GqlLite.Hop(fd.rt, fd.incoming, s.alias)
              case Some(cf) =>
                val childFields = cf.touched.toSeq.sorted
                  .filterNot(_ == "atom_id").map { fn =>
                    val cfd = childTpe.field(fn)
                    (cfd.rt, vcolOf(schema, cfd), fn)
                  }
                condHops :+= GqlLite.CondHop(fd.rt, fd.incoming, s.alias,
                  GqlLite.Query(childTpe.name, childFields, Some(cf.f),
                    hops = cf.hops, condHops = cf.condHops))
            }
            outs :+= ((s.alias, s.alias))
          } else {
            require(s.sels.nonEmpty,
              s"relation field '${s.name}' needs a sub-selection")
            // same loud unknown-argument rule as root fields — a typo'd
            // nested `fliter:` previously returned the FULL unfiltered
            // child list, the exact failure class requireArgs exists for,
            // surviving one level down
            if (fd.list) requireArgs(s, "filter", "order", "first", "offset")
            else requireArgs(s, "filter")
            val childTpe = schema.tpe(fd.tpe)
            // nested list-params (handle_list_params per parent,
            // generate_api2.py:880-906): order/first/offset inside the block
            val nSort = s.args.get("order")
              .map(o => compileSort(asObj(o))).getOrElse(Nil)
            val nFirst = s.args.get("first").map { case VInt(i) => i.toInt
              case other => throw new IllegalArgumentException(s"bad first $other") }
            val nOffset = s.args.get("offset").map { case VInt(i) => i.toInt
              case other => throw new IllegalArgumentException(s"bad offset $other") }
            require(fd.list || (nSort.isEmpty && nFirst.isEmpty && nOffset.isEmpty),
              s"'${s.name}' is a single-entity field; order/first/offset need a list")
            val (childDf0, childOuts) = planSelections(slice, schema,
              childTpe, s.sels, s.args.get("filter"), authClaims,
              nSort.map(_.field))
            // payload aliases + HIDDEN sort keys (aliased apart so a sort
            // field needn't be part of the emitted selection)
            val hidden = nSort.map(_.field).distinct
              .map(f => col(f).as(s"__sort_$f"))
            val childDf = childDf0.select((col("atom_id") +:
              childOuts.map { case (src, al) => col(src).as(al) }) ++ hidden: _*)
            nested :+= GqlLite.NestedJoin(fd.rt, fd.incoming, s.alias,
              childDf, childOuts.map(_._2), single = !fd.list,
              sort = nSort.map(k => GqlLite.SortKey(s"__sort_${k.field}", k.asc)),
              first = nFirst, offset = nOffset)
            outs :+= ((s.alias, s.alias))
          }
        } else {
          requireArgs(s)
          scalarFields :+= s.name
          outs :+= ((s.name, s.alias))
        }
      }
    }
    val userFilter = filterV match {
      case Some(o: VObj) => Some(compileFilter(schema, tpe, o))
      case Some(other) => throw new IllegalArgumentException(s"bad filter $other")
      case None => None
    }
    val cf = andCf(userFilter, authFilter(schema, tpe, "query", authClaims))
    // @dynamic columns to compute: selected ones plus any referenced as a
    // sort key; their resolvers' `needs` join the stored projection so the
    // Column expression stays inside the ONE plan
    val dynNames = tpe.fields.filter(_.dynamic.isDefined).map(_.name).toSet
    val dynToCompute = (dynSelected ++ extraNeeded.filter(dynNames)).distinct
    val dynImpls = dynToCompute.map { n =>
      n -> GqlHooks.resolveDynamic(slice, tpe.field(n).dynamic.get)
    }
    // project every field the plan touches: selected ∪ filtered ∪ sorted
    // ∪ dynamic-resolver inputs (computed fields themselves aren't stored)
    val needed = (scalarFields ++ cf.map(_.touched.toSeq.sorted).getOrElse(Nil) ++
      extraNeeded ++ dynImpls.flatMap(_._2.needs)).distinct
      .filterNot(_ == "atom_id")
      .filterNot(f => hops.exists(_.as == f))
      .filterNot(f => condHops.exists(_.as == f))
      .filterNot(dynNames)
    val fieldSpecs = needed.map { f =>
      val fd = tpe.field(f)
      require(!schema.isEntity(fd.tpe),
        s"'$f' is a relation field; sort on relation fields is not supported")
      (fd.rt, vcolOf(schema, fd), f)
    }
    val q = GqlLite.Query(tpe.name, fieldSpecs, cf.map(_.f),
      hops = hops ++ cf.map(_.hops).getOrElse(Vector()),
      condHops = (condHops ++ cf.map(_.condHops).getOrElse(Vector())).toSeq,
      nested = nested)
    var df = GqlLite.run(slice, q)
    dynImpls.foreach { case (n, impl) =>
      df = df.withColumn(n, impl.build(df))
    }
    (df, outs)
  }

  private def runQuery(slice: GraphSlice, schema: SchemaDef, tpe: TypeDef,
      root: Sel, authClaims: Option[Map[String, Any]] = None): DataFrame = {
    val sort = root.args.get("order").map(o => compileSort(asObj(o))).getOrElse(Nil)
    val first = root.args.get("first").map { case VInt(i) => i.toInt
      case other => throw new IllegalArgumentException(s"bad first $other") }
    val offset = root.args.get("offset").map { case VInt(i) => i.toInt
      case other => throw new IllegalArgumentException(s"bad offset $other") }
    val (df0, outs) = planSelections(slice, schema, tpe, root.sels,
      root.args.get("filter"), authClaims, sort.map(_.field))
    var df = df0
    if (sort.nonEmpty || first.isDefined || offset.isDefined) {
      val sortCols = sort.map(s =>
        if (s.asc) col(s.field).asc else col(s.field).desc) :+
        col("atom_id").asc // deterministic pagination tiebreak
      df = df.orderBy(sortCols: _*)
    }
    offset.foreach(o => df = df.offset(o))
    first.foreach(n => df = df.limit(n))
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
      require(fd.dynamic.isEmpty,
        s"aggregating over @dynamic field '$f' is not supported")
      (fd.rt, vcolOf(schema, fd), f)
    }
    val userFilter = root.args.get("filter") match {
      case Some(o: VObj) => Some(compileFilter(schema, tpe, o))
      // a malformed filter must fail like the query path's, not silently
      // aggregate the whole type
      case Some(other) => throw new IllegalArgumentException(
        s"bad filter: $other")
      case None => None
    }
    val cf = andCf(userFilter, authFilter(schema, tpe, "query", authClaims))
    val filterFields = cf.map(_.touched.toSeq.sorted).getOrElse(Nil)
      .filterNot(f => f == "atom_id" || fields.exists(_._3 == f))
      .map { f =>
        val fd = tpe.field(f)
        (fd.rt, vcolOf(schema, fd), f)
      }
    val agg = GqlLite.aggregate(slice, tpe.name, fields, cf.map(_.f),
      filterFields, cf.map(_.hops).getOrElse(Vector()).toSeq,
      cf.map(_.condHops).getOrElse(Vector()).toSeq)
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
    * schema's declared constraints (+ an optional set-based auth vet —
    * [[GqlLite.AuthVet]], the programmatic stand-in for the reference's
    * @auth expressions; one semi-join plan per transaction). */
  def mutate(g: Graph, schema: SchemaDef, text: String,
      vars: Map[String, Any] = Map(),
      auth: Option[GqlLite.AuthVet] = None,
      authClaims: Option[Map[String, Any]] = None)
      : (Graph, Receipt) =
    mutate(g, schema, parseOperation(text, vars), auth, authClaims)

  /** Pre-parsed entry (see the query overload). */
  def mutate(g: Graph, schema: SchemaDef, op: GqlParser.Operation,
      auth: Option[GqlLite.AuthVet],
      authClaims: Option[Map[String, Any]])
      : (Graph, Receipt) = {
    require(op.kind == "mutation", s"expected a mutation document, got ${op.kind}")
    val muts = op.roots.flatMap { root =>
      root.name match {
        case n if n.startsWith("add") =>
          requireArgs(root, "input")
          val tpe = schema.tpe(n.stripPrefix("add"))
          val inputs = root.args.get("input") match {
            case Some(VList(vs)) => vs.map(asObj)
            case Some(o: VObj) => Seq(o)
            case other => throw new IllegalArgumentException(s"add needs input:, got $other")
          }
          inputs.flatMap(in => compileAddInput(schema, tpe, in)._2)
        case n if n.startsWith("upfetch") =>
          requireArgs(root, "input")
          // resolve_upfetch (generate_api2.py:580-628): upsert keyed on the
          // type's @upfetch field — existing holder updated in place, value
          // unseen in the frame becomes a fresh entity. All input rows
          // resolve in ONE plan (an In-filter probe on the upfetch field),
          // not one lookup per row.
          val tpe = schema.tpe(n.stripPrefix("upfetch"))
          val uf = tpe.fields.find(_.upfetch).getOrElse(
            throw new IllegalArgumentException(
              s"type ${tpe.name} declares no @upfetch field"))
          val inputs = root.args.get("input") match {
            case Some(VList(vs)) => vs.map(asObj)
            case Some(o: VObj) => Seq(o)
            case other => throw new IllegalArgumentException(
              s"upfetch needs input:, got $other")
          }
          val keys = inputs.map { in =>
            convert(schema, uf, in.get(uf.name).getOrElse(
              throw new IllegalArgumentException(
                s"upfetch input must carry the @upfetch field '${uf.name}'")))
          }
          require(keys.distinct.size == keys.size,
            s"duplicate ${uf.name} values within one upfetch batch")
          val vcol = vcolOf(schema, uf)
          val hits = GqlLite.run(g.now, GqlLite.Query(tpe.name,
              Seq((uf.rt, vcol, uf.name)),
              Some(GqlLite.In(uf.name, keys))))
            .select(col(uf.name), col("atom_id")).collect()
            .map(r => r.get(0) -> r.getString(1)).toMap
          // @auth(update:) vets in-place updates exactly as update{T}
          // does — resolved through the same auth-scoped path. An
          // unauthorized existing holder is a LOUD reject, never a
          // silent overwrite (the bypass) nor a silent duplicate create.
          val authorizedIds: Set[String] =
            authFilterChain(schema, tpe, Seq("update", "query"),
                authClaims) match {
              case None => hits.values.toSet
              case Some(_) if hits.isEmpty => Set.empty
              case Some(_) =>
                val keyVs = inputs.map(in => in.get(uf.name).get)
                resolveIds(g, schema, tpe,
                  Some(VObj(Seq((uf.name,
                    VObj(Seq(("in", VList(keyVs.toSeq)))))))),
                  authFilterChain(schema, tpe, Seq("update", "query"),
                    authClaims)).toSet
            }
          inputs.zip(keys).map { case (in, key) =>
            val fields = in.fields.filterNot(_._1 == "id").map { case (fname, v) =>
              val fd = tpe.field(fname)
              require(!schema.isEntity(fd.tpe),
                s"upfetch: relation field '$fname' is not supported in input")
              fd.rt -> convert(schema, fd, v)
            }.toMap
            // explicit id: same contract as add's compileAddInput — it
            // names the created entity; silently deriving a different
            // content key made add-then-upfetch and upfetch-then-add
            // produce different atoms from the same input object
            val explicitId = in.get("id").map {
              case VStr(s) => s
              case other => throw new IllegalArgumentException(
                s"upfetch: id must be a string, got $other")
            }
            hits.get(key) match {
              case Some(id) =>
                require(authorizedIds.contains(id),
                  s"upfetch: not authorized to update ${tpe.name} " +
                    s"'${uf.name}' = $key")
                // an explicit id naming a DIFFERENT atom than the upfetch
                // key resolved to is a contradiction, never a silent pick
                explicitId.foreach { e =>
                  require(id == s"e:${tpe.name}/$e",
                    s"upfetch: id '$e' conflicts with existing ${tpe.name} " +
                      s"holding '${uf.name}' = $key ($id)")
                }
                // the key field re-assigns its own value: idempotent
                GqlLite.UpdateEntity(id, fields)
              case None =>
                GqlLite.AddEntity(tpe.name,
                  explicitId.getOrElse(java.util.UUID.nameUUIDFromBytes(
                    (tpe.name + in.fields.sortBy(_._1).mkString(";"))
                      .getBytes("UTF-8")).toString),
                  fields)
            }
          }
        case n if n.startsWith("update") =>
          requireArgs(root, "input")
          val tpe = schema.tpe(n.stripPrefix("update"))
          val input = asObj(root.args.get("input").getOrElse(
            throw new IllegalArgumentException("update needs input:")))
          val ids = resolveIds(g, schema, tpe, input.get("filter"),
            authFilterChain(schema, tpe, Seq("update", "query"), authClaims))
          val setFields = input.get("set").map(asObj).map(_.fields.map {
            case (fname, v) =>
              val fd = tpe.field(fname)
              // a @dynamic field has no storage — writing it would be
              // silently swallowed (the reference errors: a dynamic field
              // has no GQL_Resolve_With, generate_api2.py:1051)
              require(fd.dynamic.isEmpty,
                s"set: '$fname' is @dynamic (computed) and cannot be written")
              fd.rt -> convert(schema, fd, v)
          }.toMap).getOrElse(Map.empty[String, Any])
          // remove: {field: <anything>} drops the field (update_entity's
          // remove path); required fields can't be removed
          val removeRts = input.get("remove").map(asObj).map(_.fields.map {
            case (fname, _) =>
              val fd = tpe.field(fname)
              require(!schema.isEntity(fd.tpe),
                s"remove: relation field '$fname' is not supported")
              require(fd.dynamic.isEmpty,
                s"remove: '$fname' is @dynamic (computed) and cannot be removed")
              require(!fd.required,
                s"remove: '$fname' is required and cannot be removed")
              fd.rt
          }).getOrElse(Seq())
          require(setFields.nonEmpty || removeRts.nonEmpty,
            "update needs set: and/or remove:")
          ids.flatMap { id =>
            (if (setFields.nonEmpty) Seq(GqlLite.UpdateEntity(id, setFields))
             else Nil) ++ removeRts.map(rt => GqlLite.RemoveField(id, rt))
          }
        case n if n.startsWith("delete") =>
          requireArgs(root, "filter")
          val tpe = schema.tpe(n.stripPrefix("delete"))
          resolveIds(g, schema, tpe, root.args.get("filter"),
            authFilterChain(schema, tpe, Seq("delete", "update", "query"),
              authClaims))
            .map(GqlLite.DeleteEntity(_))
        case other => throw new IllegalArgumentException(
          s"unknown mutation root '$other'")
      }
    }
    commitWithHooks(g, schema, muts, auth, authClaims)
  }

  /** Entity atom ids encode their type ("e:ET/key", Transactor id scheme) —
    * the affected-object type for update/delete hook dispatch. */
  private def etOfAtomId(id: String): Option[String] =
    if (id.startsWith("e:") && id.indexOf('/') > 2)
      Some(id.substring(2, id.indexOf('/')))
    else None

  /** Commit compiled mutations, firing the schema's `@hook` functions —
    * the reference's commit_with_post_checks (generate_api2.py:1310-1380)
    * over immutable frames. Hooks see the TENTATIVE post-write frame; the
    * follow-up mutations they return are folded into one re-transact from
    * the original graph, so history gets exactly one tx and any hook
    * exception is an atomic abort (the input graph is never touched).
    * Constraints are enforced on the full final mutation set (user +
    * hook writes); the auth predicate vets user mutations in pass 1 and is
    * not re-applied to hook writes (schema-author code, not user input). */
  private def commitWithHooks(g: Graph, schema: SchemaDef,
      muts: Seq[GqlLite.Mutation],
      auth: Option[GqlLite.AuthVet],
      authClaims: Option[Map[String, Any]] = None): (Graph, Receipt) = {
    // post-commit auth (commit_with_post_checks): vet against the FINAL
    // post-write frame; failure discards the tentative graph atomically
    def vetted(t: (Graph, Receipt)): (Graph, Receipt) = {
      try postMutationAuth(t._1, schema, muts, authClaims)
      catch { case th: Throwable => t._1.releaseDerived(); throw th }
      t
    }
    // affected objects in mutation order, once per (event, TYPE, object) —
    // the type is part of the key so addA(id:"x") + addB(id:"x") in one
    // document (tx-LOCAL input keys) fires BOTH types' onCreate hooks
    val seen = scala.collection.mutable.Set.empty[(String, String, String)]
    val affected = muts.flatMap {
      case GqlLite.AddEntity(et, key, _) => Some(("onCreate", et, key, true))
      case GqlLite.UpdateEntity(id, _) =>
        etOfAtomId(id).map(et => ("onUpdate", et, id, false))
      case GqlLite.RemoveField(id, _, _) =>
        etOfAtomId(id).map(et => ("onUpdate", et, id, false))
      case GqlLite.DeleteEntity(id) =>
        etOfAtomId(id).map(et => ("onRemove", et, id, false))
      case _: GqlLite.LinkEntities => None
    }.filter { case (kind, et, key, _) =>
      schema.types.get(et).exists(_.hooks.contains(kind)) &&
        seen.add((kind, et, key))
    }
    val tentative = GqlLite.mutate(g, muts, auth, schema.constraints)
    if (affected.isEmpty) return vetted(tentative)
    val (tg, trec) = tentative
    val before = g.now
    val after = tg.now
    // dispatch grouped per (event, type) in first-occurrence order: a
    // BatchMutationHook gets ONE call with the whole affected set (O(1)
    // Spark jobs regardless of batch size); a per-object MutationHook
    // keeps its driver loop as the compatibility contract
    val groups = affected.map { case (kind, et, _, _) => (kind, et) }.distinct
    // a hook that THROWS (validation reject) aborts the mutation — the
    // tentative graph is discarded on that path too, so its seeded
    // derived tables must release or every rejected mutation leaks one
    // persisted block until GC
    val extras =
      try groups.flatMap { case (kind, et) =>
      val ids = affected.collect { case (`kind`, `et`, key, isTxKey) =>
        // resolve an AddEntity's tx-local key via the deterministic id
        // scheme, NOT the receipt: the receipt map is keyed by bare
        // tx-local key, so two adds of different types sharing one input
        // id would both resolve to whichever type transacted last
        if (isTxKey)
          graft.core.Transactor.atomId(graft.core.Kind.Entity, et, key)
        else key
      }
      GqlHooks.resolveHook(before, schema.tpe(et).hooks(kind)) match {
        case GqlHooks.BatchMutationHook(run) =>
          run(GqlHooks.BatchHookCtx(before, after, ids, et, kind))
        case GqlHooks.MutationHook(run) =>
          ids.flatMap(id =>
            run(GqlHooks.HookCtx(before, after, id, et, kind)))
      }
      } catch { case t: Throwable => tg.releaseDerived(); throw t }
    if (extras.isEmpty) vetted(tentative)
    else {
      // the tentative graph is discarded — release the derived tables its
      // transact seeded, or the persisted block lingers until GC
      tg.releaseDerived()
      vetted(GqlLite.mutate(g, muts ++ extras, None, schema.constraints))
    }
  }

  /** The reference's commit-time auth post-checks
    * (commit_with_post_checks, generate_api2.py:1310-1341): every object
    * CREATED by the mutation must pass @auth(add:) — falling back to
    * query: — and every object UPDATED must pass @auth(updatePost:) —
    * falling back to update:, then query: — both evaluated against the
    * post-write frame, so a create (or an update) that lands outside the
    * caller's authorized subset aborts the whole mutation. User
    * mutations only; hook follow-ups are schema-author code (same
    * contract as the pass-1 auth predicate). One plan per (type, kind) —
    * an In(atom_id) probe AND-ed with the compiled auth filter. */
  private def postMutationAuth(g2: Graph, schema: SchemaDef,
      muts: Seq[GqlLite.Mutation],
      claims: Option[Map[String, Any]]): Unit = {
    val created = muts.collect { case GqlLite.AddEntity(et, key, _) =>
      et -> graft.core.Transactor.atomId(graft.core.Kind.Entity, et, key) }
    val updated = muts.flatMap {
      case GqlLite.UpdateEntity(id, _) => etOfAtomId(id).map(_ -> id)
      case GqlLite.RemoveField(id, _, _) => etOfAtomId(id).map(_ -> id)
      case _ => None
    }
    def vet(kind: String, chain: Seq[String],
        objs: Seq[(String, String)]): Unit =
      objs.groupBy(_._1).foreach { case (et, pairs) =>
        schema.types.get(et).foreach { tpe =>
          authFilterChain(schema, tpe, chain, claims).foreach { cf =>
            val ids = pairs.map(_._2).distinct
            val f = GqlLite.And(GqlLite.In("atom_id", ids), cf.f)
            val fieldSpecs = cf.touched.toSeq.sorted
              .filterNot(_ == "atom_id").map { fn =>
                val fd = tpe.field(fn)
                (fd.rt, vcolOf(schema, fd), fn)
              }
            val ok = GqlLite.run(g2.now, GqlLite.Query(et, fieldSpecs,
                Some(f), hops = cf.hops, condHops = cf.condHops))
              .select("atom_id").collect().map(_.getString(0)).toSet
            val denied = ids.filterNot(ok)
            if (denied.nonEmpty) throw new SecurityException(
              s"$kind auth check failed for $et: ${denied.mkString(", ")}")
          }
        }
      }
    vet("add", Seq("add", "query"), created)
    vet("post-update", Seq("updatePost", "update", "query"), updated)
  }

  /** Compile one add-input object for `tpe` into its AddEntity plus any
    * NESTED relation-field inputs — the `{T}Ref` shape of the reference's
    * add_new_entity (generate_api2.py): a nested object carrying ONLY
    * `id` links an existing atom (pass the full atom id); anything else
    * creates the child entity recursively and links it. `@incoming`
    * fields link child→parent. Returns (this entity's tx key, all
    * mutations in dependency-free order — the write path resolves
    * tx-local keys batch-wide). Keys are deterministic content-derived
    * UUIDs when no id is given, so replays are stable. */
  private def compileAddInput(schema: SchemaDef, tpe: TypeDef, in: VObj)
      : (String, Seq[GqlLite.Mutation]) = {
    val key = in.get("id") match {
      case Some(VStr(s)) => s
      case _ => java.util.UUID.nameUUIDFromBytes(
        (tpe.name + in.fields.sortBy(_._1).mkString(";"))
          .getBytes("UTF-8")).toString
    }
    val fields = Map.newBuilder[String, Any]
    val extra = Seq.newBuilder[GqlLite.Mutation]
    in.fields.filterNot(_._1 == "id").foreach { case (fname, v) =>
      val fd = tpe.field(fname)
      if (schema.isEntity(fd.tpe)) {
        val childTpe = schema.tpe(fd.tpe)
        val items = v match {
          case VList(vs) => vs.map(asObj)
          case o: VObj => Seq(o)
          case other => throw new IllegalArgumentException(
            s"add: relation field '$fname' takes an object or list, got $other")
        }
        require(fd.list || items.size <= 1,
          s"add: '$fname' is single-valued, got ${items.size} inputs")
        items.foreach { child =>
          val childKey = child.fields match {
            case Seq(("id", VStr(s))) => // pure ref: link, don't create
              // the scheme id carries its type — vet it HERE, driver-side:
              // unvetted, `author: {id: "e:Post/1"}` silently linked a
              // Post where a Person belongs (and a malformed id linked a
              // dangling edge; existence is vetted batch-wide in
              // GqlLite.mutate, type membership is free right here)
              require(s.startsWith(s"e:${childTpe.name}/"),
                s"add: '$fname' ref id '$s' is not a ${childTpe.name} id " +
                  s"(want e:${childTpe.name}/<key>)")
              s
            case _ =>
              val (k, childMuts) = compileAddInput(schema, childTpe, child)
              extra ++= childMuts
              k
          }
          extra += (if (fd.incoming)
            GqlLite.LinkEntities(fd.rt, childKey, key)
          else GqlLite.LinkEntities(fd.rt, key, childKey))
        }
      } else {
        // reject writes to computed fields (reference: add_new_entity
        // throws on a field without GQL_Resolve_With, generate_api2.py:1134)
        require(fd.dynamic.isEmpty,
          s"add: '$fname' is @dynamic (computed) and cannot be written")
        fields += fd.rt -> convert(schema, fd, v)
      }
    }
    (key, GqlLite.AddEntity(tpe.name, key, fields.result()) +: extra.result())
  }

  /** Filter → target atom ids (update/delete resolution,
    * resolve_update/resolve_delete in generate_api2.py). Mutations are
    * OLTP-scale like the reference's — the id list lands on the driver. */
  private def resolveIds(g: Graph, schema: SchemaDef, tpe: TypeDef,
      filterV: Option[V],
      auth: Option[CompiledFilter] = None): Seq[String] = {
    val o = asObj(filterV.getOrElse(
      throw new IllegalArgumentException("mutation needs filter:")))
    // fast path: pure id filter needs no plan at all — unless an @auth
    // expression must vet the targets too. The id must carry THIS type's
    // prefix: passing it through verbatim let deleteUser terminate a Post
    // atom (and fire Post's hooks) whenever no auth was declared, while
    // the auth path resolved the same wrong-type id to zero rows.
    def vetted(s: String): String = {
      require(s.startsWith(s"e:${tpe.name}/"),
        s"mutation filter id '$s' is not a ${tpe.name} id")
      s
    }
    if (auth.isEmpty) o.fields match {
      case Seq(("id", VStr(s))) => return Seq(vetted(s))
      case Seq(("id", VList(ids))) =>
        return ids.map { case VStr(s) => vetted(s); case other =>
          throw new IllegalArgumentException(s"bad id $other") }
      case _ => ()
    }
    val cf = andCf(Some(compileFilter(schema, tpe, o)), auth).get
    val fieldSpecs = cf.touched.toSeq.sorted.filterNot(_ == "atom_id").map { fn =>
      val fd = tpe.field(fn)
      (fd.rt, vcolOf(schema, fd), fn)
    }
    GqlLite.run(g.now, GqlLite.Query(tpe.name, fieldSpecs, Some(cf.f),
        hops = cf.hops, condHops = cf.condHops))
      .select("atom_id").collect().map(_.getString(0)).toSeq
  }
}
