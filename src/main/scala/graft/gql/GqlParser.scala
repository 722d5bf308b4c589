package graft.gql

/** GraphQL TEXT surface for the SimpleGQL-style front-end: a hand-rolled
  * lexer + recursive-descent parser for (a) schema SDL files and (b)
  * query/mutation operation documents, compiled onto the verified
  * [[GqlLite]] one-plan ASTs.
  *
  * Grammar mirrored from the reference's SimpleGQL
  * (`python/zef/graphql/simplegql/schema_file_parser.py:1-379`,
  * `generate_api2.py:225-290,340-420,785-898`):
  *
  *  - schema: `type Name @auth(query: "...") { field: Type! @unique
  *    @search @incoming @relation(rt: "X") ... }` plus `enum E { A B }`;
  *    scalars String/Int/Float/Boolean/DateTime/ID; `!` = required,
  *    `[T]` = list; the field→relation-type mapping defaults to
  *    simple_capitalize(fieldName) exactly like the reference
  *    (`schema_file_parser.py:213-217`), overridden by `@relation(rt:)`.
  *  - operations: `query { queryName(filter: {...}, order: {asc: f,
  *    then: {desc: g}}, first: N, offset: N) { fields... } }`,
  *    `get{Name}(id:)`, `aggregate{Name}(filter:)` with
  *    count/{field}Min/Max/Sum/Avg selections, and mutations
  *    `add{Name}(input: [{...}])`, `update{Name}(input: {filter: ...,
  *    set: {...}})`, `delete{Name}(filter: ...)`.
  *  - filters: top-level keys AND; `and`/`or`/`not`/`id`; per scalar
  *    field `{eq, in, contains, le, lt, ge, gt, between: {min, max}}`
  *    (`build_filter_zefop`, generate_api2.py:785-860).
  *
  * Variables (`$x`) are substituted from a caller-provided map at parse
  * time. Type-level @auth expressions are zef-lang strings in the
  * reference; they are retained as schema metadata and enforcement stays
  * on [[GqlLite.mutate]]'s programmatic auth hook.
  */
object GqlParser {

  // ------------------------------------------------------------------
  // Lexer
  // ------------------------------------------------------------------
  sealed trait Tok
  final case class TName(s: String) extends Tok
  final case class TInt(v: Long) extends Tok
  final case class TFloat(v: Double) extends Tok
  final case class TStr(s: String) extends Tok
  final case class TPunct(c: String) extends Tok

  def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace || c == ',') i += 1
      else if (c == '#') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '"') {
        if (src.startsWith("\"\"\"", i)) {
          val end = src.indexOf("\"\"\"", i + 3)
          require(end >= 0, "unterminated block string")
          out += TStr(src.substring(i + 3, end))
          i = end + 3
        } else {
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (i < n && !closed) {
            val ch = src.charAt(i)
            if (ch == '"') { closed = true; i += 1 }
            else if (ch == '\\' && i + 1 < n) {
              // full GraphQL EscapedCharacter set + \uXXXX; an unknown
              // escape is a loud error — mapping it to its literal char
              // silently corrupted values ("café" became "cafu00e9")
              src.charAt(i + 1) match {
                case 'n' => sb += '\n'; i += 2
                case 't' => sb += '\t'; i += 2
                case 'r' => sb += '\r'; i += 2
                case 'b' => sb += '\b'; i += 2
                case 'f' => sb += '\f'; i += 2
                case '"' => sb += '"'; i += 2
                case '\\' => sb += '\\'; i += 2
                case '/' => sb += '/'; i += 2
                case 'u' =>
                  require(i + 5 < n, s"truncated \\u escape at $i")
                  val hex = src.substring(i + 2, i + 6)
                  require(hex.forall(ch0 =>
                    ch0.isDigit || ('a' to 'f').contains(ch0.toLower)),
                    s"invalid \\u escape '\\u$hex'")
                  sb += Integer.parseInt(hex, 16).toChar
                  i += 6
                case other => throw new IllegalArgumentException(
                  s"unknown string escape '\\$other'")
              }
            } else { sb += ch; i += 1 }
          }
          require(closed, "unterminated string")
          out += TStr(sb.toString)
        }
      } else if (c.isDigit || (c == '-' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        i += 1
        var isFloat = false
        var done = false
        while (i < n && !done) {
          val ch = src.charAt(i)
          if (ch.isDigit) i += 1
          else if (ch == '.' || ch == 'e' || ch == 'E') { isFloat = true; i += 1 }
          else if ((ch == '-' || ch == '+') &&
            (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E')) i += 1
          else done = true
        }
        val s = src.substring(start, i)
        if (isFloat) out += TFloat(s.toDouble) else out += TInt(s.toLong)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        out += TName(src.substring(start, i))
      } else {
        out += TPunct(c.toString); i += 1
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // Values + selections (the operation-document AST)
  // ------------------------------------------------------------------
  sealed trait V
  final case class VStr(s: String) extends V
  final case class VInt(v: Long) extends V
  final case class VDbl(v: Double) extends V
  final case class VBool(v: Boolean) extends V
  case object VNull extends V
  final case class VEnum(name: String) extends V
  final case class VList(vs: Seq[V]) extends V
  final case class VObj(fields: Seq[(String, V)]) extends V {
    def get(k: String): Option[V] = fields.collectFirst { case (`k`, v) => v }
  }

  /** One selection: `alias: name(args) { subselections }`. */
  final case class Sel(alias: String, name: String, args: VObj, sels: Seq[Sel])

  final case class Operation(kind: String, roots: Seq[Sel]) // kind: query|mutation

  private final class P(toks: Vector[Tok], vars: Map[String, Any]) {
    private var pos = 0
    def eof: Boolean = pos >= toks.length
    def peek: Tok = { require(!eof, "unexpected end of input"); toks(pos) }
    def next(): Tok = { val t = peek; pos += 1; t }
    def expectPunct(c: String): Unit = next() match {
      case TPunct(`c`) => ()
      case other => fail(s"expected '$c'", other)
    }
    def expectName(): String = next() match {
      case TName(s) => s
      case other => fail("expected a name", other)
    }
    def peekIsPunct(c: String): Boolean =
      !eof && (peek match { case TPunct(`c`) => true; case _ => false })
    def peekIsName(s: String): Boolean =
      !eof && (peek match { case TName(`s`) => true; case _ => false })
    def requireConsumed(): Unit =
      require(eof, s"GraphQL parse error: unexpected trailing input " +
        s"starting at ${toks(pos)} — one operation per document")
    private def fail(msg: String, got: Tok): Nothing =
      throw new IllegalArgumentException(s"GraphQL parse error: $msg, got $got")

    def parseValue(): V = next() match {
      case TStr(s) => VStr(s)
      case TInt(v) => VInt(v)
      case TFloat(v) => VDbl(v)
      case TName("true") => VBool(true)
      case TName("false") => VBool(false)
      case TName("null") => VNull
      case TName(s) => VEnum(s)
      case TPunct("$") =>
        val name = expectName()
        val raw = vars.getOrElse(name,
          throw new IllegalArgumentException(s"undefined variable $$$name"))
        anyToV(raw)
      case TPunct("[") =>
        val items = Seq.newBuilder[V]
        while (!peekIsPunct("]")) items += parseValue()
        expectPunct("]")
        VList(items.result())
      case TPunct("{") => parseObjBody()
      case other => fail("expected a value", other)
    }

    /** `{` already consumed. */
    def parseObjBody(): VObj = {
      val fields = Seq.newBuilder[(String, V)]
      while (!peekIsPunct("}")) {
        val k = expectName()
        expectPunct(":")
        fields += k -> parseValue()
      }
      expectPunct("}")
      VObj(fields.result())
    }

    def parseArgs(): VObj =
      if (!peekIsPunct("(")) VObj(Nil)
      else {
        expectPunct("(")
        val fields = Seq.newBuilder[(String, V)]
        while (!peekIsPunct(")")) {
          val k = expectName()
          expectPunct(":")
          fields += k -> parseValue()
        }
        expectPunct(")")
        VObj(fields.result())
      }

    def parseSelections(): Seq[Sel] = {
      expectPunct("{")
      val sels = Seq.newBuilder[Sel]
      while (!peekIsPunct("}")) {
        val first = expectName()
        val (alias, name) =
          if (peekIsPunct(":")) { expectPunct(":"); (first, expectName()) }
          else (first, first)
        val args = parseArgs()
        val subs = if (peekIsPunct("{")) parseSelections() else Nil
        sels += Sel(alias, name, args, subs)
      }
      expectPunct("}")
      val r = sels.result()
      // GraphQL grammar: a selection set is non-empty. Accepting `{}`
      // pushed the failure downstream to an empty-projection plan error
      // (or, on a mutation root, silently did nothing).
      require(r.nonEmpty, "GraphQL parse error: empty selection set {}")
      r
    }

    def parseOperation(): Operation = {
      val kind =
        if (peekIsName("query")) { next(); "query" }
        else if (peekIsName("mutation")) { next(); "mutation" }
        else "query" // anonymous shorthand `{ ... }`
      // optional operation name, then optional (ignored) variable
      // declarations — the name is OPTIONAL before the declarations
      // ("query ($x: Float!) { … }" is valid GraphQL that stock clients
      // emit; unconditionally expecting a name 400'd it)
      if (!peekIsPunct("{") && !peekIsPunct("(")) expectName()
      if (peekIsPunct("(")) { // skip variable declarations
        var depth = 0
        var going = true
        while (going) next() match {
          case TPunct("(") => depth += 1
          case TPunct(")") => depth -= 1; going = depth > 0
          case _ => ()
        }
      }
      val op = Operation(kind, parseSelections())
      // the parser serves ONE operation per document: anything left over
      // (a second operation, pasted garbage, a stray brace) must reject
      // loudly — silently ignoring it made clients believe a trailing
      // mutation executed
      requireConsumed()
      op
    }
  }

  private def anyToV(x: Any): V = x match {
    case s: String => VStr(s)
    case i: Int => VInt(i.toLong)
    case l: Long => VInt(l)
    case d: Double => VDbl(d)
    case b: Boolean => VBool(b)
    case xs: Seq[_] => VList(xs.map(anyToV))
    case m: Map[_, _] =>
      VObj(m.toSeq.map { case (k, v) => k.toString -> anyToV(v) })
    case null => VNull
    case other => throw new IllegalArgumentException(
      s"unsupported variable value: ${other.getClass}")
  }

  def parseOperation(text: String, vars: Map[String, Any] = Map()): Operation =
    new P(lex(text), vars).parseOperation()

  /** Parse a standalone filter object (`{owner: {eq: $email}}`) with
    * variables — the form @auth expressions take (GqlApi compiles them
    * into the query plan; the reference's zef-lang auth strings serve the
    * same role, generate_api2.py + test_simplegql.py:28-77). */
  def parseFilterObject(text: String, vars: Map[String, Any]): VObj =
    new P(lex(text), vars).parseValue() match {
      case o: VObj => o
      case other => throw new IllegalArgumentException(
        s"@auth expression must be a filter object, got $other")
    }

  // ------------------------------------------------------------------
  // Schema SDL
  // ------------------------------------------------------------------
  /** One schema field. `rt` is the graph relation type it reads/writes
    * (simple_capitalize(name) unless @relation(rt:) overrides);
    * `tpe` the named GraphQL type with list/required unwrapped.
    * `dynamic` names the registered function resolving a computed field
    * (`@dynamic(hook: "fn")`, schema_file_parser.py:169-172) — such a
    * field is never stored. */
  final case class FieldDef(name: String, tpe: String, list: Boolean,
      required: Boolean, unique: Boolean, search: Boolean,
      incoming: Boolean, rt: String, upfetch: Boolean = false,
      dynamic: Option[String] = None)

  /** `hooks`: mutation hooks by event (`@hook(onCreate: "fn", onUpdate:
    * "fn", onRemove: "fn")`, schema_file_parser.py:126-133) — function
    * names resolved through FnRegistry at mutation time. */
  final case class TypeDef(name: String, fields: Seq[FieldDef],
      auth: Map[String, String], hooks: Map[String, String] = Map()) {
    def field(name: String): FieldDef = fields.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"type ${this.name} has no field '$name'"))
  }

  final case class SchemaDef(types: Map[String, TypeDef],
      enums: Map[String, Seq[String]]) {
    def tpe(name: String): TypeDef = types.getOrElse(name,
      throw new IllegalArgumentException(s"unknown type '$name'"))
    def isEntity(name: String): Boolean = types.contains(name)

    /** Declared constraints → the write-path enforcement input
      * (keyed by relation type, matching AddEntity field maps). Dynamic
      * fields are computed, never stored — no value constraints apply. */
    def constraints: GqlLite.Constraints = GqlLite.Constraints(
      unique = types.map { case (n, t) =>
        n -> t.fields.filter(f => f.unique && f.dynamic.isEmpty).map(_.rt)
      }.filter(_._2.nonEmpty),
      required = types.map { case (n, t) =>
        n -> t.fields.filter(f =>
          f.required && !isEntity(f.tpe) && f.dynamic.isEmpty).map(_.rt)
      }.filter(_._2.nonEmpty))

    /** Relation types the schema declares `@search` — the store indexes
      * exactly these (FieldIndex; reference test_simplegql.py:50-60).
      * @dynamic fields are never stored, so they contribute nothing to
      * index even when (mistakenly) marked @search. */
    def searchRts: Seq[String] =
      types.values.flatMap(_.fields.filter(f =>
        f.search && f.dynamic.isEmpty).map(_.rt)).toSeq.distinct
  }

  /** simple_capitalize — firebaseID → FirebaseID, not FirebaseId
    * (schema_file_parser.py:213-217). */
  def capitalize(s: String): String = {
    require(s.nonEmpty); s.head.toUpper +: s.tail
  }

  def parseSchema(sdl: String): SchemaDef = {
    val p = new P(lex(sdl), Map())
    val types = Map.newBuilder[String, TypeDef]
    val enums = Map.newBuilder[String, Seq[String]]
    while (!p.eof) {
      p.expectName() match {
        case "type" =>
          val name = p.expectName()
          val auth = Map.newBuilder[String, String]
          val hooks = Map.newBuilder[String, String]
          while (p.peekIsPunct("@")) {
            p.expectPunct("@")
            val dname = p.expectName()
            val args = p.parseArgs()
            dname match {
              case "auth" => args.fields.foreach {
                case (k, VStr(s)) => auth += k -> s
                case (k, v) => throw new IllegalArgumentException(
                  s"@auth($k:) must be a string, got $v")
              }
              case "hook" => args.fields.foreach {
                // schema_file_parser.py:126-133: only on{Create,Update,Remove}
                case (k @ ("onCreate" | "onUpdate" | "onRemove"), VStr(s)) =>
                  hooks += k -> s
                case (k, _) => throw new IllegalArgumentException(
                  s"unknown hook name '$k' (want onCreate/onUpdate/onRemove" +
                    " with a string function name)")
              }
              case _ => () // other type-level directives (upfetch/RAE) are
              // accepted and ignored: server-runtime concerns out of scope
            }
          }
          p.expectPunct("{")
          val fields = Seq.newBuilder[FieldDef]
          while (!p.peekIsPunct("}")) {
            val fname = p.expectName()
            p.expectPunct(":")
            // type: [Name!]! — unwrap to (named, list, required)
            var list = false
            var required = false
            var tname: String = null
            if (p.peekIsPunct("[")) {
              p.expectPunct("[")
              list = true
              tname = p.expectName()
              if (p.peekIsPunct("!")) p.expectPunct("!")
              p.expectPunct("]")
            } else tname = p.expectName()
            if (p.peekIsPunct("!")) { p.expectPunct("!"); required = true }
            var unique = false; var search = false; var incoming = false
            var upfetch = false
            var dynamic: Option[String] = None
            var relationGiven = false
            var rt = capitalize(fname)
            while (p.peekIsPunct("@")) {
              p.expectPunct("@")
              val dname = p.expectName()
              val args = p.parseArgs()
              dname match {
                case "unique" => unique = true
                case "search" => search = true
                case "incoming" => incoming = true
                case "upfetch" => upfetch = true
                case "relation" =>
                  relationGiven = true
                  args.get("rt") match {
                    case Some(VStr(s)) => rt = s
                    case Some(VEnum(s)) => rt = s
                    case _ => throw new IllegalArgumentException(
                      "@relation requires an rt: argument")
                  }
                case "dynamic" =>
                  // @dynamic(hook: "fn") — a computed field backed by a
                  // registered function (schema_file_parser.py:169-172)
                  dynamic = args.get("hook") match {
                    case Some(VStr(s)) => Some(s)
                    case _ => throw new IllegalArgumentException(
                      "@dynamic must take a single argument, 'hook'")
                  }
                case other => throw new IllegalArgumentException(
                  s"unknown field directive @$other")
              }
            }
            if (upfetch && !(unique && required))
              throw new IllegalArgumentException(
                s"@upfetch field '$fname' must also be @unique and required " +
                  "(the reference's resolve_upfetch relies on both)")
            if (dynamic.isDefined && relationGiven)
              throw new IllegalArgumentException( // schema_file_parser.py:345
                s"can't give a relation with a dynamically resolved field: $fname")
            fields += FieldDef(fname, tname, list, required, unique,
              search, incoming, rt, upfetch, dynamic)
          }
          p.expectPunct("}")
          types += name -> TypeDef(name, fields.result(), auth.result(),
            hooks.result())
        case "enum" =>
          val name = p.expectName()
          p.expectPunct("{")
          val vals = Seq.newBuilder[String]
          while (!p.peekIsPunct("}")) vals += p.expectName()
          p.expectPunct("}")
          enums += name -> vals.result()
        case other => throw new IllegalArgumentException(
          s"unsupported top-level schema element '$other'")
      }
    }
    val schema = SchemaDef(types.result(), enums.result())
    // post-parse validation: dynamic fields must resolve to scalars — an
    // entity-typed dynamic field would need per-object graph traversal at
    // resolve time (the reference's driver-eval model; out of scope here)
    schema.types.values.foreach { t =>
      t.fields.filter(_.dynamic.isDefined).foreach { f =>
        if (schema.isEntity(f.tpe)) throw new IllegalArgumentException(
          s"@dynamic field '${t.name}.${f.name}' must be scalar-typed")
      }
    }
    schema
  }
}
