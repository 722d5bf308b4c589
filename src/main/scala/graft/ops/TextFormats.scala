package graft.ops

/** YAML / TOML text formats — zef `from_yaml`/`to_yaml`/`from_toml`
  * (impl.py:7678-7766): hand-rolled parsers for the pragmatic subset those
  * ops actually exercise (block mappings, nested indentation, sequences,
  * flow lists, typed scalars; TOML tables, dotted headers, arrays).
  *
  * Values parse to plain Scala trees (Map/Vector/String/Long/Double/
  * Boolean/null). [[toJson]] bridges into the engine: a YAML/TOML column
  * becomes a JSON column (one UDF call), and from there every native
  * `from_json`/schema-inference/NestedInfer path applies — parse at the
  * edge, stay columnar after.
  */
object TextFormats {

  // ------------------------------------------------------------------
  // Scalars
  // ------------------------------------------------------------------
  private val IntRe = """[+-]?\d+""".r
  private val FloatRe = """[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?""".r

  /** YAML/TOML scalar inference: quoted stays string; else null/bool/
    * int/float; else plain string. */
  def scalar(raw0: String): Any = {
    val raw = raw0.trim
    if (raw.length >= 2 && ((raw.head == '"' && raw.last == '"') ||
        (raw.head == '\'' && raw.last == '\'')))
      return unescape(raw.substring(1, raw.length - 1))
    raw match {
      case "" | "~" | "null" => null
      case "true" => true
      case "false" => false
      // beyond-Long integers stay STRINGS: a toDouble fallback always
      // succeeds on digit runs, so 19+ digit numeric ids silently lost
      // precision (1.2345678901234568E19) — the original text is the only
      // lossless round-trip for them
      case IntRe() => scala.util.Try(raw.toLong).getOrElse(raw)
      case s if FloatRe.matches(s) && (s.contains('.') || s.contains('e') ||
        s.contains('E')) => s.toDouble
      case s => s
    }
  }

  /** Left-to-right unescape of a quoted scalar — sequential replace()
    * calls corrupted adjacent escapes ("a\\nb" became a,\,NEWLINE,b:
    * the \n replace consumed the second backslash) and never collapsed
    * \\ at all (Windows paths kept doubled backslashes). */
  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case 't' => out += '\t'; i += 2
          case '"' => out += '"'; i += 2
          case '\\' => out += '\\'; i += 2
          case other => out += c; out += other; i += 2
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  // ------------------------------------------------------------------
  // YAML (block subset + flow lists)
  // ------------------------------------------------------------------
  /** Parse a YAML document to a Scala tree. Supported: block mappings,
    * nested via indentation, `- ` sequences (of scalars or mappings),
    * flow lists `[a, b]`, comments, blank lines, quoted scalars. */
  def fromYaml(text: String): Any = {
    val lines = text.split("\n", -1).toVector
      .map(stripYamlComment)
      .filter(_.trim.nonEmpty)
      .map(l => (l.indexWhere(_ != ' '), l.trim))
    def parseBlock(from: Int, indent: Int): (Any, Int) = {
      if (from >= lines.length) return (null, from)
      val (_, first) = lines(from)
      if (first.startsWith("- ") || first == "-") parseSeq(from, indent)
      else parseMap(from, indent)
    }
    def parseSeq(from: Int, indent: Int): (Any, Int) = {
      val items = Vector.newBuilder[Any]
      var i = from
      while (i < lines.length && lines(i)._1 == indent &&
          (lines(i)._2.startsWith("- ") || lines(i)._2 == "-")) {
        val body = lines(i)._2.drop(1).trim
        if (body.isEmpty) { // nested block under the dash
          if (i + 1 < lines.length && lines(i + 1)._1 > indent) {
            val (v, next) = parseBlock(i + 1, lines(i + 1)._1)
            items += v; i = next
          } else { items += null; i += 1 } // trailing/blank '-' = null item
        } else if (body.contains(": ") || body.endsWith(":")) {
          // inline first key of a mapping item: re-parse as a mini map by
          // treating the dash position as extra indentation. The item's
          // indent is the key's TRUE column ("-" + the actual run of
          // spaces) — a hardcoded +2 lost every sibling key of a
          // "-  a: 1" item (two spaces after the dash is valid YAML)
          val afterDash = lines(i)._2.drop(1)
          val itemIndent = indent + 1 + afterDash.indexWhere(_ != ' ')
          var j = i + 1
          val sub = Vector.newBuilder[(Int, String)]
          sub += ((itemIndent, body))
          while (j < lines.length && lines(j)._1 >= itemIndent) {
            sub += lines(j); j = j + 1
          }
          items += parseLines(sub.result())
          i = j
        } else { items += parseFlow(body); i += 1 }
      }
      (items.result(), i)
    }
    def parseMap(from: Int, indent: Int): (Any, Int) = {
      val m = Vector.newBuilder[(String, Any)]
      var i = from
      while (i < lines.length && lines(i)._1 == indent &&
          !lines(i)._2.startsWith("- ")) {
        val line = lines(i)._2
        val ci = keyColonIndex(line)
        require(ci > 0, s"YAML: expected 'key:' in '$line'")
        val key = unquoteKey(line.take(ci).trim)
        val rest = line.drop(ci + 1).trim
        if (rest.nonEmpty) { m += key -> parseFlow(rest); i += 1 }
        else if (i + 1 < lines.length && lines(i + 1)._1 > indent) {
          val (v, next) = parseBlock(i + 1, lines(i + 1)._1)
          m += key -> v; i = next
        } else { m += key -> null; i += 1 }
      }
      (ListMapOf(m.result()), i)
    }
    // a `- key: ...` mapping item re-parses its slice as a document (the
    // dash position acts as the extra indentation level)
    def parseLines(ls: Vector[(Int, String)]): Any =
      fromYaml(ls.map { case (ind, s) => (" " * ind) + s }.mkString("\n"))
    if (lines.isEmpty) null
    else {
      val (v, next) = parseBlock(0, lines(0)._1)
      // loud, not lossy: the top-level block must consume the document —
      // a malformed/mixed-structure tail used to be silently discarded
      require(next >= lines.length,
        s"YAML: unparsed content at '${lines(next)._2}' — check indentation")
      v
    }
  }

  /** Quote-aware YAML comment strip: '#' starts a comment only OUTSIDE
    * quotes and only at line start or after whitespace (YAML rule) — the
    * old quote-blind takeWhile truncated quoted scalars ("#fff") and
    * mid-token URLs (http://x#frag). */
  private def stripYamlComment(line: String): String = {
    var inQ = false; var q = ' '
    var i = 0
    while (i < line.length) {
      val c = line(i)
      // escape-aware inside double quotes: \" used to flip the in-quote
      // state and a later '#' truncated the quoted value as a comment
      if (inQ) {
        if (c == '\\' && q == '"' && i + 1 < line.length) i += 1
        else if (c == q) inQ = false
      }
      else if (c == '"' || c == '\'') { inQ = true; q = c }
      else if (c == '#' &&
        (i == 0 || line(i - 1) == ' ' || line(i - 1) == '\t'))
        return line.take(i)
      i += 1
    }
    line
  }

  private def keyColonIndex(line: String): Int = {
    var inQ = false; var q = ' '
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '\\' && q == '"' && i + 1 < line.length) i += 1
        else if (c == q) inQ = false
      }
      else if (c == '"' || c == '\'') { inQ = true; q = c }
      else if (c == ':' && (i + 1 >= line.length || line(i + 1) == ' ')) return i
      i += 1
    }
    -1
  }
  private def unquoteKey(k: String): String =
    if (k.length >= 2 && ((k.head == '"' && k.last == '"') ||
      (k.head == '\'' && k.last == '\''))) k.substring(1, k.length - 1)
    else k

  /** Flow value: `[a, b, c]` list or a scalar. */
  def parseFlow(s0: String): Any = {
    val s = s0.trim
    if (s == "{}") ListMapOf(Nil) // empty flow map (the toYaml round-trip)
    else if (s.startsWith("[") && s.endsWith("]")) {
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Vector.empty[Any]
      else splitTop(inner, ',').map(parseFlow).toVector
    } else scalar(s)
  }

  /** Split on a separator at bracket/quote depth zero. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ = false; var q = ' '
    val cur = new StringBuilder
    s.foreach { c =>
      if (inQ) { if (c == q) inQ = false; cur += c }
      else c match {
        case '"' | '\'' => inQ = true; q = c; cur += c
        case '[' | '{' => depth += 1; cur += c
        case ']' | '}' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    out += cur.toString
    out.result().map(_.trim)
  }

  // insertion-ordered map so round-trips are stable
  private def ListMapOf(kvs: Seq[(String, Any)]): Map[String, Any] =
    scala.collection.immutable.ListMap(kvs: _*)

  /** Emit YAML (block style, 2-space indent). */
  def toYaml(v: Any, indent: Int = 0): String = {
    val pad = "  " * indent
    v match {
      case m: Map[_, _] =>
        m.map { case (k, x) => x match {
          case _: Map[_, _] | _: Seq[_] if nonEmptyColl(x) =>
            s"$pad$k:\n${toYaml(x, indent + 1)}"
          case _ => s"$pad$k: ${scalarOut(x)}"
        }}.mkString("\n")
      case xs: Seq[_] =>
        xs.map {
          case x @ (_: Map[_, _] | _: Seq[_]) if nonEmptyColl(x) =>
            s"$pad-\n${toYaml(x, indent + 1)}"
          case x => s"$pad- ${scalarOut(x)}"
        }.mkString("\n")
      case x => s"$pad${scalarOut(x)}"
    }
  }
  private def nonEmptyColl(x: Any): Boolean = x match {
    case m: Map[_, _] => m.nonEmpty
    case s: Seq[_] => s.nonEmpty
    case _ => false
  }
  private def scalarOut(x: Any): String = x match {
    case null => "null"
    case s: String =>
      // plain ONLY if it re-parses as the same string: "true"/"null"/
      // "123"/"1.5" emitted bare silently changed TYPE on the round-trip,
      // and leading/trailing spaces were trimmed away on re-parse
      val plain = s.nonEmpty && s.trim == s &&
        s.matches("[A-Za-z0-9_ .-]*") &&
        (scalar(s) match { case _: String => true; case _ => false })
      if (plain) s
      else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // empty collections fall through the nonEmptyColl block branches —
    // emit YAML flow forms, not Scala debris ("Vector()")
    case m: Map[_, _] if m.isEmpty => "{}"
    case s: Seq[_] if s.isEmpty => "[]"
    case other => other.toString
  }

  // ------------------------------------------------------------------
  // TOML (tables + dotted headers + arrays subset)
  // ------------------------------------------------------------------
  def fromToml(text: String): Map[String, Any] = {
    var root = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var path: Seq[String] = Nil
    def target(path: Seq[String]): scala.collection.mutable.LinkedHashMap[String, Any] =
      path.foldLeft(root) { (m, k) =>
        m.getOrElseUpdate(k,
          scala.collection.mutable.LinkedHashMap.empty[String, Any])
          .asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
      }
    text.split("\n", -1).map(stripTomlComment).map(_.trim)
      .filter(_.nonEmpty).foreach { line =>
        if (line.startsWith("[") && line.endsWith("]"))
          path = line.substring(1, line.length - 1).split('.').toSeq.map(_.trim)
        else {
          val eq = line.indexOf('=')
          require(eq > 0, s"TOML: expected key = value in '$line'")
          val key = unquoteKey(line.take(eq).trim)
          target(path).put(key, parseFlow(line.drop(eq + 1).trim))
        }
      }
    def freeze(m: scala.collection.mutable.LinkedHashMap[String, Any]): Map[String, Any] =
      ListMapOf(m.toSeq.map {
        case (k, v: scala.collection.mutable.LinkedHashMap[_, _]) =>
          k -> freeze(v.asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]])
        case (k, v) => k -> v
      })
    freeze(root)
  }
  private def stripTomlComment(line: String): String = {
    var inQ = false; var q = ' '
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '\\' && q == '"' && i + 1 < line.length) i += 1
        else if (c == q) inQ = false
      }
      else if (c == '"' || c == '\'') { inQ = true; q = c }
      else if (c == '#') return line.take(i)
      i += 1
    }
    line
  }

  // ------------------------------------------------------------------
  // JSON bridge
  // ------------------------------------------------------------------
  /** Scala tree → JSON text (the bridge into from_json / NestedInfer). */
  def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case m: Map[_, _] => m.map { case (k, x) =>
      toJson(k.toString) + ":" + toJson(x) }.mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(toJson).mkString("[", ",", "]")
    // non-finite doubles are not JSON ("Infinity"/"NaN" poison every
    // downstream from_json) — null, loudly documented, is the JSON answer
    case d: Double if d.isNaN || d.isInfinite => "null"
    case n => n.toString
  }

  /** yaml text → json text (distributed use: wrap in a UDF at the edge of
    * the pipeline, then stay native). */
  def yamlToJson(yaml: String): String = toJson(fromYaml(yaml))
  def tomlToJson(toml: String): String = toJson(fromToml(toml))
}
