package graft.core

/** zascii — the reference's ASCII-art graph fixture DSL
  * (`python/zef/deprecated/tools/zascii.py`, surfaced as
  * `zascii_to_flatgraph`, implementation_typing_functions.py:7978-8066):
  * element expressions connected by drawn arrows, parsed into graph
  * construction actions.
  *
  * The reference crawls arbitrary 2D paths (corners, junctions, vertical
  * runs — ~1000 lines of geometry). This is the documented SUBSET that
  * covers what the DSL is actually used for here — concise test fixtures:
  * HORIZONTAL arrows (box-drawing `─` or ASCII `-` shafts, arrowhead `►`/
  * `>` pointing right or `◄`/`<` pointing left) whose `RT.Label` is
  * written on the line directly above or below the shaft, overlapping its
  * column span.
  *
  * Elements: `ET.Type` / `ET.Type[key]` entities (unkeyed occurrences get
  * deterministic keys `z1, z2…` in reading order) and scalar literals
  * (int, float, true/false, `"quoted string"`). An arrow into a scalar is
  * a field ([[PutField]] on the entity at the tail); entity→entity is a
  * relation ([[PutRelation]]). Repeated (entity, field) pairs become
  * multi-valued fields via instance keys, like the reference's
  * one-AE-per-value semantics.
  *
  * Output is a plain [[Wish]] list — run it through
  * [[Transactor.transact]] like any hand-written fixture.
  */
object Zascii {

  private val shaftChars = Set('─', '-')
  private val lineArt = Set('─', '-', '│', '|', '►', '◄', '▼', '▲', '>', '<',
    '┌', '┐', '└', '┘', '├', '┤', '┬', '┴', '┼')

  /** Token at [start, end) on a line. */
  private final case class Tok(line: Int, start: Int, end: Int, text: String)
  /** Horizontal arrow at [start, end) on a line. */
  private final case class Arrow(line: Int, start: Int, end: Int,
      rightward: Boolean)

  private val EtPat = """^ET\.([A-Za-z0-9_]+)(?:\[([A-Za-z0-9_\-]+)\])?$""".r
  private val RtPat = """^RT\.([A-Za-z0-9_]+)$""".r
  private val IntPat = """^[+-]?\d+$""".r
  private val FloatPat = """^[+-]?(?:\d+\.\d*|\.\d+)$""".r

  private def tokensOf(lineNo: Int, line: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (c == '"') {
        val j = line.indexOf('"', i + 1)
        require(j >= 0, s"line ${lineNo + 1}: unterminated string at col $i")
        out += Tok(lineNo, i, j + 1, line.substring(i, j + 1))
        i = j + 1
      } else if (c == '-' && i + 1 < line.length &&
          (line(i + 1).isDigit || line(i + 1) == '.') &&
          (i == 0 || line(i - 1) == ' ' || line(i - 1) == '\t')) {
        // a NEGATIVE literal: '-' is in lineArt, so the blanket skip ate
        // the sign ("-42" transacted as 42, silently). A minus that starts
        // a number after whitespace is a token, not arrow shaft — shafts
        // are preceded by more shaft or a head, never by start-of-number.
        var j = i + 1
        while (j < line.length && !line(j).isWhitespace &&
          line(j) != '"' && !lineArt(line(j))) j += 1
        out += Tok(lineNo, i, j, line.substring(i, j))
        i = j
      } else if (c == ' ' || c == '\t' || lineArt(c)) i += 1
      else {
        // bracket-aware: '-' is shaft art OUTSIDE a key bracket but a
        // legal key character INSIDE one (EtPat's key class allows it) —
        // the blanket lineArt stop split "ET.User[bob-1]" at the hyphen
        // into two junk tokens neither of which matched the grammar
        var j = i
        var inBracket = false
        while (j < line.length && !line(j).isWhitespace && line(j) != '"' &&
          (!lineArt(line(j)) || (inBracket && line(j) == '-'))) {
          if (line(j) == '[') inBracket = true
          else if (line(j) == ']') inBracket = false
          j += 1
        }
        out += Tok(lineNo, i, j, line.substring(i, j))
        i = j
      }
    }
    out.result()
  }

  private def arrowsOf(lineNo: Int, line: String): Vector[Arrow] = {
    val out = Vector.newBuilder[Arrow]
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (c == '"') {
        // skip quoted literals entirely — a string containing "-->" must
        // not produce a phantom arrow (tokensOf already treats quotes as
        // opaque; the arrow scan has to agree with it)
        val j = line.indexOf('"', i + 1)
        i = if (j >= 0) j + 1 else line.length
      } else if (c == '◄' || c == '<' || shaftChars(c)) {
        val s0 = i
        val leftHead = c == '◄' || c == '<'
        if (leftHead) i += 1
        var shaft = 0
        while (i < line.length && shaftChars(line(i))) { shaft += 1; i += 1 }
        val rightHead = i < line.length && (line(i) == '►' || line(i) == '>')
        if (rightHead) i += 1
        // a real edge has a shaft and EXACTLY one head; anything else is
        // stray punctuation and ignored (e.g. "-" between bare tokens)
        if (shaft >= 2 && (leftHead ^ rightHead))
          out += Arrow(lineNo, s0, i, rightHead)
      } else i += 1
    }
    out.result()
  }

  /** Parse a zascii figure into transactable wishes. */
  def parse(s: String): Seq[Wish] = {
    val lines = s.split("\n", -1).toVector
    val toks = lines.zipWithIndex.flatMap { case (l, i) => tokensOf(i, l) }
    val arrows = lines.zipWithIndex.flatMap { case (l, i) => arrowsOf(i, l) }

    // classify tokens; RT.* are labels, everything else is a node
    val labels = toks.filter(t => RtPat.findFirstIn(t.text).isDefined)
    val nodes = toks.filterNot(labels.contains)

    // entity keys: declared [key] or generated z1, z2… in reading order
    var nextId = 0
    val nodeKey = scala.collection.mutable.Map.empty[Tok, String]
    val entities = Vector.newBuilder[(String, String)] // (et, key)
    nodes.foreach { t =>
      t.text match {
        case EtPat(et, key) =>
          val k = Option(key).getOrElse { nextId += 1; s"z$nextId" }
          nodeKey(t) = k
          entities += ((et, k))
        case other if other.startsWith("AET.") =>
          throw new IllegalArgumentException(
            s"line ${t.line + 1}: bare AET targets are outside the zascii " +
              "subset — point the arrow at a scalar literal instead")
        case _ => () // scalar literal; resolved at the consuming arrow
      }
    }
    val entDecls = entities.result()
    entDecls.groupBy(_._2).foreach { case (k, ds) =>
      require(ds.map(_._1).distinct.size == 1,
        s"entity key '$k' declared with conflicting types " +
          ds.map(_._1).distinct.mkString(", "))
    }

    def scalarValue(t: Tok): Any = t.text match {
      case q if q.startsWith("\"") => q.substring(1, q.length - 1)
      case IntPat() => t.text.toLong
      case FloatPat() => t.text.toDouble
      case "true" | "True" => true
      case "false" | "False" => false
      case other => throw new IllegalArgumentException(
        s"line ${t.line + 1}: '$other' is neither an element nor a literal")
    }

    // resolve each arrow: nearest node left/right on the same line, label
    // on the adjacent line overlapping the shaft's columns
    final case class Edge(rt: String, src: Tok, dst: Tok)
    val edges = arrows.map { a =>
      val left = nodes.filter(t => t.line == a.line && t.end <= a.start)
        .sortBy(_.end).lastOption.getOrElse(throw new IllegalArgumentException(
          s"line ${a.line + 1}: arrow has no element on its left"))
      val right = nodes.filter(t => t.line == a.line && t.start >= a.end)
        .sortBy(_.start).headOption.getOrElse(throw new IllegalArgumentException(
          s"line ${a.line + 1}: arrow has no element on its right"))
      val lab = labels.filter(t =>
        (t.line == a.line - 1 || t.line == a.line + 1) &&
          t.start < a.end && t.end > a.start)
      require(lab.size == 1,
        s"line ${a.line + 1}: arrow at cols ${a.start}-${a.end} needs exactly " +
          s"one RT.Label on the line above or below its shaft (found ${lab.size})")
      val RtPat(rt) = lab.head.text
      if (a.rightward) Edge(rt, left, right) else Edge(rt, right, left)
    }

    // wishes: entities first (reading order), then edges; multi-valued
    // fields get ordinal instance keys only when a (owner, rt) repeats
    val fieldCounts = edges.collect {
      case Edge(rt, src, dst) if !nodeKey.contains(dst) =>
        (nodeKey.getOrElse(src, throw new IllegalArgumentException(
          s"line ${src.line + 1}: field source must be an entity")), rt)
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val seen = scala.collection.mutable.Map.empty[(String, String), Int]

    val entityWishes: Seq[Wish] = entDecls.distinct.map {
      case (et, k) => PutEntity(et, k)
    }
    val edgeWishes: Seq[Wish] = edges.map { case Edge(rt, src, dst) =>
      val srcKey = nodeKey.getOrElse(src, throw new IllegalArgumentException(
        s"line ${src.line + 1}: arrow tail must be an entity, got '${src.text}'"))
      nodeKey.get(dst) match {
        case Some(dstKey) => PutRelation(rt, srcKey, dstKey, s"$srcKey>$dstKey:$rt")
        case None =>
          val v = scalarValue(dst)
          val n = fieldCounts((srcKey, rt))
          val inst =
            if (n <= 1) ""
            else {
              val i = seen.getOrElse((srcKey, rt), 0) + 1
              seen((srcKey, rt)) = i
              i.toString
            }
          PutField(srcKey, rt, v, inst)
      }
    }
    entityWishes ++ edgeWishes
  }

  /** `zascii_to_flatgraph` (implementation_typing_functions.py:7978): parse
    * a figure straight into a local FlatGraph — the concise test-fixture
    * path that never touches the cluster. */
  def toFlatGraph(s: String): FlatGraph =
    FlatGraph(Vector(), Vector()).insert(parse(s))
}
