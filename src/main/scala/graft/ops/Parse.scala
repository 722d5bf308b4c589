package graft.ops

/** `parse[grammar]` — zef's parser-combinator op (impl.py:9984,
  * `parsing.py`): grammars are VALUES built from small combinators, applied
  * to strings. Driver-side by design, like the reference (a grammar parses
  * one string; over a column, wrap `run` in a UDF at the edge exactly like
  * [[TextFormats.yamlToJson]]).
  *
  * Error positions are byte offsets of the FURTHEST failure — the usual
  * combinator diagnostic.
  */
object Parse {

  /** A parser: input + position → Right((value, next position)) or
    * Left(furthest failing position). */
  final case class P[+A](run: (String, Int) => Either[Int, (A, Int)]) {
    def ~[B](that: => P[B]): P[(A, B)] = P { (s, i) =>
      run(s, i).flatMap { case (a, j) =>
        that.run(s, j).map { case (b, k) => ((a, b), k) } }
    }
    def ~>[B](that: => P[B]): P[B] = (this ~ that).map(_._2)
    def <~[B](that: => P[B]): P[A] = (this ~ that).map(_._1)
    def |[B >: A](that: => P[B]): P[B] = P { (s, i) =>
      run(s, i) match {
        case Left(e1) => that.run(s, i).left.map(e2 => math.max(e1, e2))
        case ok => ok
      }
    }
    def map[B](f: A => B): P[B] = P { (s, i) =>
      run(s, i).map { case (a, j) => (f(a), j) } }
    def rep: P[Vector[A]] = P { (s, i0) =>
      val out = Vector.newBuilder[A]
      var i = i0
      var going = true
      while (going) run(s, i) match {
        case Right((a, j)) if j > i => out += a; i = j
        case Right((a, j)) => out += a; going = false; i = j // empty match: stop
        case Left(_) => going = false
      }
      Right((out.result(), i))
    }
    def rep1: P[Vector[A]] = (this ~ rep).map { case (h, t) => h +: t }
    def opt: P[Option[A]] = map(Some(_): Option[A]) | P.ok(None)
    def sepBy[B](sep: P[B]): P[Vector[A]] =
      ((this ~ (sep ~> this).rep).map { case (h, t) => h +: t }) | P.ok(Vector())

    /** Parse the WHOLE string or throw with the furthest-failure offset.
      * The watermark survives *successful* branches (`rep`, `opt`, `|`
      * fallback): a trailing-input error reports the furthest point any
      * alternative reached, not just where the top-level parser stopped. */
    def parseAll(s: String): A = {
      P.watermark.set(-1)
      run(s, 0) match {
        case Right((a, i)) if i == s.length => a
        case Right((_, i)) =>
          val e = math.max(i, P.watermark.get)
          throw new IllegalArgumentException(
            s"parse error at offset $e: '${s.drop(e).take(20)}'")
        case Left(e0) =>
          val e = math.max(e0, P.watermark.get)
          throw new IllegalArgumentException(
            s"parse error at offset $e: '${s.drop(e).take(20)}'")
      }
    }
  }

  object P {
    def ok[A](a: A): P[A] = P((_, i) => Right((a, i)))

    /** Furthest failure seen during the current `parseAll` run, including
      * failures later swallowed by a success (`rep` stopping, `opt`/`|`
      * falling back). Thread-local: grammars are plain values shared across
      * threads (e.g. inside a UDF), but each parse runs on one thread. */
    private[Parse] val watermark: ThreadLocal[Int] =
      ThreadLocal.withInitial(() => -1)

    private[Parse] def fail(i: Int): Left[Int, Nothing] = {
      if (i > watermark.get) watermark.set(i)
      Left(i)
    }
  }

  /** Literal string. */
  def lit(t: String): P[String] = P { (s, i) =>
    if (s.startsWith(t, i)) Right((t, i + t.length)) else P.fail(i)
  }

  /** Regex (anchored at the position). Matches at the offset via
    * matcher.region + lookingAt — `s.substring(i)` copied the remaining
    * suffix on EVERY combinator invocation, making rep() parses quadratic
    * in input length. */
  def re(pattern: String): P[String] = {
    val r = java.util.regex.Pattern.compile(pattern)
    P { (s, i) =>
      val m = r.matcher(s)
      m.region(i, s.length)
      if (m.lookingAt()) Right((m.group(), m.end())) else P.fail(i)
    }
  }

  val ws: P[String] = re("\\s*")
  /** Token: literal with trailing whitespace skipped. */
  def tok(t: String): P[String] = lit(t) <~ ws
  val number: P[Double] = re("[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)") .map(_.toDouble) <~ ws
  val ident: P[String] = re("[A-Za-z_][A-Za-z0-9_]*") <~ ws
  val quoted: P[String] = (lit("\"") ~> re("(\\\\.|[^\"])*") <~ lit("\"") <~ ws)
    .map(_.replace("\\\"", "\"").replace("\\\\", "\\"))

  /** Lazy wrapper for recursive grammars. */
  def defer[A](p: => P[A]): P[A] = P((s, i) => p.run(s, i))

  /** `parse[grammar]` over a DataFrame column — the UDF-at-the-edge bridge
    * (same pattern as [[TextFormats.yamlToJson]]): the grammar runs per row
    * on executors, non-matching rows yield null. Grammars are immutable
    * values, so sharing one `P` across executor threads is safe (the
    * failure watermark is thread-local and unused on this path).
    *
    * The result type must be Spark-encodable (primitives, case classes,
    * collections of those) — parse to a case class for a struct column.
    */
  def parseColumn[A](p: P[A], c: org.apache.spark.sql.Column)
      (implicit tt: scala.reflect.runtime.universe.TypeTag[A])
      : org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) None
      else p.run(s, 0) match {
        case Right((a, i)) if i == s.length => Some(a)
        case _ => None
      }
    }
    f(c)
  }
}
