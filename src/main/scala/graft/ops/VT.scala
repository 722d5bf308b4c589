package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The logical ValueType calculus (SURVEY §1.3b; reference
  * `python/zef/core/VT/sets.py:115-302`): set-theoretic types used as
  * predicates — `Union`, `Intersection`, `Complement`, `Is[pred]`,
  * ranges, set membership — all compiling to boolean `Column`
  * expressions, so `filter[VT]` and `is_a` are ordinary Catalyst
  * predicates (pushdown-able, codegen'd).
  */
sealed trait VT {
  /** `is_a(x, VT)` as a Column predicate (impl.py:6975). */
  def isA(c: Column): Column

  /** Human-readable type expression — the `specified_type` rendering in
    * mismatch diagnostics. */
  def describe: String

  /** Failing-branch diagnostics as an `ARRAY<STRING>` Column: empty when
    * the value matches, else one path-prefixed message per failing
    * branch. Only non-matching subtrees contribute (the reference's
    * `filter_success=True` default — Intersection gets it for free:
    * matching legs emit empty arrays). */
  private[graft] def mismatches(c: Column, path: String): Column

  /** zef `explain[VT]` (implementation_typing_functions.py:10335):
    * WHY a value does/doesn't match a type, as data. The reference
    * returns a nested dict `{value, specified_type, actual_type, is_a,
    * explanation: [failing sub-explanations]}`; here the same content
    * compiles to one struct Column — nested branch positions flattened
    * into path-prefixed message strings — so the diagnostic runs
    * distributed over a whole column, not value-at-a-time. */
  def explain(c: Column): Column = struct(
    isA(c).as("is_a"),
    lit(describe).as("specified_type"),
    typeof(c).as("actual_type"),
    mismatches(c, "$").as("explanation"))

  /** The value rendered for messages (nulls included). */
  protected def vstr(c: Column): Column =
    coalesce(c.cast("string"), lit("null"))

  protected def noMessages: Column = typedLit(Seq.empty[String])

  /** Default leaf diagnostic: `<path>: value <v> is not <describe>`. */
  private[graft] def leafMismatch(c: Column, path: String): Column =
    when(isA(c), noMessages).otherwise(array(concat(
      lit(s"$path: value "), vstr(c), lit(s" is not $describe"))))

  // associative combinators flatten (reference sets.py simplification),
  // so `a & b & c` renders and explains as ONE three-leg intersection
  def |(other: VT): VT = VT.Union((this match {
    case VT.Union(vs @ _*) => vs
    case v => Seq(v)
  }) ++ (other match {
    case VT.Union(vs @ _*) => vs
    case v => Seq(v)
  }): _*)
  def &(other: VT): VT = VT.Intersection((this match {
    case VT.Intersection(vs @ _*) => vs
    case v => Seq(v)
  }) ++ (other match {
    case VT.Intersection(vs @ _*) => vs
    case v => Seq(v)
  }): _*)
  def unary_! : VT = VT.Complement(this)
}

object VT {
  /** Spark-type membership (storage VRT layer, tokens.h:302-334). */
  final case class OfType(typeName: String) extends VT {
    def isA(c: Column): Column = {
      // typeof is evaluated per-value; for a typed column this folds to a
      // constant — the common case costs nothing after optimization.
      typeof(c) === lit(typeName)
    }
    def describe: String = typeName
    private[graft] def mismatches(c: Column, path: String): Column =
      leafMismatch(c, path)
  }
  /** Arbitrary predicate — zef `Is[pred]`; `label` is what diagnostics
    * call it (the reference prints the predicate function). */
  final case class Is(pred: Column => Column, label: String = "Is[...]")
      extends VT {
    def isA(c: Column): Column = pred(c)
    def describe: String = label
    private[graft] def mismatches(c: Column, path: String): Column =
      leafMismatch(c, path)
  }
  final case class Union(vts: VT*) extends VT {
    def isA(c: Column): Column = vts.map(_.isA(c)).reduce(_ || _)
    def describe: String = vts.map(_.describe).mkString("Union[", " | ", "]")
    private[graft] def mismatches(c: Column, path: String): Column =
      // when the union fails, EVERY alternative failed: one header plus
      // each alternative's own diagnostics
      when(isA(c), noMessages).otherwise(concat(
        array(concat(lit(s"$path: value "), vstr(c),
          lit(s" matched no alternative of $describe"))) +:
          vts.map(_.mismatches(c, path)): _*))
  }
  final case class Intersection(vts: VT*) extends VT {
    def isA(c: Column): Column = vts.map(_.isA(c)).reduce(_ && _)
    def describe: String =
      vts.map(_.describe).mkString("Intersection[", " & ", "]")
    private[graft] def mismatches(c: Column, path: String): Column =
      // matching legs contribute empty arrays — only failing legs speak
      concat(vts.map(_.mismatches(c, path)): _*)
  }
  final case class Complement(vt: VT) extends VT {
    def isA(c: Column): Column = !vt.isA(c)
    def describe: String = s"Complement[${vt.describe}]"
    private[graft] def mismatches(c: Column, path: String): Column =
      when(isA(c), noMessages).otherwise(array(concat(
        lit(s"$path: value "), vstr(c),
        lit(s" matched complemented type ${vt.describe}"))))
  }
  /** zef `is_between` as a type (SetOf-range). */
  final case class Between(lo: Any, hi: Any) extends VT {
    def isA(c: Column): Column = c.between(lit(lo), lit(hi))
    def describe: String = s"Between[$lo, $hi]"
    private[graft] def mismatches(c: Column, path: String): Column =
      leafMismatch(c, path)
  }
  final case class InSet(values: Any*) extends VT {
    def isA(c: Column): Column = c.isin(values.map(lit(_)): _*)
    def describe: String = values.mkString("SetOf[", ", ", "]")
    private[graft] def mismatches(c: Column, path: String): Column =
      leafMismatch(c, path)
  }
  /** Dict/struct shape matching — zef `Pattern[{...}]` (impl.py:4298):
    * every named field must exist (non-null) and satisfy its VT. */
  final case class Pattern(fields: (String, VT)*) extends VT {
    def isA(c: Column): Column =
      fields.map { case (f, vt) =>
        c.getField(f).isNotNull && vt.isA(c.getField(f))
      }.reduce(_ && _)
    def describe: String = fields
      .map { case (f, vt) => s"$f: ${vt.describe}" }
      .mkString("Pattern[{", ", ", "}]")
    private[graft] def mismatches(c: Column, path: String): Column =
      // per-field: absent/null key is its own rule (reference 'Dict
      // missing key'), else recurse under the extended path
      concat(fields.map { case (f, vt) =>
        when(c.getField(f).isNull,
          array(lit(s"$path.$f: missing or null key")))
          .otherwise(vt.mismatches(c.getField(f), s"$path.$f"))
      }: _*)
  }

  val Any: VT = Is(_ => lit(true), "Any")
  val Nothing: VT = Is(_ => lit(false), "Nothing")
  val IsNull: VT = Is(_.isNull, "Nil")

  /** zef `match[cases]` (impl.py:403): first matching VT wins; no match →
    * error sentinel via the `orElse` arm (exhaustiveness the caller picks). */
  def matchOn(c: Column, cases: Seq[(VT, Column)], orElse: Column): Column =
    cases.foldRight(orElse) { case ((vt, out), acc) =>
      when(vt.isA(c), out).otherwise(acc)
    }
}
