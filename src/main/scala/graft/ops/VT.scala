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

  def |(other: VT): VT = VT.Union(this, other)
  def &(other: VT): VT = VT.Intersection(this, other)
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
  }
  /** Arbitrary predicate — zef `Is[pred]`. */
  final case class Is(pred: Column => Column) extends VT {
    def isA(c: Column): Column = pred(c)
  }
  final case class Union(vts: VT*) extends VT {
    def isA(c: Column): Column = vts.map(_.isA(c)).reduce(_ || _)
  }
  final case class Intersection(vts: VT*) extends VT {
    def isA(c: Column): Column = vts.map(_.isA(c)).reduce(_ && _)
  }
  final case class Complement(vt: VT) extends VT {
    def isA(c: Column): Column = !vt.isA(c)
  }
  /** zef `is_between` as a type (SetOf-range). */
  final case class Between(lo: Any, hi: Any) extends VT {
    def isA(c: Column): Column = c.between(lit(lo), lit(hi))
  }
  final case class InSet(values: Any*) extends VT {
    def isA(c: Column): Column = c.isin(values.map(lit(_)): _*)
  }
  /** Dict/struct shape matching — zef `Pattern[{...}]` (impl.py:4298):
    * every named field must exist (non-null) and satisfy its VT. */
  final case class Pattern(fields: (String, VT)*) extends VT {
    def isA(c: Column): Column =
      fields.map { case (f, vt) =>
        c.getField(f).isNotNull && vt.isA(c.getField(f))
      }.reduce(_ && _)
  }

  val Any: VT = Is(_ => lit(true))
  val Nothing: VT = Is(_ => lit(false))
  val IsNull: VT = Is(_.isNull)

  /** zef `match[cases]` (impl.py:403): first matching VT wins; no match →
    * error sentinel via the `orElse` arm (exhaustiveness the caller picks). */
  def matchOn(c: Column, cases: Seq[(VT, Column)], orElse: Column): Column =
    cases.foldRight(orElse) { case ((vt, out), acc) =>
      when(vt.isA(c), out).otherwise(acc)
    }
}
