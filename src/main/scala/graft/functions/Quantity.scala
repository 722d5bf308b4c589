package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** QuantityFloat/QuantityInt and Enum value semantics (reference
  * `core/include/scalars.h:133-230`, SURVEY §1.3a): unit-carrying scalars
  * where comparison/arithmetic are defined ONLY within the same unit —
  * mixing units is an ERROR, not a null (scalars.h:140-156 throws; so do
  * we, via raise_error inside the expression).
  *
  * Representation: `struct(value: double, unit: string)` — columnar,
  * codegen'd, groupable. (A UDT adds nothing here but opacity; the struct
  * keeps Catalyst statistics and pruning.)
  */
object Quantity {

  def quantity(value: Column, unit: String): Column =
    struct(value.cast("double").as("value"), lit(unit).as("unit"))

  def quantity(value: Column, unit: Column): Column =
    struct(value.cast("double").as("value"), unit.as("unit"))

  def value(q: Column): Column = q.getField("value")
  def unit(q: Column): Column = q.getField("unit")

  /** Guard: both operands same unit, else runtime error (zef semantics).
    * raise_error only evaluates on the mismatch branch; the cast aligns
    * the branch type. NULL inputs null-propagate first (Spark convention —
    * one null row must not abort the job; unguarded, the null comparison
    * fell into the error branch, and the concat'd message itself was null). */
  private def sameUnit(a: Column, b: Column)(out: => Column): Column =
    when(unit(a).isNull || unit(b).isNull, lit(null).cast("double"))
      .when(unit(a) === unit(b), out)
      .otherwise(raise_error(concat(lit("quantity unit mismatch: "),
        unit(a), lit(" vs "), unit(b))).cast("double"))

  def qAdd(a: Column, b: Column): Column =
    quantity(sameUnit(a, b)(value(a) + value(b)), unit(a))
  def qSubtract(a: Column, b: Column): Column =
    quantity(sameUnit(a, b)(value(a) - value(b)), unit(a))
  /** Scalar multiply keeps the unit (zef scalars.h:168). */
  def qScale(a: Column, k: Column): Column = quantity(value(a) * k, unit(a))

  def qLt(a: Column, b: Column): Column = sameUnitBool(a, b)(value(a) < value(b))
  def qLeq(a: Column, b: Column): Column = sameUnitBool(a, b)(value(a) <= value(b))
  def qGt(a: Column, b: Column): Column = sameUnitBool(a, b)(value(a) > value(b))
  def qEq(a: Column, b: Column): Column = sameUnitBool(a, b)(value(a) === value(b))

  private def sameUnitBool(a: Column, b: Column)(out: => Column): Column =
    when(unit(a).isNull || unit(b).isNull, lit(null).cast("boolean"))
      .when(unit(a) === unit(b), out)
      .otherwise(raise_error(concat(lit("quantity unit mismatch: "),
        unit(a), lit(" vs "), unit(b))).cast("boolean"))

  // ---- Enum (EN.Type.value; scalars.h:56-66): typed name pairs ----
  def enum(enumType: String, enumValue: Column): Column =
    struct(lit(enumType).as("enum_type"), enumValue.as("enum_value"))

  def enumEq(a: Column, b: Column): Column =
    when(a.getField("enum_type").isNull || b.getField("enum_type").isNull,
      lit(null).cast("boolean"))
      .when(a.getField("enum_type") === b.getField("enum_type"),
        a.getField("enum_value") === b.getField("enum_value"))
      .otherwise(raise_error(lit("enum type mismatch")).cast("boolean"))
}
