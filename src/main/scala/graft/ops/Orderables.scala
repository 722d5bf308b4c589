package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.RowOrdering

/** Canonical ORDERABLE tie keys for columns whose types Spark cannot
  * order directly. Used by the deterministic-tie contracts of
  * [[AsOfJoin]] and [[ZOps]]'s maxBy/minBy: ties must break the same way
  * under any partitioning, which needs a total order — maps don't have
  * one natively (internal bucket order is physical, not semantic), but a
  * one-level map's sorted entry array is a canonical total order over
  * its CONTENT. */
object Orderables {

  /** The column itself when its type is orderable; `sort_array(
    * map_entries(c))` for a one-level map whose entries are orderable;
    * None for deeper non-orderable nesting — such content then cannot
    * influence a tie (the documented residual: rows identical in every
    * canonicalizable column keep an unspecified winner). */
  def canonicalKey(dt: DataType, c: Column): Option[Column] =
    if (RowOrdering.isOrderable(dt)) Some(c)
    else dt match {
      case m: MapType =>
        val entries = ArrayType(StructType(Seq(
          StructField("key", m.keyType), StructField("value", m.valueType))))
        if (RowOrdering.isOrderable(entries)) Some(sort_array(map_entries(c)))
        else None
      case _ => None
    }
}
