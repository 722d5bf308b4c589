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
  * map's sorted entry array is a canonical total order over its CONTENT.
  */
object Orderables {

  /** The column itself when its type is orderable; otherwise a
    * recursively canonicalized form — maps become entry arrays sorted on
    * (canonical key, canonical value), arrays canonicalize element-wise,
    * structs field-wise — which is orderable by induction (array<struct>
    * of orderable parts). None only when some LEAF type has no canonical
    * order (CalendarInterval, say): such content then cannot influence a
    * tie — the residual: rows identical in every canonicalizable column
    * keep an unspecified winner. (r12 canonicalized one level; the
    * recursion closes the map-of-struct / nested-map cases.) */
  def canonicalKey(dt: DataType, c: Column): Option[Column] =
    canonicalizer(dt).map(_(c))

  /** The canonicalizing transform for `dt`, or None when a leaf type is
    * not canonicalizable. Built as Column→Column so the recursion can run
    * INSIDE transform() lambdas (per map entry, per array element). */
  private def canonicalizer(dt: DataType): Option[Column => Column] =
    if (RowOrdering.isOrderable(dt)) Some(identity[Column])
    else dt match {
      case m: MapType =>
        for {
          ck <- canonicalizer(m.keyType)
          cv <- canonicalizer(m.valueType)
        } yield (c: Column) =>
          sort_array(transform(map_entries(c), e =>
            struct(ck(e.getField("key")).as("key"),
              cv(e.getField("value")).as("value"))))
      case ArrayType(et, _) =>
        canonicalizer(et).map(f => (c: Column) => transform(c, f))
      case st: StructType =>
        val fs = st.fields.toSeq.map(f =>
          canonicalizer(f.dataType).map(g => (f.name, g)))
        if (fs.exists(_.isEmpty)) None
        else Some { c: Column =>
          // null-guarded: struct() would turn a NULL struct into a
          // struct of nulls, colliding its tie key with a row that
          // genuinely holds all-null fields — distinct content must
          // keep distinct keys or the winner goes unspecified again
          when(c.isNull, lit(null)).otherwise(
            struct(fs.flatten.map { case (n, g) =>
              g(c.getField(n)).as(n) }: _*))
        }
      case _ => None
    }
}
