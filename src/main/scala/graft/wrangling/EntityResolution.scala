package graft.wrangling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import graft.core.GraphSlice

/** Entity-pipeline operators from the reference's data-wrangling module
  * (`python/zef/core/op_implementations/data_wrangling.py`), restated as
  * distributed joins.
  */
object EntityResolution {

  /** One typing rule: an object whose required fields are all present (and
    * optional `where` predicate holds) is of type `et`. First matching rule
    * wins — the iterate-rules shape of reference `infer_types`
    * (data_wrangling.py:144-163) without the driver-side fixpoint loop:
    * rule application is one pass of vectorized predicates. */
  final case class TypeRule(et: String, requiredFields: Seq[String],
      where: Column => Column = _ => lit(true))

  val UnknownType = "ZEF_Unknown"

  /** Classify JSON objects into entity types by shape rules. Adds
    * `inferred_type`; unmatched rows get ZEF_Unknown (the reference's
    * sentinel). jsonCol is a JSON string column. */
  def inferTypes(df: DataFrame, jsonCol: String,
      rules: Seq[TypeRule]): DataFrame = {
    val m = from_json(col(jsonCol), MapType(StringType, StringType)).as("__m")
    val typed = rules.foldRight(lit(UnknownType): Column) { (r, acc) =>
      val shapeOk = r.requiredFields
        .map(f => element_at(col("__m"), f).isNotNull)
        .reduceOption(_ && _).getOrElse(lit(true))
      when(shapeOk && r.where(col("__m")), lit(r.et)).otherwise(acc)
    }
    df.withColumn("__m", m).withColumn("inferred_type", typed).drop("__m")
  }

  /** Match incoming records to EXISTING graph entities by a field value —
    * reference `identify_entities` (data_wrangling.py:280-295): entity
    * resolution against the store. Returns the incoming rows — exactly one
    * output row per input row — with `matched_atom_id` (null = no entity;
    * the caller then instantiates). When SEVERAL store entities share the
    * field value, the min atom_id wins deterministically: an ambiguous
    * value must never multiply the incoming rows (a raw left join did,
    * silently double-processing the same record downstream).
    *
    * Implementation: as-of field resolution on the slice (one aggregate),
    * a per-value min (which also shrinks the build side to one row per
    * value), then the equi-join — the classic lookup join; at scale the
    * store side is pre-bucketed by value hash. */
  def identifyEntities(incoming: DataFrame, slice: GraphSlice, et: String,
      fieldRt: String, valueCol: String, vcol: String = "v_str"): DataFrame = {
    val store = slice.all(et).fieldValue(fieldRt, vcol, "__field_value")
      .groupBy(col("__field_value"))
      .agg(min(col("atom_id")).as("matched_atom_id"))
    incoming.join(store,
      incoming(valueCol) === store("__field_value"), "left")
      .drop("__field_value")
  }
}
