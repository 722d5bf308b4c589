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
    * sentinel). jsonCol is a JSON string column.
    *
    * The parsed map rides INLINE in the type expression (Catalyst's
    * subexpression elimination shares the from_json across rules) — the
    * previous temp-column form silently destroyed any input column that
    * happened to be named `__m`. A `where` predicate that evaluates to
    * NULL (e.g. a comparison against a missing key) counts as no-match
    * and falls through to the next rule, the natural three-valued
    * reading; invalid JSON parses to a null map, fails every shape
    * check, and lands on the sentinel. */
  def inferTypes(df: DataFrame, jsonCol: String,
      rules: Seq[TypeRule]): DataFrame = {
    val m = from_json(col(jsonCol), MapType(StringType, StringType))
    val typed = rules.foldRight(lit(UnknownType): Column) { (r, acc) =>
      val shapeOk = r.requiredFields
        .map(f => element_at(m, f).isNotNull)
        .reduceOption(_ && _).getOrElse(lit(true))
      when(shapeOk && r.where(m), lit(r.et)).otherwise(acc)
    }
    df.withColumn("inferred_type", typed)
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
    // drop("__field_value") after the join removes EVERY column of that
    // name — an incoming column spelled like either working name would
    // silently vanish (or shadow matched_atom_id); reject it loudly
    Seq("__field_value", "matched_atom_id").foreach { reserved =>
      require(!incoming.columns.contains(reserved),
        s"identifyEntities: incoming carries reserved column '$reserved'" +
          " — rename it before matching")
    }
    val store = slice.all(et).fieldValue(fieldRt, vcol, "__field_value")
      .groupBy(col("__field_value"))
      .agg(min(col("atom_id")).as("matched_atom_id"))
    incoming.join(store,
      incoming(valueCol) === store("__field_value"), "left")
      .drop("__field_value")
  }
}
