package graft.core

import java.sql.Timestamp

/** Columnar schema of the temporal property graph (SURVEY.md §1.2).
  *
  * The reference (zefhub/zef) stores a row-oriented append-only blob log with
  * denormalized validity intervals on each atom (`core/include/blobs.h:159-161,
  * 221-225`). We keep the *semantics* — every entity/relation/attribute-entity
  * carries an instantiation/termination time-slice interval; relations are
  * first-class atoms so they can be endpoints of other relations
  * (`core/include/blobs.h:217`) — but invert the layout to columnar
  * DataFrames for scan/join-oriented execution at scale.
  *
  * Partitioning posture at 100 TB: `atoms` is written partitioned by
  * (kind, atype) so `all[ET.X]` scans prune to one partition tree
  * (the analogue of zef's per-type instance lists, `blobs.h:136-144`), and
  * bucketed by atom_id so traversal joins co-locate; `values` is bucketed by
  * ae_id for shuffle-free as-of resolution against the AE partition.
  */
object Kind {
  val Entity = "entity"
  val Relation = "relation"
  val AttributeEntity = "ae"
}

/** One atom: entity, relation, or attribute entity.
  * src_id/dst_id are null except for relations. term_slice null = alive.
  * origin_uid supports cross-graph merge identity
  * (reference `core/include/uids.h`). */
final case class AtomRow(
    atom_id: String,
    kind: String,
    atype: String,
    src_id: Option[String],
    dst_id: Option[String],
    inst_slice: Int,
    term_slice: Option[Int],
    origin_uid: String)

/** One value assignment event on an attribute entity at a tx slice
  * (reference ATTRIBUTE_VALUE_ASSIGNMENT_EDGE, `core/include/blobs.h:284`).
  * Typed columns instead of zef's content-addressed VALUE_NODEs: columnar
  * typed storage gives codegen'd predicates; dedup comes free from
  * parquet dictionary encoding. */
final case class ValueRow(
    ae_id: String,
    tx_slice: Int,
    vtype: String,
    v_str: Option[String],
    v_long: Option[Long],
    v_double: Option[Double],
    v_bool: Option[Boolean],
    v_ts: Option[Timestamp])

/** Transaction row (reference TX_EVENT_NODE, `core/include/blobs.h:116-125`):
  * tx_id == time_slice (monotone). */
final case class TxRow(tx_id: Int, ts: Timestamp)

/** Tag binding event (reference ASSIGN_TAG_NAME_EDGE chain,
  * `core/include/blobs.h:314-330`): the binding of `tag` as of slice S is
  * the latest row with tx_slice ≤ S; atom_id None = tombstone (untag). */
final case class TagRow(tag: String, atom_id: Option[String], tx_slice: Int)

object Schema {
  /** Core atom columns; any other column on an AtomSet's df is carried
    * pipeline metadata (e.g. traversal provenance) and is preserved by
    * projection ops like `field`. */
  val atomCols: Set[String] = Set("atom_id", "kind", "atype", "src_id",
    "dst_id", "inst_slice", "term_slice", "origin_uid")
}

object ValueRow {
  def of(aeId: String, slice: Int, v: Any): ValueRow = v match {
    case s: String     => ValueRow(aeId, slice, "str", Some(s), None, None, None, None)
    case i: Int        => ValueRow(aeId, slice, "long", None, Some(i.toLong), None, None, None)
    case l: Long       => ValueRow(aeId, slice, "long", None, Some(l), None, None, None)
    case d: Double     => ValueRow(aeId, slice, "double", None, None, Some(d), None, None)
    case b: Boolean    => ValueRow(aeId, slice, "bool", None, None, None, Some(b), None)
    case t: Timestamp  => ValueRow(aeId, slice, "ts", None, None, None, None, Some(t))
    case other => throw new IllegalArgumentException(
      s"unsupported value type: ${other.getClass}")
  }
}
