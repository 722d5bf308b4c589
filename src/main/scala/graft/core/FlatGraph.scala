package graft.core

/** FlatGraph — the reference's lightweight immutable in-process graph
  * (`python/zef/core/flat_graph.py:24-80`): the exchange format for
  * subgraphs collected to the driver (e.g. a `gather` result small enough
  * to leave the cluster). Traversal semantics mirror AtomSet exactly, just
  * over local vectors.
  */
final case class FlatGraph(atoms: Vector[AtomRow], values: Vector[ValueRow]) {

  // traversal views are ALIVE-only (a snapshot starts all-alive; local
  // terminations via insert() must drop out of traversals, matching the
  // cluster frame's aliveAt predicate)
  private lazy val aliveAtoms: Vector[AtomRow] = atoms.filter(_.term_slice.isEmpty)
  private lazy val byId: Map[String, AtomRow] = atoms.map(a => a.atom_id -> a).toMap
  private lazy val outEdges: Map[String, Vector[AtomRow]] =
    aliveAtoms.filter(_.kind == Kind.Relation).groupBy(_.src_id.get)
  private lazy val inEdges: Map[String, Vector[AtomRow]] =
    aliveAtoms.filter(_.kind == Kind.Relation).groupBy(_.dst_id.get)

  def apply(id: String): AtomRow = byId(id)
  def get(id: String): Option[AtomRow] = byId.get(id)

  def all(et: String): Vector[AtomRow] =
    aliveAtoms.filter(a => a.kind == Kind.Entity && a.atype == et)

  def outs(id: String, rt: String): Vector[AtomRow] =
    outEdges.getOrElse(id, Vector.empty).filter(_.atype == rt)
      .flatMap(r => byId.get(r.dst_id.get))

  def ins(id: String, rt: String): Vector[AtomRow] =
    inEdges.getOrElse(id, Vector.empty).filter(_.atype == rt)
      .flatMap(r => byId.get(r.src_id.get))

  def outRels(id: String, rt: String): Vector[AtomRow] =
    outEdges.getOrElse(id, Vector.empty).filter(_.atype == rt)

  /** Latest value of the atom's rt field (the FlatGraph is a snapshot, so
    * "latest" = max tx_slice present in the collected values; same-slice
    * ties across field INSTANCES break by ae_id, mirroring the cluster
    * side's pivot tie-break). */
  def field(id: String, rt: String): Option[ValueRow] = {
    val aeIds = outRels(id, rt).map(_.dst_id.get).toSet
    val vs = values.filter(v => aeIds.contains(v.ae_id))
    if (vs.isEmpty) None else Some(vs.maxBy(v => (v.tx_slice, v.ae_id)))
  }

  def size: Int = atoms.size

  /** First slice not yet used by this snapshot's rows — terminations count
    * (a terminate-only insert consumes its slice; reusing it would collapse
    * two logically sequential local transactions into one slice number). */
  def nextSlice: Int =
    (atoms.map(_.inst_slice) ++ atoms.flatMap(_.term_slice) ++
      values.map(_.tx_slice)).maxOption.getOrElse(0) + 1

  /** Local insert/extend — the reference's in-process FlatGraph mutation
    * (`flatgraph_implementations.py` insert/extend), applying the SAME
    * [[Wish]] vocabulary and id scheme as the cluster write path
    * ([[Transactor]]) to the local vectors: entities, relations (with
    * endpoint key resolution), fields (AE + field relation on first use),
    * re-assignment, termination with relation cascade. Purely local —
    * nothing touches Spark; to publish, `transact` the SAME wish list onto
    * the cluster graph and both sides land on identical atom rows
    * (FxSpec round-trips this). Unsupported here: tags (FlatGraph carries
    * no tag table). */
  def insert(wishes: Seq[Wish], slice: Int = nextSlice): FlatGraph = {
    import Transactor.{atomId, aeId, fieldRelId}
    val entityPairs = wishes.collect {
      case PutEntity(et, key) => key -> atomId(Kind.Entity, et, key) }
    val entityIds = entityPairs.toMap
    val relationPairs = wishes.collect {
      case PutRelation(rt, s0, d0, key) =>
        val k = Option(key).getOrElse(s"$s0-$d0")
        k -> atomId(Kind.Relation, rt, k)
    }
    val relationIds = relationPairs.toMap
    // the SAME rejections Transactor applies — the parity contract is
    // "transact the same wish list and land on identical rows", so a
    // list the cluster path rejects must reject here too, not silently
    // resolve a bare key to a different atom than the publish would
    val ambiguous = (entityPairs ++ relationPairs).groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size > 1).keySet
    locally {
      val dup = entityIds.keySet.intersect(relationIds.keySet)
      require(dup.isEmpty,
        s"insert: keys name both an entity and a relation: $dup")
    }
    def ref(key: String): String = {
      require(!ambiguous.contains(key),
        s"insert: key '$key' names atoms of DIFFERENT types in this " +
          "wish list — reference it by full atom_id")
      entityIds.getOrElse(key, relationIds.getOrElse(key,
        if (key.contains(":")) key
        else throw new IllegalArgumentException(
          s"unknown key '$key' — pass a full atom_id for existing atoms")))
    }

    val out = scala.collection.mutable.ArrayBuffer[AtomRow](atoms: _*)
    def alive(id: String): Boolean =
      out.exists(a => a.atom_id == id && a.term_slice.isEmpty)
    def put(row: AtomRow): Unit = if (!alive(row.atom_id)) out += row

    wishes.foreach {
      case PutEntity(et, key) =>
        put(AtomRow(atomId(Kind.Entity, et, key), Kind.Entity, et,
          None, None, slice, None, atomId(Kind.Entity, et, key)))
      case _ => ()
    }
    wishes.foreach {
      case PutRelation(rt, srcKey, dstKey, key) =>
        val k = Option(key).getOrElse(s"$srcKey-$dstKey")
        val id = atomId(Kind.Relation, rt, k)
        put(AtomRow(id, Kind.Relation, rt, Some(ref(srcKey)),
          Some(ref(dstKey)), slice, None, id))
      case _ => ()
    }
    val newVals = scala.collection.mutable.ArrayBuffer[ValueRow]()
    wishes.foreach {
      case PutField(ownerKey, rt, value, inst) =>
        val owner = ref(ownerKey)
        val ae = aeId(owner, rt, inst)
        val rel = fieldRelId(owner, rt, inst)
        put(AtomRow(ae, Kind.AttributeEntity, rt, None, None, slice, None, ae))
        put(AtomRow(rel, Kind.Relation, rt, Some(owner), Some(ae), slice,
          None, rel))
        newVals += ValueRow.of(ae, slice, value)
      case AssignField(ownerKey, rt, value, inst) =>
        val ae = aeId(ref(ownerKey), rt, inst)
        // same existence contract as Transactor: an assign to a
        // never-created AE (wrong instanceKey) must reject, not append a
        // value row no field() read can see
        require(alive(ae),
          s"assign: field AE '$ae' does not exist — use PutField " +
            "(create-or-assign) or pass the instanceKey it was created with")
        newVals += ValueRow.of(ae, slice, value)
      case _: TerminateAtom => () // applied AFTER appends, like Transactor
      case _: PutEntity | _: PutRelation => ()
      case w => throw new IllegalArgumentException(
        s"FlatGraph.insert does not support $w")
    }
    // terminations apply after ALL appends (the Transactor order), so a
    // terminate-before-PutField batch cascade-kills the new field relation
    // here exactly as it does on the cluster
    wishes.foreach {
      case TerminateAtom(key) =>
        val id = ref(key)
        for (i <- out.indices) {
          val a = out(i)
          val hit = a.term_slice.isEmpty && (a.atom_id == id ||
            a.src_id.contains(id) || a.dst_id.contains(id)) // cascade
          if (hit) out(i) = a.copy(term_slice = Some(slice))
        }
      case _ => ()
    }
    // ONE value row per AE per insert, last wish wins — the Transactor's
    // same-tx dedup; appending both rows made field() (first max wins)
    // return the assignment the user OVERWROTE
    val seen = scala.collection.mutable.Set[String]()
    val dedupedNew =
      newVals.reverseIterator.filter(v => seen.add(v.ae_id)).toVector.reverse
    FlatGraph(out.toVector, values ++ dedupedNew)
  }
}

object FlatGraph {
  /** zef `to_flatgraph` (op_implementations/to_flatgraph.py): collect an
    * AtomSet (plus its atoms' field AEs/relations and their values) to the
    * driver. Collects ONLY the closure of the given set — the caller
    * bounds the size (e.g. via gather). */
  def fromAtomSet(as: AtomSet): FlatGraph = {
    import org.apache.spark.sql.functions._
    val spark = as.frame.graph.spark
    import spark.implicits._
    val ids = as.df.select("atom_id")
    val g = as.frame.graph
    val slice = as.frame.slice
    // include field relations + AEs of collected atoms
    val fieldRels = g.atoms
      .filter(col("kind") === Kind.Relation && Graph.aliveAt(slice))
      .join(ids.withColumnRenamed("atom_id", "src_id"), "src_id")
      .filter(col("dst_id").startsWith("ae:"))
    val aeIds = fieldRels.select(col("dst_id").as("atom_id"))
    val allIds = ids.unionByName(fieldRels.select("atom_id"))
      .unionByName(aeIds).distinct()
    // terminations in the frame's FUTURE are nulled: every surviving row
    // is alive AT the snapshot slice by construction, but FlatGraph's
    // alive-views filter term_slice.isEmpty — an atom terminated at
    // slice+1 read as DEAD in the collected snapshot (empty all(),
    // field() None, and insert() appending a duplicate open interval)
    val atoms = g.atoms.filter(Graph.aliveAt(slice))
      .withColumn("term_slice",
        when(col("term_slice") > slice, lit(null)).otherwise(col("term_slice")))
      .join(allIds, "atom_id")
      .as[AtomRow].collect().toVector.sortBy(_.atom_id)
    // values filtered DISTRIBUTED by joining the collected AE id set (small
    // by construction) — never a full values collect
    val aeIdsLocal = atoms.filter(_.kind == Kind.AttributeEntity).map(_.atom_id)
    val vals =
      if (aeIdsLocal.isEmpty) Vector.empty[ValueRow]
      else g.values.filter(col("tx_slice") <= slice)
        .join(aeIdsLocal.toDF("ae_id"), "ae_id")
        .as[ValueRow].collect().toVector.sortBy(v => (v.ae_id, v.tx_slice))
    FlatGraph(atoms, vals)
  }
}
