package graft.core

/** FlatGraph — the reference's lightweight immutable in-process graph
  * (`python/zef/core/flat_graph.py:24-80`): the exchange format for
  * subgraphs collected to the driver (e.g. a `gather` result small enough
  * to leave the cluster). Traversal semantics mirror AtomSet exactly, just
  * over local vectors.
  */
final case class FlatGraph(atoms: Vector[AtomRow], values: Vector[ValueRow]) {

  private lazy val byId: Map[String, AtomRow] = atoms.map(a => a.atom_id -> a).toMap
  private lazy val outEdges: Map[String, Vector[AtomRow]] =
    atoms.filter(_.kind == Kind.Relation).groupBy(_.src_id.get)
  private lazy val inEdges: Map[String, Vector[AtomRow]] =
    atoms.filter(_.kind == Kind.Relation).groupBy(_.dst_id.get)

  def apply(id: String): AtomRow = byId(id)
  def get(id: String): Option[AtomRow] = byId.get(id)

  def all(et: String): Vector[AtomRow] =
    atoms.filter(a => a.kind == Kind.Entity && a.atype == et)

  def outs(id: String, rt: String): Vector[AtomRow] =
    outEdges.getOrElse(id, Vector.empty).filter(_.atype == rt)
      .flatMap(r => byId.get(r.dst_id.get))

  def ins(id: String, rt: String): Vector[AtomRow] =
    inEdges.getOrElse(id, Vector.empty).filter(_.atype == rt)
      .flatMap(r => byId.get(r.src_id.get))

  def outRels(id: String, rt: String): Vector[AtomRow] =
    outEdges.getOrElse(id, Vector.empty).filter(_.atype == rt)

  /** Latest value of the atom's rt field (the FlatGraph is a snapshot, so
    * "latest" = max tx_slice present in the collected values). */
  def field(id: String, rt: String): Option[ValueRow] = {
    val aeIds = outRels(id, rt).map(_.dst_id.get).toSet
    val vs = values.filter(v => aeIds.contains(v.ae_id))
    if (vs.isEmpty) None else Some(vs.maxBy(_.tx_slice))
  }

  def size: Int = atoms.size
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
    val atoms = g.atoms.filter(Graph.aliveAt(slice))
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
