package graft.core

/** DOT-language export — the engine side of zef's `graphviz` op
  * (implementation_typing_functions.py:9238: `g | blueprint[True] |
  * graphviz`): produce Graphviz DOT text for a bounded subgraph or for the
  * type-level blueprint; rendering is any DOT tool's job. Driver-side by
  * nature (it's a diagnostic renderer, like the reference's notebook
  * binding) — the collect is explicitly bounded and fails loudly past the
  * bound instead of silently truncating.
  */
object Dot {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** DOT digraph of the atoms in `as`: non-relation atoms are nodes
    * (label: atype + id), relation atoms are edges (label: atype);
    * endpoints outside the set appear as bare nodes so edges never
    * dangle. Output is sorted — deterministic for tests and diffs. */
  def toDot(as: AtomSet, maxAtoms: Int = 500): String = {
    val rows = as.df
      .select("atom_id", "kind", "atype", "src_id", "dst_id")
      .limit(maxAtoms + 1).collect()
    require(rows.length <= maxAtoms,
      s"subgraph exceeds maxAtoms=$maxAtoms — narrow the set or raise the bound")
    val (rels, nodes) = rows.partition(_.getAs[String]("kind") == Kind.Relation)
    val declared = nodes.map { r =>
      val id = r.getAs[String]("atom_id")
      s"""  "${esc(id)}" [label="${esc(r.getAs[String]("atype"))}\\n${esc(id)}"];"""
    }
    val endpointIds = rels.flatMap(r => Seq(
      r.getAs[String]("src_id"), r.getAs[String]("dst_id"))).filter(_ != null)
    val bare = endpointIds.distinct
      .diff(nodes.map(_.getAs[String]("atom_id")))
      .map(id => s"""  "${esc(id)}";""")
    // a relation row with a null endpoint (foreign parquet, corruption —
    // the same rows the bare-node filter above tolerates) cannot be drawn
    // as an edge; skip it instead of NPEing the whole export
    val edges = rels
      .filter(r => r.getAs[String]("src_id") != null &&
        r.getAs[String]("dst_id") != null)
      .map { r =>
        s"""  "${esc(r.getAs[String]("src_id"))}" -> "${esc(r.getAs[String]("dst_id"))}" [label="${esc(r.getAs[String]("atype"))}"];"""
      }
    ((declared ++ bare).sorted ++ edges.sorted)
      .mkString("digraph g {\n", "\n", "\n}")
  }

  /** DOT digraph of the BLUEPRINT (type level): one node per non-relation
    * atom type with its instance count, one edge per (relation type,
    * src type, dst type) with its count — `g | blueprint | graphviz`.
    * The blueprint is schema-sized, so no bound is needed. */
  def blueprintDot(g: Graph): String = {
    val rows = g.blueprint.collect()
    // node rows have BOTH endpoint types null; a relation with ONE
    // unresolvable endpoint (blueprint's left joins keep them — the
    // dangling_src/dst corruption class) must still render as an edge,
    // with '?' for the missing side, not crash or masquerade as a node.
    // (A relation with BOTH endpoints dangling is indistinguishable from
    // a node row in this schema and renders as one — the diagnostic's
    // honest limit.)
    val (rels, nodes) = rows.partition(r =>
      r.getAs[String]("src_type") != null || r.getAs[String]("dst_type") != null)
    val nodeLines = nodes.map { r =>
      val t = r.getAs[String]("atype")
      s"""  "${esc(t)}" [label="${esc(t)} (${r.getAs[Long]("n")})"];"""
    }
    def ep(r: org.apache.spark.sql.Row, c: String): String =
      Option(r.getAs[String](c)).getOrElse("?")
    val edgeLines = rels.map { r =>
      s"""  "${esc(ep(r, "src_type"))}" -> "${esc(ep(r, "dst_type"))}" [label="${esc(r.getAs[String]("atype"))} (${r.getAs[Long]("n")})"];"""
    }
    (nodeLines.sorted ++ edgeLines.sorted)
      .mkString("digraph blueprint {\n", "\n", "\n}")
  }
}
