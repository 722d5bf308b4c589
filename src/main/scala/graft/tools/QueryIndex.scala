package graft.tools

import graft.queries.Registry

/** Generates QUERIES.md — the query inventory index (name, SURVEY §2 ops
  * demonstrated, verification mode) straight from the registry so it can't
  * drift. Run: sbt "runMain graft.tools.QueryIndex" */
object QueryIndex {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    sb.append("# QUERIES — generated inventory (sbt \"runMain graft.tools.QueryIndex\")\n\n")
    sb.append(s"${Registry.entries.size} queries; ")
    sb.append(s"${Registry.entries.count(_.oracle.isDefined)} with DuckDB oracles ")
    sb.append("(hash-compared by the driver at sf0.01), the rest rows-only ")
    sb.append("(hash-based ops verified against exact baselines in specs).\n\n")
    sb.append("| query | verification | SURVEY §2 operators demonstrated |\n")
    sb.append("|---|---|---|\n")
    Registry.entries.sortBy(_.name).foreach { q =>
      val mode = if (q.oracle.isDefined) "DuckDB oracle" else "rows-only + spec"
      sb.append(s"| `${q.name}` | $mode | ${q.ops.mkString(", ")} |\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("QUERIES.md"), sb.toString)
    println(s"wrote QUERIES.md (${Registry.entries.size} queries)")
  }
}
