package graft.queries

/** Temporal property-graph operator queries (SURVEY.md §2.1, §2.2).
  * Populated in phase B of the build (graph core). */
object GraphQueries {
  val entries: Seq[QueryDef] = Seq()
}
