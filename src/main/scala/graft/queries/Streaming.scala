package graft.queries

/** Streaming/reactive operator queries (SURVEY.md §2.9) verified in batch
  * form (the batch plan equals the micro-batch plan for these ops). */
object Streaming {
  val entries: Seq[QueryDef] = Seq()
}
