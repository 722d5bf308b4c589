package graft.queries

/** Data-wrangling / LLM-pipeline operators (SURVEY.md §2.12 + north-star
  * superset: dedup, similarity search, text analysis). */
object Wrangling {
  val entries: Seq[QueryDef] = Seq()
}
