package graft.queries

/** Training-data pipeline operators (dedup / similarity / text / multimodal).
  * Filled in as each operator lands. */
object PipelineQueries {
  val defs: Seq[QueryDef] = Seq()
}
