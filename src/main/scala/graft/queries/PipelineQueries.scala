package graft.queries

/** LLM-training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal) exposed as driver-verifiable queries. */
object PipelineQueries {
  val specs: Seq[QuerySpec] = Seq.empty
}
