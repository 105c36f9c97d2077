package graft

/** Placeholders for suites not yet implemented — each is replaced by a
  * real file as its operators land (SURVEY.md §7 build order). */
object MultimodalQueries { def queries: Seq[Q] = Seq() }
object StreamingQueries  { def queries: Seq[Q] = Seq() }
