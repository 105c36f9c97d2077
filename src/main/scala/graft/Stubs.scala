package graft

// Module stubs — filled in as SURVEY.md §7 build steps land.

object DedupQueries      { def queries: Seq[Q] = Seq() }
object TextQueries       { def queries: Seq[Q] = Seq() }
object MultimodalQueries { def queries: Seq[Q] = Seq() }
object StreamingQueries  { def queries: Seq[Q] = Seq() }
