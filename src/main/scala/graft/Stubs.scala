package graft

// Module stubs — filled in as SURVEY.md §7 build steps land.
object EmbedQueries      { def queries: Seq[Q] = Seq() }
object DedupQueries      { def queries: Seq[Q] = Seq() }
object TextQueries       { def queries: Seq[Q] = Seq() }
object MultimodalQueries { def queries: Seq[Q] = Seq() }
object StreamingQueries  { def queries: Seq[Q] = Seq() }
