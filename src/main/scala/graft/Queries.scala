package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables. Keeping both in one value prevents key/column
  * drift between `SparkEntry.queries` and `SparkEntry.oracleSql`. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {
  /** Central registry — every operator in SURVEY.md §2 that is implemented
    * registers exactly one Q here. */
  def all: Seq[Q] =
    Relational.queries ++
    VectorQueries.queries ++
    IngestQueries.queries ++
    EmbedQueries.queries ++
    DedupQueries.queries ++
    TextQueries.queries ++
    AnnQueries.queries ++
    GraphAnnQueries.queries ++
    MultimodalQueries.queries ++
    StreamingQueries.queries ++
    RecommendQueries.queries ++
    PqQueries.queries ++
    AutoQueries.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
