package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Knn

/** Declared vector-search queries (SURVEY.md §2.2 V1–V4).
  *
  * The query vector is the embedding of `vec_id = 0` — collected once on
  * the driver (64 floats) and broadcast as a literal, the standard "small
  * query side" pattern that keeps the big collection scan shuffle-free.
  * Scores are rounded to 6 decimals before comparison/ordering: both
  * engines compute the same double-precision reductions, but may associate
  * the final divide/sqrt differently.
  */
object VectorQueries {

  /** Driver-side fetch of one query vector, widened exactly to double. */
  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String,
                       id: Long): Seq[Double] =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  private val oracleQ0 = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"

  /** V1 — cosine score of every vector vs the query (full scoring pass). */
  val vCosine = Q("v_cosine",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Knn.scoreAll(emb, "embedding", queryVec(s, dir, 0))
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    },
    Some(s"""
      SELECT vec_id,
             ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), $oracleQ0), 6) AS score
      FROM embeddings
    """))

  /** V2 — kNN top-10 by cosine. Plans to TakeOrderedAndProject (bounded
    * per-partition heap, no global sort). */
  val vKnn = Q("v_knn",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Knn.knn(emb, "embedding", queryVec(s, dir, 0), 10)
        .select("vec_id", "label", "score")
    },
    Some(s"""
      SELECT vec_id, label,
             ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), $oracleQ0), 6) AS score
      FROM embeddings
      ORDER BY score DESC, vec_id
      LIMIT 10
    """))

  def queries: Seq[Q] = Seq(vCosine, vKnn)
}
