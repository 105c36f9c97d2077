package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion (SURVEY.md §2.2 V8): shared by the
  * keyword-count and BM25 hybrid queries so the fusion semantics cannot
  * drift between them. */
object Fusion {

  /** Bounded top-N retrieval list: `orderBy(...).limit(n)` (plans to
    * TakeOrderedAndProject — a per-partition heap, no global sort) and a
    * rank over the N survivors only (a window over ≤ n rows; identical to
    * the global rank for every surviving row). */
  def topNRanked(df: DataFrame, n: Int, rankCol: String,
                 order: Column*): DataFrame =
    df.orderBy(order: _*).limit(n)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*)))

  /** Reciprocal-rank fusion of two ranked lists (doc_id, r_t) and
    * (doc_id, r_v): full outer join — a doc contributes 1/(rrfK + r) per
    * list it appears in, rank 0 marks absence — top `topN` by fused
    * score. Integer milli units so engines agree exactly. */
  def rrfFuse(tRanks: DataFrame, vRanks: DataFrame, rrfK: Int = 60,
              topN: Int = 10): DataFrame =
    tRanks.join(vRanks, Seq("doc_id"), "full_outer")
      .withColumn("rrf_milli",
        coalesce(expr(s"1000000 DIV ($rrfK + r_t)"), lit(0)) +
        coalesce(expr(s"1000000 DIV ($rrfK + r_v)"), lit(0)))
      .withColumn("r_t", coalesce(col("r_t"), lit(0)))
      .withColumn("r_v", coalesce(col("r_v"), lit(0)))
      .orderBy(desc("rrf_milli"), col("doc_id"))
      .limit(topN)
      .select("doc_id", "r_t", "r_v", "rrf_milli")
}
