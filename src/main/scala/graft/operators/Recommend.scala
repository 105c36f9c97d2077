package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The remaining public Qdrant query APIs served by the collections the
  * reference creates (`bob_vector_db/qdrant_embedder.py:92-103` pins the
  * cosine named-vector geometry; the query surface of those collections
  * is Qdrant's public API): recommendation by example points, grouped
  * search, and filtered count. Each is a thin composition of the engine's
  * scoring/top-k primitives — no new physical machinery.
  */
object Recommend {

  /** Qdrant's `average_vector` recommendation strategy: the combined
    * query vector is `avg(positives) + (avg(positives) − avg(negatives))`
    * — without negatives it degenerates to `avg(positives)`. Computed
    * element-wise with a FIXED operation order (left-to-right sum, then
    * one divide, then the shift) so an oracle replaying the same
    * expression gets bit-identical doubles. */
  def averageVector(positives: Seq[Seq[Double]],
                    negatives: Seq[Seq[Double]]): Seq[Double] = {
    require(positives.nonEmpty, "recommend needs >= 1 positive example")
    val dim = positives.head.length
    def avg(vs: Seq[Seq[Double]], i: Int): Double =
      vs.map(_(i)).reduceLeft(_ + _) / vs.length
    (0 until dim).map { i =>
      val ap = avg(positives, i)
      if (negatives.isEmpty) ap else ap + (ap - avg(negatives, i))
    }
  }

  /** Fetch example vectors by id (driver-side — the example set is tiny
    * by construction, this is the query side of the broadcast pattern). */
  def exampleVectors(coll: DataFrame, idCol: String, vecCol: String,
                     ids: Seq[Long]): Seq[Seq[Double]] = {
    val rows = coll.filter(col(idCol).isin(ids: _*))
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ids.map(id => rows.getOrElse(id,
      throw new IllegalArgumentException(s"example id $id not found")))
  }

  /** Recommend API: score the collection against the combined example
    * vector, EXCLUDING the example points themselves (Qdrant semantics),
    * top-k by cosine. Same plan shape as plain kNN — a broadcast literal
    * vector, a pushed-down id exclusion, TakeOrderedAndProject. */
  def recommend(coll: DataFrame, vecCol: String, idCol: String,
                positiveIds: Seq[Long], negativeIds: Seq[Long],
                k: Int): DataFrame = {
    val qv = averageVector(
      exampleVectors(coll, idCol, vecCol, positiveIds),
      if (negativeIds.isEmpty) Nil
      else exampleVectors(coll, idCol, vecCol, negativeIds))
    Knn.knn(coll.filter(!col(idCol).isin((positiveIds ++ negativeIds): _*)),
      vecCol, qv, k, idCol = idCol)
  }

  /** Grouped search (Qdrant `search_groups`): top `groupSize` hits per
    * group, for the `groups` best groups — groups ranked by their best
    * hit's score. Scale shape: per-group top-k via the bounded-heap
    * aggregate (partial heaps map-side — only |partitions|·|groups|·k
    * rows shuffle, never a global window), then the tiny per-group
    * summary is ranked with TakeOrderedAndProject. Output one row per
    * hit: (group, id, score, rnk). */
  def searchGroups(coll: DataFrame, vecCol: String, idCol: String,
                   groupCol: String, query: Seq[Double],
                   groups: Int, groupSize: Int): DataFrame = {
    val scored = Knn.scoreAll(coll, vecCol, query)
      .withColumn("score", round(col("score"), 6))
      .filter(col("score").isNotNull)
    val perGroup = scored.groupBy(groupCol)
      .agg(graft.plans.TopKByScore.topK(col("score"), col(idCol), groupSize)
        .as("__hits"))
    perGroup
      // group rank = its best hit (element 1 of the rank-ordered heap)
      .withColumn("__best", element_at(col("__hits"), 1).getField("score"))
      .orderBy(desc("__best"), col(groupCol))
      .limit(groups)
      .select(col(groupCol), posexplode(col("__hits")).as(Seq("__pos", "__e")))
      .select(col(groupCol),
        col("__e.id").as(idCol),
        col("__e.score").as("score"),
        (col("__pos") + 1).cast("int").as("rnk"))
  }

  /** Count API (`count` with a filter): the filter is a Qdrant filter-DSL
    * predicate (PayloadFilter) — it pushes to the scan, and the count is
    * a partial-aggregated scalar: the cheapest possible distributed plan. */
  def countFiltered(coll: DataFrame, dslFilter: Column): DataFrame =
    coll.filter(dslFilter).agg(count(lit(1)).as("cnt"))

  /** Ordered scroll (`scroll` with `order_by` + cursor): keyset
    * pagination on (orderCol, idCol) — the cursor predicate pushes to the
    * parquet scan (no OFFSET, which would read and discard at scale).
    * Returns the next `pageSize` rows strictly after the cursor. */
  def scrollOrdered(coll: DataFrame, orderCol: String, idCol: String,
                    afterOrder: Column, afterId: Column,
                    pageSize: Int): DataFrame =
    coll.filter(col(orderCol) > afterOrder ||
        (col(orderCol) === afterOrder && col(idCol) > afterId))
      .orderBy(col(orderCol), col(idCol))
      .limit(pageSize)
}
