package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

/** kNN similarity search over an embedding column — the query surface the
  * reference delegates to Qdrant (cosine named-vector collections,
  * `bob_vector_db/qdrant_embedder.py:92-103`; SURVEY.md §2.2 V2/V3).
  *
  * Scale design: the query side is always the SMALL side — a literal vector
  * or a small query table — so every plan here is a broadcast (map-side)
  * scan over the big collection followed by a top-k reduction.
  * `orderBy(desc).limit(k)` planifies to `TakeOrderedAndProject`, which
  * keeps a k-sized heap per partition and merges heaps on the driver: no
  * full sort, no shuffle of the collection. Multi-query kNN broadcasts the
  * query table (never shuffles the 100 TB side) and reduces per query id
  * with a partial top-k (`Window` + AQE) — see [[knnMulti]].
  */
object Knn {

  /** Hard cap on PER-QUERY-EXPRESSION batch sizes (the CASE-chain / LUT /
    * disjunctive-predicate batched stage-1 sites: [[knnBatchDsl]],
    * QuantIndex.prefetchTopNMulti/hammingTopNMulti, IvfPqIndex.adcTopNMulti,
    * GraphAnn.beamSearchMultiIndexed, VectorRouter.queryPointsMulti).
    * Those plans grow one expression arm per query, so an oversized batch
    * silently builds a pathological Catalyst tree instead of a slow-but-
    * correct one — measured (sf0.01, local[8], r13 `Dev batchprobe`):
    * per-query cost IMPROVES monotonically through the cap (routed-quant
    * batched 0.25 → 0.016 s/q from batch 4 → 96, vs 0.20–0.33 s/q served
    * one at a time; knnBatchDsl 0.063 → 0.002 s/q through batch 512), and
    * the first hard failure is a Catalyst StackOverflowError at batch
    * 1024 (the depth-1024 Or-chain). 100 sits 10× under the measured
    * cliff, above every public `query_batch_points` shape, and EQUALS
    * the quant route's own driver-bounded candidate pin at default
    * params (GraphAnn.ProbeLimit / prefetch candidates = 10000/100), so
    * an in-bound batch never trips the pin either. Bigger workloads are
    * DATA, not expressions: use [[knnMulti]]/[[knnMultiAgg]]/
    * [[knnBatchFiltered]], whose query side is a broadcast frame with
    * no per-query arms. */
  val MaxBatchQueries = 100

  /** The loud batched-size precondition (the duplicate-id-rejection
    * pattern): reject past [[MaxBatchQueries]] instead of building a
    * plan that fails deep inside Catalyst — spec-gated. */
  private[graft] def requireBatch(n: Int, site: String): Unit =
    require(n <= MaxBatchQueries,
      s"$site: batch of $n queries exceeds MaxBatchQueries=" +
        s"$MaxBatchQueries (per-query expression arms grow the plan " +
        "linearly and Catalyst fails pathologically past ~1024 — " +
        "measured). Split the batch, or use the data-driven forms " +
        "(knnMulti/knnMultiAgg/knnBatchFiltered) whose query side is " +
        "a broadcast frame.")

  /** Score every row against one query vector; single-pass, no shuffle. */
  def scoreAll(coll: DataFrame, vecCol: String, query: Seq[Double],
               metric: (Column, Column) => Column = cosine): DataFrame = {
    val q = typedLit(query)
    coll.withColumn("score", metric(col(vecCol), q))
  }

  /** Top-k by cosine (or any metric) against one query vector; ties
    * break on `idCol` for determinism. `ascending=true` for distance
    * metrics (smaller is better). */
  def knn(coll: DataFrame, vecCol: String, query: Seq[Double], k: Int,
          metric: (Column, Column) => Column = cosine,
          idCol: String = "vec_id",
          ascending: Boolean = false): DataFrame =
    scoreAll(coll, vecCol, query, metric)
      .withColumn("score", round(col("score"), 6))
      .filter(col("score").isNotNull) // invalid vectors (dim mismatch) out
      .orderBy(if (ascending) asc("score") else desc("score"), col(idCol))
      .limit(k)

  /** Multi-query kNN: broadcast the (small) query set against the (huge)
    * collection, score each pair map-side, then keep top-k per query via a
    * window rank. The collection side is never shuffled — only the scored
    * pairs (|Q| rows per collection row pre-limit) move, and Spark's
    * WindowGroupLimit pushes the rank filter below the shuffle so each
    * partition emits at most k rows per query id. */
  def knnMulti(coll: DataFrame, queries: DataFrame, vecCol: String,
               qIdCol: String, qVecCol: String, k: Int,
               metric: (Column, Column) => Column = cosine,
               idCol: String = "vec_id"): DataFrame = {
    val pairs = coll.crossJoin(
        broadcast(queries.select(col(qIdCol).as("query_id"),
                                 col(qVecCol).as("__qv"))))
      .withColumn("score", round(metric(col(vecCol), col("__qv")), 6))
      // drop NULL scores (invalid vectors) BEFORE ranking so the window
      // and heap-aggregate forms stay row-identical (the heap skips nulls)
      .filter(col("score").isNotNull)
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), col(idCol))
    pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .drop("__qv")
  }

  /** Multi-query kNN via the bounded-heap aggregate
    * (graft.plans.TopKByScore) — hash-identical results to [[knnMulti]],
    * but the PARTIAL phase keeps a k-heap per query on the map side, so
    * only |partitions|·|queries|·k rows cross the shuffle instead of
    * every scored pair. The 100 TB form of the window-rank plan. */
  def knnMultiAgg(coll: DataFrame, queries: DataFrame, vecCol: String,
                  qIdCol: String, qVecCol: String, k: Int,
                  metric: (Column, Column) => Column = cosine,
                  idCol: String = "vec_id"): DataFrame =
    coll.crossJoin(
        broadcast(queries.select(col(qIdCol).as("query_id"),
                                 col(qVecCol).as("__qv"))))
      .withColumn("score", round(metric(col(vecCol), col("__qv")), 6))
      .filter(col("score").isNotNull)
      .groupBy("query_id")
      .agg(graft.plans.TopKByScore.topK(col("score"), col(idCol), k)
        .as("__topk"))
      .select(col("query_id"),
        posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col("query_id"),
        col("__e.id").as(idCol),
        col("__e.score").as("score"),
        (col("__pos") + 1).cast("int").as("rnk"))

  /** BATCH search with PER-QUERY filters (Qdrant `search_batch` /
    * `query_batch_points`: each request in the batch carries its own
    * filter) — the whole batch still costs ONE collection pass: the
    * per-query predicate is data (a filter value column on the query
    * side), so the broadcast join condition drops non-matching
    * (point, query) pairs map-side before any scoring, and the
    * bounded-heap aggregate keeps k per query across the shuffle.
    * `filterValCol` = the query's required value for `targetCol`
    * (NULL = that query is unfiltered — matches every point, the
    * no-filter request in the batch). */
  def knnBatchFiltered(coll: DataFrame, queries: DataFrame, vecCol: String,
                       qIdCol: String, qVecCol: String,
                       filterValCol: String, targetCol: String, k: Int,
                       idCol: String = "vec_id"): DataFrame =
    coll.join(
        broadcast(queries.select(col(qIdCol).as("query_id"),
          col(qVecCol).as("__qv"), col(filterValCol).as("__fv"))),
        col("__fv").isNull || col(targetCol) === col("__fv"))
      .withColumn("score",
        floor(cosine(col(vecCol), col("__qv")) * 1e6 + lit(0.5))
          .cast("double"))
      .filter(col("score").isNotNull)
      .groupBy("query_id")
      .agg(graft.plans.TopKByScore.topK(col("score"), col(idCol), k)
        .as("__topk"))
      .select(col("query_id"),
        posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col("query_id"),
        col("__e.id").as(idCol),
        col("__e.score").cast("long").as("score_micro"),
        (col("__pos") + 1).cast("int").as("rnk"))

  /** [[knnBatchFiltered]] generalized to ARBITRARY per-query predicates
    * (the full `query_batch_points` shape: each request carries its own
    * payload-filter DSL, not just a value equality). The per-query
    * predicate cannot ride as data, so it rides as a per-query arm of
    * one disjunctive CASE predicate over the broadcast (point, query)
    * pairs — still dropped map-side BEFORE any scoring, still ONE
    * collection pass, still |partitions|·N·k rows across the shuffle
    * (the null-is-false coercion matches the DSL translator's must_not
    * rule, so an unmatched-key predicate drops the pair rather than
    * NULL-poisoning the filter). `queries` = (id, vector, predicate).
    * The predicate CASE arms grow linearly with the batch (they are
    * per-query expressions, not data) — sized for the public API's
    * handful-per-batch shape, CHECKED against [[MaxBatchQueries]]. */
  def knnBatchDsl(coll: DataFrame,
                  queries: Seq[(Long, Seq[Double], Column)],
                  vecCol: String, k: Int,
                  idCol: String = "vec_id"): DataFrame = {
    require(queries.nonEmpty, "knnBatchDsl: empty query batch")
    requireBatch(queries.length, "knnBatchDsl")
    // duplicate ids would merge two requests into one garbage heap —
    // fail loudly, never silently corrupt
    require(queries.map(_._1).distinct.length == queries.length,
      "knnBatchDsl: duplicate query ids in the batch")
    val spark = coll.sparkSession
    import spark.implicits._
    val qdf = broadcast(
      queries.map { case (qid, qv, _) => (qid, qv) }
        .toDF("query_id", "__qv"))
    val pred = queries.map { case (qid, _, p) =>
      (col("query_id") === qid) && coalesce(p, lit(false))
    }.reduce(_ || _)
    coll.crossJoin(qdf)
      .filter(pred)
      .withColumn("score", cosine(col(vecCol), col("__qv")))
      .filter(col("score").isNotNull)
      .groupBy("query_id")
      .agg(graft.plans.TopKByScore.topK(col("score"),
        col(idCol).cast("long"), k).as("__tk"))
      .select(col("query_id"),
        posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e.id").as(idCol),
        floor(col("__e.score") * 1e6 + lit(0.5)).cast("long")
          .as("score_micro"))
  }
}
