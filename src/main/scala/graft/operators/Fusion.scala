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

  /** Late-interaction / MULTIVECTOR max-sim scoring (the public Qdrant
    * multivector comparator, the ColBERT scoring function): both sides
    * hold a LIST of sub-vectors and the score is
    * `Σ over query sub-vectors of max over doc sub-vectors of cosine`.
    * Here the collection's dense vector is reinterpreted as `dim/subDim`
    * stacked sub-vectors (the storage layout a multivector collection
    * uses — contiguous rows of one matrix).
    *
    * Everything is IN-ROW: query sub-vectors are literals, each pairwise
    * cosine is a fused expression over an array slice, each is
    * micro-int-floored BEFORE max/sum so the result is an exact long an
    * oracle reproduces. (q·d)/(dim/subDim)² cosines per row — constants —
    * no join, no shuffle; composes with any top-k tail. */
  def maxSim(vec: Column, query: Seq[Double], subDim: Int): Column = {
    require(query.length % subDim == 0,
      s"query dim ${query.length} not a multiple of subDim $subDim")
    val parts = query.length / subDim
    val docSubs = (0 until parts).map(j =>
      slice(vec.cast("array<double>"), j * subDim + 1, subDim))
    val qSubs = (0 until parts).map(i =>
      typedLit(query.slice(i * subDim, (i + 1) * subDim)))
    qSubs.map { qi =>
      greatest(docSubs.map(dj =>
        floor(graft.functions.VectorOps.cosine(dj, qi) * 1e6 + lit(0.5))
          .cast("long")): _*)
    }.reduce(_ + _)
  }

  /** PARTIAL-named-vector blend — Qdrant points may carry any SUBSET of
    * the collection's declared named vectors, and scoring a multi-vector
    * query must SKIP a missing side (contribute neither score nor
    * weight), not score it as zero: zeroing would rank a text-only point
    * below an identical text+image point on a text-dominant query even
    * when the image side matched poorly. `sides` = (per-side score,
    * integer weight); a NULL score drops the side's weight from the
    * denominator; all sides null → NULL (the point belongs to none of
    * the queried vector spaces — Qdrant would not return it at all).
    * Integer-exact renormalization: callers pass NON-NEGATIVE integer
    * scores (shift cosine micro-ints by +10^6) so
    * `Σ wᵢ·sᵢ DIV Σ wᵢ` is engine-independent (Spark DIV truncates,
    * DuckDB // floors — identical on non-negatives). */
  def blendPartial(sides: Seq[(Column, Long)]): Column = {
    val num = sides.map { case (sc, w) => coalesce(sc * lit(w), lit(0L)) }
      .reduce(_ + _)
    val den = sides
      .map { case (sc, w) => when(sc.isNotNull, lit(w)).otherwise(lit(0L)) }
      .reduce(_ + _)
    when(den > 0, call_function("div", num, den))
  }

  /** DBSF normalization of one bounded result list — half of Qdrant's
    * `fusion: dbsf` (distribution-based score fusion, the OTHER public
    * fusion method besides RRF): a list's scores map to [0,1] by the
    * list's own μ±3σ band, `(s − (μ−3σ)) / 6σ`. Exactness: inputs are
    * integer scores over a BOUNDED list (top-N retrieval side), so n,
    * Σs, Σs² are exact longs; the band expression is evaluated in the
    * n-scaled form `(n·s − Σs + 3·√(n·Σs² − (Σs)²)) / (6·√(…))` — one
    * correctly-rounded sqrt and one double division, identical IEEE in
    * any engine — then micro-floored. σ = 0 (all-equal list) pins to
    * 500000 (mid-band). The stats side is ONE row (data-independent
    * bound — broadcast is legal). */
  def dbsfNormalize(list: DataFrame, scoreCol: String,
                    outCol: String): DataFrame = {
    val s = col(scoreCol).cast("long")
    val stats = list.agg(count(lit(1)).as("__n"), sum(s).as("__s1"),
      sum(s * s).as("__s2"))
    val varN2 = col("__n") * col("__s2") - col("__s1") * col("__s1")
    val sd = sqrt(varN2.cast("double"))
    list.crossJoin(broadcast(stats))
      .withColumn(outCol,
        when(varN2 === 0, lit(500000L))
          .otherwise(floor(
            ((col("__n") * s - col("__s1")).cast("double") + lit(3.0) * sd)
              / (lit(6.0) * sd) * 1000000 + lit(0.5)).cast("long")))
      .drop("__n", "__s1", "__s2")
  }

  /** Distribution-based score fusion of two bounded scored lists
    * (doc_id, score_t) and (doc_id, score_v): each side normalizes by
    * its own μ±3σ ([[dbsfNormalize]]), a doc absent from a side
    * contributes 0 for that side (the rank-list-absence convention RRF
    * uses), fused = sum, top `topN`. Same bounded-join shape as
    * [[rrfFuse]] — both sides are ≤ top-N rows by construction. */
  def dbsfFuse(tList: DataFrame, vList: DataFrame,
               topN: Int = 10): DataFrame =
    dbsfNormalize(tList, "score_t", "nt_micro").select("doc_id", "nt_micro")
      .join(dbsfNormalize(vList, "score_v", "nv_micro")
        .select("doc_id", "nv_micro"), Seq("doc_id"), "full_outer")
      .withColumn("dbsf_micro",
        coalesce(col("nt_micro"), lit(0L)) +
          coalesce(col("nv_micro"), lit(0L)))
      .withColumn("nt_micro", coalesce(col("nt_micro"), lit(0L)))
      .withColumn("nv_micro", coalesce(col("nv_micro"), lit(0L)))
      .orderBy(desc("dbsf_micro"), col("doc_id"))
      .limit(topN)
      .select("doc_id", "nt_micro", "nv_micro", "dbsf_micro")

  /** BATCHED [[dbsfNormalize]]: the list carries a `query_id` column
    * (N per-query bounded score lists in one frame) and each query
    * normalizes by ITS OWN list's μ±3σ — the per-query (n, Σs, Σs²)
    * ride WHOLE-PARTITION window aggregates over query_id, so the
    * list's lineage executes ONCE (a stats-then-self-join would run
    * the upstream leg twice — the r18 1000× probe measured the
    * double execution directly; figures in SURVEY §8.13); the band
    * expression is the
    * single-query one verbatim on the same exact integers. Per query
    * the rows equal [[dbsfNormalize]] on that query's list
    * (spec-pinned via the fused key's per-query-equals-single
    * contract). */
  def dbsfNormalizeMulti(list: DataFrame, scoreCol: String,
                         outCol: String): DataFrame = {
    val w = Window.partitionBy("query_id")
    val s = col(scoreCol).cast("long")
    val withStats = list
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s1", sum(s).over(w))
      .withColumn("__s2", sum(s * s).over(w))
    val varN2 = col("__n") * col("__s2") - col("__s1") * col("__s1")
    val sd = sqrt(varN2.cast("double"))
    withStats
      .withColumn(outCol,
        when(varN2 === 0, lit(500000L))
          .otherwise(floor(
            ((col("__n") * s - col("__s1")).cast("double") + lit(3.0) * sd)
              / (lit(6.0) * sd) * 1000000 + lit(0.5)).cast("long")))
      .drop("__n", "__s1", "__s2")
  }

  /** BATCHED [[dbsfFuse]]: both sides carry `query_id`, each query's
    * sides normalize by their own bands ([[dbsfNormalizeMulti]]), fuse
    * is a full outer join on (query_id, doc_id) + a per-query bounded
    * top-`topN` window — the [[rrfFuseMulti]] shape with the DBSF
    * normalization. Per query the rows equal the single-query
    * [[dbsfFuse]] of that query's lists. */
  def dbsfFuseMulti(tList: DataFrame, vList: DataFrame,
                    topN: Int = 10): DataFrame =
    dbsfNormalizeMulti(tList, "score_t", "nt_micro")
      .select("query_id", "doc_id", "nt_micro")
      .join(dbsfNormalizeMulti(vList, "score_v", "nv_micro")
        .select("query_id", "doc_id", "nv_micro"),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("dbsf_micro",
        coalesce(col("nt_micro"), lit(0L)) +
          coalesce(col("nv_micro"), lit(0L)))
      .withColumn("nt_micro", coalesce(col("nt_micro"), lit(0L)))
      .withColumn("nv_micro", coalesce(col("nv_micro"), lit(0L)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("dbsf_micro"), col("doc_id"))))
      .filter(col("__rk") <= topN)
      .select("query_id", "doc_id", "nt_micro", "nv_micro", "dbsf_micro")
      .orderBy(col("query_id"), desc("dbsf_micro"), col("doc_id"))

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

  /** BATCHED [[rrfFuse]]: both sides carry a `query_id` column
    * (N per-query ranked lists in one frame) and fuse per query — a
    * full outer join on (query_id, doc_id) plus a per-query top-`topN`
    * window (each partition ≤ the two lists' lengths — bounded). Per
    * query the rows equal the single-query [[rrfFuse]] of that query's
    * lists (spec-pinned). */
  def rrfFuseMulti(tRanks: DataFrame, vRanks: DataFrame, rrfK: Int = 60,
                   topN: Int = 10): DataFrame =
    tRanks.join(vRanks, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_milli",
        coalesce(expr(s"1000000 DIV ($rrfK + r_t)"), lit(0)) +
        coalesce(expr(s"1000000 DIV ($rrfK + r_v)"), lit(0)))
      .withColumn("r_t", coalesce(col("r_t"), lit(0)))
      .withColumn("r_v", coalesce(col("r_v"), lit(0)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("rrf_milli"), col("doc_id"))))
      .filter(col("__rk") <= topN)
      .select("query_id", "doc_id", "r_t", "r_v", "rrf_milli")
      .orderBy(col("query_id"), desc("rrf_milli"), col("doc_id"))
}
