package graft

import org.apache.spark.sql.functions._
import graft.sources.VectorRouter

/** Declared queries for the index-aware VECTOR router
  * ([[graft.sources.VectorRouter]]) — the `query_points` surface where
  * the COLLECTION's declarations, not the caller, pick the serving
  * pipeline (the Qdrant server behavior the reference delegates to:
  * `bob_vector_db/qdrant_embedder.py` submits a vector and a limit, and
  * the server consults its own HNSW/quantization config). Every routed
  * key reuses its serving twin's oracle verbatim, projected to the
  * router's uniform `(vec_id, score_micro)` contract: routing is a plan
  * decision, never a semantic one.
  */
object AutoQueries {

  import VectorQueries.{oracleQ0, payloadIdxDir, quantIndexDir, queryVec}

  /** The declared-index list the auto queries search through: the
    * memoized quantized-codes sidecar (kind sniffed from its
    * `_quant_index.json`). */
  private def decls(s: org.apache.spark.sql.SparkSession,
                    dir: String): Seq[String] =
    Seq(quantIndexDir(s, dir))

  /** Routed search, no filter: the router sniffs the declared layout as
    * `quant` and serves the nested prefetch chain over the codes sidecar
    * — `v_prefetch_indexed`'s pipeline verbatim (BQ hamming top-100 →
    * stored-int8 top-30 → exact top-10), so `v_prefetch`'s oracle gates
    * it, projected to the router's output contract. */
  val vAutoSearch = Q("v_auto_search",
    (s, dir) =>
      VectorRouter.queryPoints(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", decls(s, dir), Nil, queryVec(s, dir, 0), 10),
    Some(s"""
      SELECT vec_id, score_micro
      FROM (${VectorQueries.vPrefetch.oracle.get}) t"""))

  /** The public Qdrant `search_params.exact = true` bypass: declarations
    * present but ignored — one scan, bounded heap, full-precision
    * ranking. */
  val vAutoExact = Q("v_auto_exact",
    (s, dir) =>
      VectorRouter.queryPoints(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", decls(s, dir), Nil, queryVec(s, dir, 0), 10,
        params = VectorRouter.Params(exact = true)),
    Some(s"""
      SELECT vec_id,
             CAST(floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                 $oracleQ0) * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM embeddings
      ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               $oracleQ0) DESC, vec_id
      LIMIT 10"""))

  /** Filtered routed search taking the SELECTIVE-FILTER plan (the Qdrant
    * query-planner cardinality decision): the payload hash index on
    * `label` estimates the filter's cardinality from its pruned read —
    * under the threshold at every gate SF — so the router serves exact
    * top-k over the payload-ROUTED filtered read instead of the vector
    * index. Oracle: brute-forced filter + exact ranking — the plan
    * choice must not change a row. (The over-threshold ANN branch is
    * recall-bounded candidate post-filtering — spec-gated in
    * OperatorSpec, not oracle-gated.) */
  val vAutoFiltered = Q("v_auto_filtered",
    (s, dir) =>
      VectorRouter.queryPoints(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", decls(s, dir),
        Seq("label" -> payloadIdxDir(s, dir)), queryVec(s, dir, 0), 10,
        dslJson = Some("""
          {"must": [{"key": "label", "match": {"value": 3}}]}""")),
    Some(s"""
      SELECT vec_id,
             CAST(floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                 $oracleQ0) * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM embeddings
      WHERE label = 3
      ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               $oracleQ0) DESC, vec_id
      LIMIT 10"""))

  /** [[vAutoFiltered]]'s OVER-THRESHOLD quant route, pinned
    * deterministically with the public planner knob (`scanThreshold = 0`
    * — the `v_auto_filtered_graph` discipline) and now EXACT (r16): the
    * filter's id population scopes the codes-sidecar bound, so θ and
    * the guaranteed superset live WITHIN the filtered rows and the
    * exact rescore of the candidates is row-identical to brute force —
    * the same oracle as `v_auto_filtered` gates BOTH cardinality plan
    * branches. This closes the r15 verdict's one collection-growth
    * dense path: the only full-vector bytes read are the candidates'. */
  val vAutoFilteredQuant = Q("v_auto_filtered_quant",
    (s, dir) =>
      VectorRouter.queryPoints(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", decls(s, dir),
        Seq("label" -> payloadIdxDir(s, dir)), queryVec(s, dir, 0), 10,
        dslJson = Some("""
          {"must": [{"key": "label", "match": {"value": 3}}]}"""),
        params = VectorRouter.Params(scanThreshold = 0)),
    vAutoFiltered.oracle)

  /** Routed search with a GRAPH declaration first: the router sniffs the
    * maintained adjacency layout (its persisted `_seeds/`) and serves
    * the fixed-round beam search — `ann_graph_search`'s pipeline
    * verbatim, so its oracle gates the routed rows. */
  val vAutoGraph = Q("v_auto_graph",
    (s, dir) =>
      VectorRouter.queryPoints(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding",
        GraphAnnQueries.graphIndexDir(s, dir) +: decls(s, dir), Nil,
        queryVec(s, dir, 0), 10),
    Some(s"""
      SELECT vec_id, score_micro
      FROM (${GraphAnnQueries.annGraphSearch.oracle.get}) t"""))

  /** One query's routed-quant serving chain as DuckDB CTEs (shared `d` /
    * `bits` packing CTEs): BQ hamming top-100 → candidate-local int8
    * de/re-quantize rescore top-30 → exact cosine top-10 — `v_prefetch`'s
    * oracle parameterized on the query id and projected to the router's
    * batched (query_id, vec_id, score_micro) contract. */
  private def prefetchBlock(qid: Long): String = s"""
      q_$qid AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id = $qid),
      qb_$qid AS (
        SELECT list_transform(range(2), w ->
                 CAST(list_sum(list_transform(range(32), j ->
                   CASE WHEN qv[w*32 + j + 1] > 0
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END))
                 AS BIGINT)) AS qw
        FROM q_$qid),
      s1_$qid AS (
        SELECT vec_id, v,
               CAST(bit_count(xor(words[1], qw[1]))
                    + bit_count(xor(words[2], qw[2])) AS BIGINT) AS hamming
        FROM bits, qb_$qid
        ORDER BY hamming ASC, vec_id LIMIT 100),
      r_$qid AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx
                 FROM s1_$qid),
      dq_$qid AS (
        SELECT vec_id, v,
               CASE WHEN mx = mn THEN list_transform(v, x -> mn)
                    ELSE list_transform(v, x ->
                      mn + CAST(CAST(floor((x - mn) / (mx - mn) * 255 + 0.5)
                        AS INT) AS DOUBLE) / 255 * (mx - mn))
               END AS vq
        FROM r_$qid),
      s2_$qid AS (
        SELECT vec_id, v,
               list_inner_product(vq, (SELECT qv FROM q_$qid))
               / (sqrt(list_inner_product(vq, vq))
                  * sqrt(list_inner_product((SELECT qv FROM q_$qid),
                                            (SELECT qv FROM q_$qid))))
                 AS score_q
        FROM dq_$qid
        ORDER BY score_q DESC, vec_id LIMIT 30),
      res_$qid AS (
        SELECT CAST($qid AS BIGINT) AS query_id, vec_id,
               CAST(floor(list_cosine_similarity(v, (SELECT qv FROM q_$qid))
                 * 1000000 + 0.5) AS BIGINT) AS score_micro
        FROM s2_$qid
        ORDER BY list_cosine_similarity(v, (SELECT qv FROM q_$qid)) DESC,
                 vec_id
        LIMIT 10)"""

  /** BATCHED routed search (`query_batch_points` through the declared
    * indexes): two queries, ONE route decision, one codes-table scan for
    * both stage-1 prefilters and one literal-id probe for both exact
    * stages ([[VectorRouter.queryPointsMulti]] — job budget independent
    * of the batch size, spec-gated in OperatorSpec). The oracle replays
    * BOTH nested-prefetch chains in one statement over shared packing
    * CTEs, each chain `v_prefetch`'s oracle verbatim — every query's
    * rows equal its single-query `v_auto_search` serving exactly. */
  val vAutoSearchMulti = Q("v_auto_search_multi",
    (s, dir) =>
      VectorRouter.queryPointsMulti(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", decls(s, dir),
        Seq(0L, 3L).map(i => i -> queryVec(s, dir, i)), 10),
    Some(s"""
      WITH d AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bits AS (
        SELECT vec_id, v,
               list_transform(range(2), w ->
                 CAST(list_sum(list_transform(range(32), j ->
                   CASE WHEN v[w*32 + j + 1] > 0
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END))
                 AS BIGINT)) AS words
        FROM d),
      ${prefetchBlock(0)},
      ${prefetchBlock(3)}
      SELECT * FROM res_0 UNION ALL SELECT * FROM res_3"""))

  /** BATCHED + FILTERED routed search (the shared-filter
    * `query_batch_points` shape): two queries under one selective
    * `label = 3` filter. The zero-job footer estimate decides the plan
    * ONCE — under the threshold at every gate SF — so the whole batch
    * is ONE exact pass over the payload-routed filtered read with
    * per-query map-side heaps ([[VectorRouter.exactTopKMulti]]). The
    * oracle replays both filtered exact chains; the over-threshold
    * batched candidate-post-filter branch is spec-gated in OperatorSpec
    * (recall-bounded, like the single-query branch). */
  val vAutoFilteredMulti = Q("v_auto_filtered_multi",
    (s, dir) =>
      VectorRouter.queryPointsMulti(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", decls(s, dir),
        Seq(0L, 3L).map(i => i -> queryVec(s, dir, i)), 10,
        dslJson = Some(
          """{"must": [{"key": "label", "match": {"value": 3}}]}"""),
        payloadIndexes = Seq("label" -> payloadIdxDir(s, dir))),
    Some(s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      r0 AS (
        SELECT CAST(0 AS BIGINT) AS query_id, vec_id,
               CAST(floor(list_cosine_similarity(v,
                 (SELECT v FROM e WHERE vec_id = 0)) * 1000000 + 0.5)
                 AS BIGINT) AS score_micro
        FROM e WHERE label = 3
        ORDER BY list_cosine_similarity(v,
          (SELECT v FROM e WHERE vec_id = 0)) DESC, vec_id
        LIMIT 10),
      r3 AS (
        SELECT CAST(3 AS BIGINT) AS query_id, vec_id,
               CAST(floor(list_cosine_similarity(v,
                 (SELECT v FROM e WHERE vec_id = 3)) * 1000000 + 0.5)
                 AS BIGINT) AS score_micro
        FROM e WHERE label = 3
        ORDER BY list_cosine_similarity(v,
          (SELECT v FROM e WHERE vec_id = 3)) DESC, vec_id
        LIMIT 10)
      SELECT * FROM r0 UNION ALL SELECT * FROM r3"""))

  /** The BATCHED over-threshold quant route (`scanThreshold = 0` on
    * [[vAutoFilteredMulti]]'s requests) — EXACT by the same r16 scoped
    * bound, batched: one shared scope population, both queries through
    * the two scoped codes-only scans
    * ([[graft.sources.QuantIndex.cosineCandidatesMulti]] with scope),
    * one union-pool exact rescore. The UNCHANGED `v_auto_filtered_multi`
    * oracle gates it — the batched filtered quant branch is no longer
    * spec-only. */
  val vAutoFilteredQuantMulti = Q("v_auto_filtered_quant_multi",
    (s, dir) =>
      VectorRouter.queryPointsMulti(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", decls(s, dir),
        Seq(0L, 3L).map(i => i -> queryVec(s, dir, i)), 10,
        dslJson = Some(
          """{"must": [{"key": "label", "match": {"value": 3}}]}"""),
        payloadIndexes = Seq("label" -> payloadIdxDir(s, dir)),
        params = VectorRouter.Params(scanThreshold = 0)),
    vAutoFilteredMulti.oracle)

  /** FILTERED GRAPH TRAVERSAL (r13 worklist #4 — the filtrable-HNSW
    * serving shape): a graph declaration + a `label = 3` filter forced
    * onto the over-threshold ANN branch (`scanThreshold = 0` — the
    * public planner knob; the estimate is positive at every SF, so the
    * branch choice is pinned deterministically). The beam ROUTES
    * unfiltered — identical frontier sequence to `ann_graph_search` —
    * while the answer is the top-k passing nodes of the WHOLE visited
    * pool, so the ~10%-selective filter fills k where post-filtering
    * the 10-node beam returns ~1 row (the under-return OperatorSpec
    * plants and proves). The oracle replays the union of the five
    * rounds' scored sets over the replayed graph, filtered and
    * re-ranked — an exact-hash gate over a filtered APPROXIMATE search,
    * the AnnQueries contract. */
  val vAutoFilteredGraph = Q("v_auto_filtered_graph",
    (s, dir) =>
      VectorRouter.queryPoints(s, Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding",
        Seq(GraphAnnQueries.graphIndexDir(s, dir)), Nil,
        queryVec(s, dir, 0), 10,
        dslJson = Some(
          """{"must": [{"key": "label", "match": {"value": 3}}]}"""),
        params = VectorRouter.Params(scanThreshold = 0)),
    Some(s"""
      WITH ${GraphAnnQueries.graphSql},
      ${GraphAnnQueries.seedSql},
      ${GraphAnnQueries.searchCtes("", 0L)}
      SELECT vec_id, sm AS score_micro FROM (
        SELECT s.vec_id, s.sm,
               ROW_NUMBER() OVER (ORDER BY s.sm DESC, s.vec_id) AS rk
        FROM (${(1 to GraphAnnQueries.SRounds)
          .map(r => s"SELECT vec_id, sm FROM sc$r")
          .mkString(" UNION ")}) s
        JOIN embeddings em ON em.vec_id = s.vec_id
        WHERE em.label = 3)
      WHERE rk <= 10 ORDER BY rk"""))

  /** ROUTED hybrid retrieval — the declare-once law applied to the
    * default retrieval recipe: each leg independently serves from the
    * first declared layout of its kind
    * ([[VectorRouter.lexDirOf]] → the exact-token postings text leg,
    * [[VectorRouter.quantDirOf]] → the exact-bound codes dense leg) and
    * independently falls back to its in-plan pipeline when nothing is
    * declared (PARTIAL routing composes — a collection may declare only
    * its text index). `exact = true` (the Qdrant `search_params.exact`
    * bypass) ignores every declaration. Both branches of each leg are
    * row-identical by construction (the indexed legs are EXACT — the
    * quantization-error bound and the exact-token postings, not staged
    * approximations), so routing is a plan decision, never a semantic
    * one: the UNCHANGED v_hybrid_rrf oracle gates every combination. */
  private[graft] def hybridRrfRouted(s: org.apache.spark.sql.SparkSession,
                                     dir: String, declared: Seq[String],
                                     exact: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val lexDir =
      if (exact) None else VectorRouter.lexDirOf(declared)
    val qDir =
      if (exact) None else VectorRouter.quantDirOf(declared)
    val tTop = lexDir match {
      case Some(ld) => VectorQueries.kwsTop100Indexed(s, dir, ld)
      case None => VectorQueries.kwsTop100(s, dir)
    }
    val vTop = qDir match {
      case Some(qd) => VectorQueries.vectorTop100Indexed(s, dir, qd)
        .select("doc_id", "r_v")
      case None => VectorQueries.vectorTop100(s, dir)
    }
    graft.operators.Fusion.rrfFuse(tTop, vTop)
  }

  val vAutoHybrid = Q("v_auto_hybrid",
    (s, dir) => hybridRrfRouted(s, dir,
      Seq(VectorQueries.lexIndexDir(s, dir), quantIndexDir(s, dir))),
    VectorQueries.vHybridRrf.oracle)

  /** BATCHED routed hybrid — the batching law's last family
    * (the Qdrant `query_batch_points` shape with prefetch + fusion):
    * N hybrid requests, each (query_id, dense vector, term set),
    * through ONE route decision and SHARED scans per leg —
    *
    *  - text legs: the union term set through one pruned postings scan
    *    ([[graft.sources.LexIndex.termCountScoresMulti]] — per-query
    *    Σtf fold via a broadcast membership frame), ranked with the
    *    batched zero-tail ([[graft.sources.LexIndex.rankedTopNMulti]]);
    *  - dense legs: all queries through the two shared codes-only
    *    candidate scans ([[VectorQueries.vectorTopNIndexedMulti]] over
    *    [[graft.sources.QuantIndex.cosineCandidatesMulti]]) and one
    *    union-pool exact rescore;
    *  - per-query RRF fuse ([[graft.operators.Fusion.rrfFuseMulti]]).
    *
    * Fallback when a leg has no declared layout: that leg runs its
    * in-plan pipeline once per request (nothing to share — the same
    * per-request scan the unindexed single-query path costs), so
    * partial routing composes exactly as [[hybridRrfRouted]]. Per query
    * the rows equal the single-query routed hybrid with that request's
    * vector and terms (spec-pinned); the batch's job budget over the
    * layouts is independent of N (spec via statusTracker). */
  private[graft] def hybridRrfRoutedMulti(
      s: org.apache.spark.sql.SparkSession, dir: String,
      declared: Seq[String],
      requests: Seq[(Long, Seq[Double], Seq[String])],
      exact: Boolean = false, legN: Int = 100)
      : org.apache.spark.sql.DataFrame = {
    graft.operators.Knn.requireBatch(requests.length,
      "hybridRrfRoutedMulti")
    require(requests.map(_._1).distinct.length == requests.length,
      "hybridRrfRoutedMulti: duplicate query ids in the batch")
    val lexDir = if (exact) None else VectorRouter.lexDirOf(declared)
    val qDir = if (exact) None else VectorRouter.quantDirOf(declared)
    val tTop = lexDir match {
      case Some(ld) =>
        graft.sources.LexIndex.rankedTopNMulti(s,
            graft.sources.LexIndex.termCountScoresMulti(s, ld,
              requests.map(r => r._1 -> r._3)),
            Tables.load(s, dir, "documents").select("doc_id"),
            "doc_id", "score_t", legN, "r_t", requests.map(_._1))
          .select("query_id", "doc_id", "r_t")
      case None =>
        requests.map { case (qid, _, terms) =>
          VectorQueries.kwsTopN(s, dir, terms, legN)
            .select(lit(qid).as("query_id"), col("doc_id"), col("r_t"))
        }.reduce(_ unionAll _)
    }
    val vTop = qDir match {
      case Some(qd) =>
        VectorQueries.vectorTopNIndexedMulti(s, dir, qd,
            requests.map(r => r._1 -> r._2), legN)
          .select("query_id", "doc_id", "r_v")
      case None =>
        requests.map { case (qid, qv, _) =>
          VectorQueries.vectorTopN(s, dir, qv, legN)
            .select(lit(qid).as("query_id"), col("doc_id"), col("r_v"))
        }.reduce(_ unionAll _)
    }
    graft.operators.Fusion.rrfFuseMulti(tTop, vTop)
  }

  /** The declared batch: three hybrid requests with distinct vectors
    * AND distinct term sets (the heterogeneous `query_batch_points`
    * shape). */
  private[graft] def hybridBatch(s: org.apache.spark.sql.SparkSession,
                                 dir: String)
      : Seq[(Long, Seq[Double], Seq[String])] = Seq(
    (0L, queryVec(s, dir, 0), Seq("data", "query", "table")),
    (1L, queryVec(s, dir, 3), Seq("scan", "index")),
    (2L, queryVec(s, dir, 7), Seq("the", "of", "data")))

  /** One DuckDB leg set for request `i`: the v_hybrid_rrf oracle chain
    * parameterized by vector id and term list, CTE names suffixed
    * (vector leg + fuse tail shared with the other batched hybrids —
    * [[VectorQueries.vectorTopSqlFor]] / [[VectorQueries.rrfFuseCteFor]]). */
  private def hybridLegSql(i: Int, vecId: Long,
                           terms: Seq[String]): String = {
    val lst = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""
      t$i AS (
        SELECT doc_id,
               len(list_filter(
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> ''),
                 x -> list_contains($lst, x))) AS score_t
        FROM documents),
      tr$i AS (
        SELECT doc_id, r_t FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score_t DESC, doc_id) AS r_t
          FROM t$i) WHERE r_t <= 100),
      ${VectorQueries.vectorTopSqlFor(i, vecId)},
      ${VectorQueries.rrfFuseCteFor(i)}"""
  }

  val vAutoHybridMulti = Q("v_auto_hybrid_multi",
    (s, dir) => hybridRrfRoutedMulti(s, dir,
      Seq(VectorQueries.lexIndexDir(s, dir), quantIndexDir(s, dir)),
      hybridBatch(s, dir)),
    Some {
      val legs = Seq((0, 0L, Seq("data", "query", "table")),
        (1, 3L, Seq("scan", "index")),
        (2, 7L, Seq("the", "of", "data")))
      s"""
      WITH ${legs.map { case (i, v, ts) => hybridLegSql(i, v, ts) }
          .mkString(",")}
      SELECT query_id, doc_id, r_t, r_v, rrf_milli FROM (
        ${legs.map { case (i, _, _) => s"SELECT * FROM f$i" }
          .mkString(" UNION ALL ")})
      ORDER BY query_id, rrf_milli DESC, doc_id"""
    })

  def queries: Seq[Q] =
    Seq(vAutoSearch, vAutoExact, vAutoFiltered, vAutoFilteredQuant,
      vAutoGraph, vAutoSearchMulti, vAutoFilteredMulti,
      vAutoFilteredQuantMulti, vAutoFilteredGraph,
      vAutoHybrid, vAutoHybridMulti)
}
