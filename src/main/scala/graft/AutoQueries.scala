package graft

import org.apache.spark.sql.functions._
import graft.sources.VectorRouter

/** Declared queries for the index-aware VECTOR router
  * ([[graft.sources.VectorRouter]]) — the `query_points` surface where
  * the COLLECTION's declarations, not the caller, pick the serving
  * pipeline (the Qdrant server behavior the reference delegates to:
  * `bob_vector_db` `qdrant_db.py` submits a vector and a limit, and the
  * server consults its own HNSW/quantization config). Every routed key
  * reuses its serving twin's oracle verbatim, projected to the router's
  * uniform `(vec_id, score_micro)` contract: routing is a plan decision,
  * never a semantic one.
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

  def queries: Seq[Q] =
    Seq(vAutoSearch, vAutoExact, vAutoFiltered, vAutoGraph)
}
