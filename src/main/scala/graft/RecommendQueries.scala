package graft

import org.apache.spark.sql.functions._
import graft.operators.{PayloadFilter, Recommend}

/** Declared queries for the remaining public Qdrant query APIs over the
  * reference's collections (operators/Recommend.scala): recommend by
  * example points, grouped search, filtered count, ordered scroll. */
object RecommendQueries {

  /** Recommend API, `average_vector` strategy: positives {0, 1},
    * negative {2} — combined vector `avg(pos) + (avg(pos) − avg(neg))`,
    * examples excluded from results, top-10 cosine. The oracle rebuilds
    * the combined vector with the identical element-wise expression
    * (same IEEE op order), so scores match bit-for-bit. */
  val vRecommend = Q("v_recommend",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Recommend.recommend(emb, "embedding", "vec_id",
          positiveIds = Seq(0L, 1L), negativeIds = Seq(2L), k = 10)
        .select("vec_id", "label", "score_micro")
    },
    Some("""
      WITH p1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
      p2 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 1),
      n1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 2),
      q AS (SELECT list_transform(range(64), i ->
              (p1.v[i+1] + p2.v[i+1]) / 2
              + ((p1.v[i+1] + p2.v[i+1]) / 2 - n1.v[i+1])) AS qv
            FROM p1, p2, n1)
      SELECT e.vec_id, e.label,
             CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
               * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM embeddings e, q
      WHERE e.vec_id NOT IN (0, 1, 2)
      ORDER BY score_micro DESC, e.vec_id
      LIMIT 10"""))

  /** Recommend with `lookup_from`: examples come from a DIFFERENT
    * collection — here a derived catalog holding the REVERSED vectors
    * (a distinct basis, so the gate proves the query vector really came
    * from the lookup side), searched against the original embeddings.
    * No example exclusion (foreign id space — Qdrant's documented
    * lookup_from semantics). */
  val vRecommendLookup = Q("v_recommend_lookup",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val catalog = emb.select(col("vec_id"),
        reverse(col("embedding")).as("embedding"))
      Recommend.recommendLookupFrom(emb, "embedding", "vec_id",
          lookup = catalog, lookupIdCol = "vec_id",
          lookupVecCol = "embedding",
          positiveIds = Seq(3L, 5L), negativeIds = Seq(8L), k = 10)
        .select("vec_id", "label", "score_micro")
    },
    Some("""
      WITH p1 AS (SELECT list_reverse(CAST(embedding AS DOUBLE[])) AS v
                  FROM embeddings WHERE vec_id = 3),
      p2 AS (SELECT list_reverse(CAST(embedding AS DOUBLE[])) AS v
             FROM embeddings WHERE vec_id = 5),
      n1 AS (SELECT list_reverse(CAST(embedding AS DOUBLE[])) AS v
             FROM embeddings WHERE vec_id = 8),
      q AS (SELECT list_transform(range(64), i ->
              (p1.v[i+1] + p2.v[i+1]) / 2
              + ((p1.v[i+1] + p2.v[i+1]) / 2 - n1.v[i+1])) AS qv
            FROM p1, p2, n1)
      SELECT e.vec_id, e.label,
             CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
               * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM embeddings e, q
      ORDER BY score_micro DESC, e.vec_id
      LIMIT 10"""))

  /** Recommend API, `best_score` strategy (the other public strategy):
    * no combined vector — each point's score is its best positive
    * similarity when that beats its best negative similarity, else the
    * negated best negative. Every per-example cosine is an in-row
    * expression over broadcast literals; the oracle replays the same
    * greatest/CASE tree on identical doubles. */
  val vRecommendBest = Q("v_recommend_best",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Recommend.recommendBestScore(emb, "embedding", "vec_id",
        positiveIds = Seq(0L, 1L), negativeIds = Seq(2L), k = 10)
    },
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p1 AS (SELECT v FROM e WHERE vec_id = 0),
      p2 AS (SELECT v FROM e WHERE vec_id = 1),
      n1 AS (SELECT v FROM e WHERE vec_id = 2),
      scored AS (
        SELECT e.vec_id,
               greatest(list_cosine_similarity(e.v, p1.v),
                        list_cosine_similarity(e.v, p2.v)) AS maxpos,
               list_cosine_similarity(e.v, n1.v) AS maxneg
        FROM e, p1, p2, n1
        WHERE e.vec_id NOT IN (0, 1, 2))
      SELECT vec_id,
             CAST(floor((CASE WHEN maxpos > maxneg THEN maxpos
                              ELSE -maxneg END) * 1000000 + 0.5) AS BIGINT)
               AS score_micro
      FROM scored
      ORDER BY score_micro DESC, vec_id
      LIMIT 10"""))

  /** Recommend API, `sum_scores` strategy (the third public strategy —
    * ColBERT-style multi-positive queries): each point's score is the
    * SUM of its similarities to every positive minus the sum to every
    * negative — no combined vector, no max. The adds run in a fixed
    * left-to-right order (positives, then the negative subtraction), so
    * the oracle's parenthesized replay sees identical IEEE doubles. */
  val vRecommendSum = Q("v_recommend_sum",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Recommend.recommendSumScores(emb, "embedding", "vec_id",
        positiveIds = Seq(0L, 1L), negativeIds = Seq(2L), k = 10)
    },
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p1 AS (SELECT v FROM e WHERE vec_id = 0),
      p2 AS (SELECT v FROM e WHERE vec_id = 1),
      n1 AS (SELECT v FROM e WHERE vec_id = 2),
      scored AS (
        SELECT e.vec_id,
               ((list_cosine_similarity(e.v, p1.v)
                 + list_cosine_similarity(e.v, p2.v))
                - list_cosine_similarity(e.v, n1.v)) AS score
        FROM e, p1, p2, n1
        WHERE e.vec_id NOT IN (0, 1, 2))
      SELECT vec_id,
             CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM scored
      ORDER BY score_micro DESC, vec_id
      LIMIT 10"""))

  /** Distance-matrix API (`search_matrix_pairs`): each of the 20 sampled
    * points paired with its 3 nearest sampled neighbors. The sample is
    * the 20 lowest ids (pinned — the public API's random sampling is the
    * only divergence, documented on the operator); the collection is
    * never joined or shuffled, only the n-row sample self-joins under a
    * broadcast. */
  val vMatrix = Q("v_matrix",
    (s, dir) =>
      Recommend.searchMatrix(Tables.load(s, dir, "embeddings"),
          "embedding", "vec_id", n = 20, k = 3)
        .orderBy("id_a", "rnk"),
    Some("""
      WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings ORDER BY vec_id LIMIT 20),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5)
                 AS BIGINT) AS score_micro
        FROM s a JOIN s b ON a.vec_id <> b.vec_id),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a
                                         ORDER BY score_micro DESC, id_b) AS rnk
            FROM pairs)
      SELECT id_a, id_b, score_micro, CAST(rnk AS INT) AS rnk
      FROM r WHERE rnk <= 3
      ORDER BY id_a, rnk"""))

  /** Offsets form of the distance-matrix API (`search_matrix_offsets`):
    * the same matrix addressed by offsets into the ascending sampled-id
    * array (Qdrant's flat wire shape, one cell per row). Ascending ids ↔
    * ascending offsets, so the oracle's offset tie-break replays the
    * engine's id tie-break exactly. */
  val vMatrixOffsets = Q("v_matrix_offsets",
    (s, dir) =>
      Recommend.searchMatrixOffsets(Tables.load(s, dir, "embeddings"),
          "embedding", "vec_id", n = 20, k = 3)
        .orderBy("offset_row", "rnk"),
    Some("""
      WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                        CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                          AS BIGINT) AS off
                 FROM embeddings ORDER BY vec_id LIMIT 20),
      pairs AS (
        SELECT a.off AS offset_row, b.off AS offset_col,
               CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5)
                 AS BIGINT) AS score_micro
        FROM s a JOIN s b ON a.vec_id <> b.vec_id),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY offset_row
                                         ORDER BY score_micro DESC,
                                                  offset_col) AS rnk
            FROM pairs)
      SELECT offset_row, offset_col, score_micro, CAST(rnk AS INT) AS rnk
      FROM r WHERE rnk <= 3
      ORDER BY offset_row, rnk"""))

  /** The unrolled greedy-selection SQL for [[vMmr]]: step i picks the
    * argmax of `λ·rel − (1−λ)·max-sim-to-selected` among unselected pool
    * members — one CTE per step, exactly the loop the engine runs
    * (integer arithmetic, id tie-break), so the oracle replays the
    * SELECTION, not just the scores. */
  private def mmrSql(poolSize: Int, k: Int, lambdaMilli: Int): String = {
    val steps = (1 to k).map { i =>
      if (i == 1)
        s"""s1 AS (SELECT vec_id, rel, CAST($lambdaMilli * rel AS BIGINT) AS mmr
                   FROM pool ORDER BY mmr DESC, vec_id LIMIT 1)"""
      else {
        val sel = (1 until i).map(j => s"SELECT vec_id FROM s$j")
          .mkString(" UNION ALL ")
        s"""s$i AS (
          SELECT p.vec_id, p.rel,
                 CAST($lambdaMilli * p.rel - ${1000 - lambdaMilli} * (
                   SELECT MAX(s.s) FROM sim s
                   WHERE s.ia = p.vec_id AND s.ib IN ($sel)) AS BIGINT) AS mmr
          FROM pool p WHERE p.vec_id NOT IN ($sel)
          ORDER BY mmr DESC, p.vec_id LIMIT 1)"""
      }
    }.mkString(",\n")
    val out = (1 to k)
      .map(i => s"SELECT vec_id, rel, mmr, $i AS rnk FROM s$i")
      .mkString(" UNION ALL ")
    s"""
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      pool AS (
        SELECT vec_id,
               CAST(floor(list_cosine_similarity(v, q.qv) * 1000000 + 0.5)
                 AS BIGINT) AS rel, v
        FROM e, q ORDER BY rel DESC, vec_id LIMIT $poolSize),
      sim AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5)
                 AS BIGINT) AS s
        FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
      $steps"""
      .stripMargin + s"""
      SELECT vec_id, rel AS rel_micro, mmr AS mmr_score, CAST(rnk AS INT) AS rnk
      FROM ($out) ORDER BY rnk"""
  }

  /** MMR diversity search: top-20 relevance pool, greedy λ=0.7 selection
    * of 5 — the oracle unrolls the greedy loop CTE-per-step, so the gate
    * covers the SELECTION ORDER, not just scoring. */
  val vMmr = Q("v_mmr",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Recommend.mmr(emb, "embedding", "vec_id", qv,
        poolSize = 20, k = 5, lambdaMilli = 700)
    },
    Some(s"WITH ${mmrSql(20, 5, 700)}"))

  /** Grouped search (`search_groups`): top-2 hits per label for the 3
    * best labels (groups ranked by their best hit). The per-group top-k
    * runs on the bounded-heap aggregate — partial heaps map-side, never
    * a global window. */
  val vKnnGroups = Q("v_knn_groups",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Recommend.searchGroups(emb, "embedding", "vec_id", "label", qv,
          groups = 3, groupSize = 2)
        .orderBy("label", "rnk")
    },
    Some("""
      WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT vec_id, label,
               CAST(floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv)
                 * 1000000 + 0.5) AS BIGINT) AS score_micro
        FROM embeddings, q),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY score_micro DESC, vec_id) AS rnk
        FROM scored),
      hits AS (SELECT * FROM r WHERE rnk <= 2),
      g AS (SELECT label, MAX(score_micro) AS best FROM hits GROUP BY label
            ORDER BY best DESC, label LIMIT 3)
      SELECT h.label, h.vec_id, h.score_micro, CAST(h.rnk AS INT) AS rnk
      FROM hits h JOIN g ON g.label = h.label
      ORDER BY h.label, h.rnk"""))

  /** `recommend_groups` (the recommend-by-examples × grouped-results
    * composition of the public API): combined vector from positives
    * {0, 1} / negative {2}, examples excluded, top-2 hits per label for
    * the 3 best labels. The oracle is `v_recommend`'s combined-vector
    * CTE feeding `v_knn_groups`' group chain — exactly the composition
    * the engine runs. */
  val vRecommendGroups = Q("v_recommend_groups",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Recommend.recommendGroups(emb, "embedding", "vec_id", "label",
          positiveIds = Seq(0L, 1L), negativeIds = Seq(2L),
          groups = 3, groupSize = 2)
        .orderBy("label", "rnk")
    },
    Some("""
      WITH p1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
      p2 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 1),
      n1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 2),
      q AS (SELECT list_transform(range(64), i ->
              (p1.v[i+1] + p2.v[i+1]) / 2
              + ((p1.v[i+1] + p2.v[i+1]) / 2 - n1.v[i+1])) AS qv
            FROM p1, p2, n1),
      scored AS (
        SELECT vec_id, label,
               CAST(floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv)
                 * 1000000 + 0.5) AS BIGINT) AS score_micro
        FROM embeddings, q
        WHERE vec_id NOT IN (0, 1, 2)),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY score_micro DESC, vec_id) AS rnk
        FROM scored),
      hits AS (SELECT * FROM r WHERE rnk <= 2),
      g AS (SELECT label, MAX(score_micro) AS best FROM hits GROUP BY label
            ORDER BY best DESC, label LIMIT 3)
      SELECT h.label, h.vec_id, h.score_micro, CAST(h.rnk AS INT) AS rnk
      FROM hits h JOIN g ON g.label = h.label
      ORDER BY h.label, h.rnk"""))

  /** Grouped search with LOOKUP (`search_groups` + `with_lookup`): the
    * group key (label) resolves against a lookup collection — here the
    * nation table stands in as the lookup collection keyed by
    * n_nationkey — and the looked-up payload (n_name) rides on every
    * hit. The bounded group output broadcasts; nation streams one
    * narrow scan. */
  val vKnnGroupsLookup = Q("v_knn_groups_lookup",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Recommend.searchGroupsLookup(emb, "embedding", "vec_id", "label", qv,
          groups = 3, groupSize = 2,
          lookup = Tables.load(s, dir, "nation")
            .select(col("n_nationkey").cast("long").as("n_nationkey"),
              col("n_name").as("lookup_name")),
          lookupIdCol = "n_nationkey")
        .orderBy("label", "rnk")
    },
    Some("""
      WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT vec_id, label,
               CAST(floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv)
                 * 1000000 + 0.5) AS BIGINT) AS score_micro
        FROM embeddings, q),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY score_micro DESC, vec_id) AS rnk
        FROM scored),
      hits AS (SELECT * FROM r WHERE rnk <= 2),
      g AS (SELECT label, MAX(score_micro) AS best FROM hits GROUP BY label
            ORDER BY best DESC, label LIMIT 3)
      SELECT h.label, h.vec_id, h.score_micro, CAST(h.rnk AS INT) AS rnk,
             n.n_name AS lookup_name
      FROM hits h JOIN g ON g.label = h.label
      JOIN nation n ON n.n_nationkey = h.label
      ORDER BY h.label, h.rnk"""))

  /** Count API: a Qdrant filter-DSL predicate + COUNT — the DSL filter
    * pushes to the scan, the count partial-aggregates. */
  val collCount = Q("coll_count",
    (s, dir) => {
      val f = PayloadFilter.fromJson("""
        {"must": [
          {"key": "label", "match": {"any": [1, 4]}},
          {"key": "vec_id", "range": {"gte": 100}}
        ]}""")
      Recommend.countFiltered(Tables.load(s, dir, "embeddings"), f)
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt
      FROM embeddings
      WHERE label IN (1, 4) AND vec_id >= 100"""))

  /** Ordered scroll with a cursor: keyset pagination on (label, vec_id)
    * strictly after (3, 150) — the cursor predicate pushes down; no
    * OFFSET scan-and-discard. */
  val collScroll = Q("coll_scroll",
    (s, dir) =>
      Recommend.scrollOrdered(
          Tables.load(s, dir, "embeddings").select("vec_id", "label"),
          "label", "vec_id", lit(3), lit(150L), pageSize = 20)
        .select("vec_id", "label"),
    Some("""
      SELECT vec_id, label
      FROM embeddings
      WHERE label > 3 OR (label = 3 AND vec_id > 150)
      ORDER BY label, vec_id
      LIMIT 20"""))

  /** Ordered scroll WITH a DSL filter (Qdrant's `scroll` accepts
    * `filter` and `order_by` together): the payload-DSL predicate
    * composes with the keyset cursor on the SAME scan — both reach
    * `PushedFilters`, so a filtered scroll reads only what the
    * conjunction admits. The filter here keeps two of the ten labels
    * and the cursor sits inside the kept range, exercising the
    * cursor-vs-filter interaction (pages tile the FILTERED order). */
  val collScrollFiltered = Q("coll_scroll_filtered",
    (s, dir) =>
      Recommend.scrollOrdered(
          Tables.load(s, dir, "embeddings").select("vec_id", "label")
            .filter(PayloadFilter.fromJson(
              """{"must": [{"key": "label", "match": {"any": [2, 7]}}]}""")),
          "label", "vec_id", lit(2), lit(400L), pageSize = 20)
        .select("vec_id", "label"),
    Some("""
      SELECT vec_id, label
      FROM embeddings
      WHERE label IN (2, 7)
        AND (label > 2 OR (label = 2 AND vec_id > 400))
      ORDER BY label, vec_id
      LIMIT 20"""))

  /** Session-lifetime memo of the RANGE payload index over the
    * embeddings `label` column (width 1 — one directory per label
    * value), the declaration the ordered-scroll serving path reads. */
  private def labelRangeIdxDir(s: org.apache.spark.sql.SparkSession,
                               dir: String): String =
    Tables.memoTempDir("lblidx", dir) { target =>
      graft.sources.PayloadIndex.buildRange(
        Tables.load(s, dir, "embeddings").select("vec_id", "label"),
        "label", "vec_id", target, origin = 0L, width = 1L)
    }

  /** [[collScroll]] served from the declared range index
    * ([[graft.sources.PayloadIndex.scrollAfter]]): the monotone value
    * buckets bound the page globally, so the scan lists only the
    * leading directories past the cursor instead of feeding a top-K
    * heap from the whole collection. Same oracle — the index must not
    * change a row. */
  val collScrollIndexed = Q("coll_scroll_indexed",
    (s, dir) =>
      graft.sources.PayloadIndex.scrollAfter(s,
          labelRangeIdxDir(s, dir), "vec_id",
          afterOrder = 3L, afterId = 150L, pageSize = 20)
        .select("vec_id", "label"),
    collScroll.oracle)

  /** Ordered scroll DESCENDING (Qdrant `order_by.direction: desc`),
    * served from the same range index walking the bucket list
    * backwards — the cursor sits mid-bucket so the boundary residual
    * (`label < 6 OR (label = 6 AND vec_id < 950)`) is exercised at the
    * gate. */
  val collScrollDesc = Q("coll_scroll_desc",
    (s, dir) =>
      graft.sources.PayloadIndex.scrollAfter(s,
          labelRangeIdxDir(s, dir), "vec_id",
          afterOrder = 6L, afterId = 950L, pageSize = 20,
          ascending = false)
        .select("vec_id", "label"),
    Some("""
      SELECT vec_id, label
      FROM embeddings
      WHERE label < 6 OR (label = 6 AND vec_id < 950)
      ORDER BY label DESC, vec_id DESC
      LIMIT 20"""))

  /** Qdrant `count(exact=false)` analog: the approximate point count
    * under a DSL filter, via the KMV distinct-id sketch (ids are unique,
    * so distinct-count == count) — ≤64 longs shuffle instead of a full
    * count when the serving layer answers "roughly how many match".
    * The exact count is emitted beside it so the gate pins the sketch's
    * order statistics AND the estimate arithmetic under the filter. */
  val collCountApprox = Q("coll_count_approx",
    (s, dir) => {
      import graft.plans.KmvSketch
      val f = PayloadFilter.fromJson(
        """{"must": [{"key": "vec_id", "range": {"lt": 1000}}]}""")
      Tables.load(s, dir, "embeddings").filter(f)
        .select(conv(substring(md5(col("vec_id").cast("string")), 1, 15),
          16, 10).cast("long").as("h"))
        .agg(count(lit(1)).as("exact"),
          floor(KmvSketch.estimate(KmvSketch.kmv(col("h"), 64), 64) * 1000
            + lit(0.5)).cast("long").as("approx_milli"))
    },
    Some("""
      WITH f AS (
        SELECT ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS h
        FROM embeddings WHERE vec_id < 1000),
      d AS (SELECT DISTINCT h FROM f),
      rk AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM d),
      sk AS (SELECT COUNT(*) AS sz, MAX(CASE WHEN rn = 64 THEN h END) AS kth
             FROM rk WHERE rn <= 64)
      SELECT (SELECT COUNT(*) FROM f) AS exact,
             CAST(floor((CASE WHEN sz < 64 THEN CAST(sz AS DOUBLE)
               ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)
               END) * 1000 + 0.5) AS BIGINT) AS approx_milli
      FROM sk"""))

  /** Facet API: value counts of a payload field under a DSL filter —
    * top values by count. One pushed-down filter + one map-side-combined
    * hash agg + a bounded TakeOrderedAndProject. */
  val collFacet = Q("coll_facet",
    (s, dir) => {
      val f = PayloadFilter.fromJson(
        """{"must": [{"key": "vec_id", "range": {"lt": 1000}}]}""")
      Tables.load(s, dir, "embeddings").filter(f)
        .groupBy("label").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("label"))
        .limit(5)
    },
    Some("""
      SELECT label, COUNT(*) AS cnt
      FROM embeddings
      WHERE vec_id < 1000
      GROUP BY label
      ORDER BY cnt DESC, label
      LIMIT 5"""))

  /** Random-sampling query API (Qdrant `query: {"sample": "random"}`):
    * 10 points drawn uniformly via the seeded hash rank
    * (Recommend.sampleRandom — deterministic per seed, reshuffle-proof;
    * "random" means uniform over the collection, which a hash of the
    * unique id gives exactly). TakeOrderedAndProject over a narrow key
    * projection — bounded heap, no global sort. */
  val collSample = Q("coll_sample",
    (s, dir) =>
      Recommend.sampleRandom(
          Tables.load(s, dir, "embeddings").select("vec_id", "label"),
          "vec_id", seed = "draw42", n = 10)
        .orderBy("vec_id"),
    Some("""
      WITH s AS (
        SELECT vec_id, label
        FROM embeddings
        ORDER BY ('0x' || substr(md5('draw42|' || vec_id), 1, 15))::BIGINT,
                 vec_id
        LIMIT 10)
      SELECT vec_id, label FROM s ORDER BY vec_id"""))

  /** Discover API: rank by context fit first, target similarity second
    * (the public Qdrant discover semantics — each context pair
    * contributes `min(0, sim(v,pos) − sim(v,neg))`; a point loses rank
    * only where it sits on the wrong side of a pair). Scores quantized
    * to micro-ints BEFORE ordering so both engines break ties
    * identically. Example points excluded; single scoring pass +
    * TakeOrderedAndProject. */
  val vDiscover = Q("v_discover",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      // one driver-side lookup for all three example vectors
      val Seq(tgt, pos, neg) = Recommend
        .exampleVectors(emb, "vec_id", "embedding", Seq(0L, 1L, 2L))
        .map(typedLit(_))
      import graft.functions.VectorOps.cosine
      emb.filter(!col("vec_id").isin(0L, 1L, 2L))
        .withColumn("ctx_micro",
          floor(least(lit(0.0),
            cosine(col("embedding"), pos) -
              cosine(col("embedding"), neg)) * 1e6 + lit(0.5)).cast("long"))
        .withColumn("target_micro",
          floor(cosine(col("embedding"), tgt) * 1e6 + lit(0.5)).cast("long"))
        .orderBy(desc("ctx_micro"), desc("target_micro"), col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "ctx_micro", "target_micro")
    },
    Some("""
      WITH t AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
      p AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 1),
      n AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 2),
      scored AS (
        SELECT e.vec_id, e.label,
               CAST(floor(least(0.0,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.v)
                 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), n.v))
                 * 1000000 + 0.5) AS BIGINT) AS ctx_micro,
               CAST(floor(
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), t.v)
                 * 1000000 + 0.5) AS BIGINT) AS target_micro
        FROM embeddings e, t, p, n
        WHERE e.vec_id NOT IN (0, 1, 2))
      SELECT vec_id, label, ctx_micro, target_micro
      FROM scored
      ORDER BY ctx_micro DESC, target_micro DESC, vec_id
      LIMIT 10"""))

  /** Point retrieval by id (the Qdrant `retrieve` / points-get API —
    * `client.retrieve(ids=[...], with_payload=True)`): a literal id list
    * resolved against the collection. The IN-list pushes to the parquet
    * scan (PushedFilters + row-group stats pruning) — a point lookup
    * opens only the files whose id range can match, the serving-read
    * analog of Qdrant's id index. */
  val collGet = Q("coll_get",
    (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .filter(col("vec_id").isin(5L, 17L, 123L, 456L, 999999L))
        .select("vec_id", "label")
        .orderBy("vec_id"),
    Some("""
      SELECT vec_id, label
      FROM embeddings
      WHERE vec_id IN (5, 17, 123, 456, 999999)
      ORDER BY vec_id"""))

  /** Context-ONLY search (the public Qdrant `context` query mode — the
    * Discovery API without a target): each pair contributes
    * `min(0, sim(v,pos) − sim(v,neg))`, summed over pairs; a point scores
    * 0 iff it sits on the positive side of EVERY pair, and ties (Qdrant
    * leaves their order unspecified) are pinned by id so the gate is
    * deterministic. Two pairs here; the pair sum is ordered
    * (pair1 + pair2) so both engines run the identical IEEE adds before
    * the one micro-quantization. Same single-scan +
    * TakeOrderedAndProject shape as v_discover. */
  val vContext = Q("v_context",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val Seq(p1, n1, p2, n2) = Recommend
        .exampleVectors(emb, "vec_id", "embedding", Seq(1L, 2L, 3L, 4L))
        .map(typedLit(_))
      import graft.functions.VectorOps.cosine
      emb.filter(!col("vec_id").isin(1L, 2L, 3L, 4L))
        .withColumn("ctx_micro",
          floor((least(lit(0.0), cosine(col("embedding"), p1) -
              cosine(col("embedding"), n1)) +
            least(lit(0.0), cosine(col("embedding"), p2) -
              cosine(col("embedding"), n2))) * 1e6 + lit(0.5)).cast("long"))
        .orderBy(desc("ctx_micro"), col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "ctx_micro")
    },
    Some("""
      WITH p1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 1),
      n1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 2),
      p2 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 3),
      n2 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 4),
      scored AS (
        SELECT e.vec_id, e.label,
               CAST(floor((
                 least(0.0,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p1.v)
                   - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), n1.v))
                 + least(0.0,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p2.v)
                   - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), n2.v)))
                 * 1000000 + 0.5) AS BIGINT) AS ctx_micro
        FROM embeddings e, p1, n1, p2, n2
        WHERE e.vec_id NOT IN (1, 2, 3, 4))
      SELECT vec_id, label, ctx_micro
      FROM scored
      ORDER BY ctx_micro DESC, vec_id
      LIMIT 10"""))

  /** Chroma `where` + `where_document` query (the reference's other
    * backend, `chroma_embedder.py:28-36`): metadata operators compose
    * with a full-text contains over the document column; simple
    * comparisons push to the scan. */
  val chromaWhere = Q("chroma_where",
    (s, dir) => {
      val where = graft.operators.ChromaWhere.fromJson("""
        {"$and": [
          {"lang": {"$in": ["en", "fr"]}},
          {"n_chars": {"$gte": 200}}
        ]}""")
      val whereDoc = graft.operators.ChromaWhere.documentFilter(
        """{"$contains": "data"}""", col("text"))
      Tables.load(s, dir, "documents")
        .filter(where && whereDoc)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(50)
    },
    Some("""
      SELECT doc_id, lang, n_chars
      FROM documents
      WHERE lang IN ('en', 'fr') AND n_chars >= 200
        AND contains(text, 'data')
      ORDER BY doc_id
      LIMIT 50"""))

  /** SPARSE vector search (the public Qdrant sparse-vector capability):
    * documents carry an implicit sparse vector in hashed-bucket space —
    * dimension = md5(token) mod 4096, weight = occurrence count — and the
    * query is a tiny (bucket, weight) list. Score = sparse dot product.
    *
    * Scale shape: the INVERTED-INDEX form — tokens hash to buckets as a
    * narrow projection, a broadcast join against the query's few buckets
    * keeps only matching postings (the exploded volume that reaches the
    * shuffle is hits-only), one map-side-combined sum per doc, bounded
    * top-10. The document table is never shuffled; cost tracks posting
    * hits, not corpus size — the same shape as BM25, which is itself a
    * sparse dot product with a learned-ish weighting. */
  /** The query's fixed sparse vector: (md5-bucket, weight) with weights
    * summed on bucket collision — driver-side twin of the engine's
    * per-token bucket hash (Dedup.h32 % 4096), shared by both sparse
    * queries. */
  private val sparseTerms = Seq("data" -> 3L, "query" -> 2L, "table" -> 1L)
  private def sparseQueryBuckets: Seq[(Long, Long)] = sparseTerms
    .map { case (t, w) => (graft.operators.Dedup.h32(t) % 4096) -> w }
    .groupBy(_._1).map { case (b, ws) => b -> ws.map(_._2).sum }.toSeq

  val vSparseSearch = Q("v_sparse_search",
    (s, dir) => {
      val qw = broadcast(
        s.createDataFrame(sparseQueryBuckets).toDF("bucket", "w"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.tokens(col("text")))
            .as("tok"))
        .select(col("doc_id"),
          (graft.operators.Dedup.h32(col("tok")) % 4096).as("bucket"))
        .join(qw, "bucket")
        .groupBy("doc_id")
        .agg(sum("w").as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(10)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS tok
        FROM documents),
      b AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS bucket
        FROM tok),
      qw AS (
        SELECT ('0x' || substr(md5(t.term), 1, 8))::BIGINT % 4096 AS bucket,
               CAST(SUM(t.w) AS BIGINT) AS w
        FROM (VALUES ('data', 3), ('query', 2), ('table', 1)) t(term, w)
        GROUP BY 1)
      SELECT b.doc_id, CAST(SUM(qw.w) AS BIGINT) AS score
      FROM b JOIN qw ON qw.bucket = b.bucket
      GROUP BY b.doc_id
      ORDER BY score DESC, b.doc_id
      LIMIT 10"""))

  /** The MATERIALIZED sparse inverted index (sources/SparseIndex), built
    * once per fixture per JVM — the serving layout the in-query sparse
    * operators compute on the fly. */
  // shared with txt_phrase_indexed (TextQueries): one builder, one
  // memo key, one on-disk postings copy for both serving paths
  private[graft] def sparseIndexDir(s: org.apache.spark.sql.SparkSession,
                             dir: String): String =
    Tables.memoTempDir("sparseidx", dir) { target =>
      graft.sources.SparseIndex.buildFrom(
        Tables.load(s, dir, "documents"), "doc_id", "text", target)
    }

  /** Sparse search against the MATERIALIZED inverted index — the
    * ann_ivf_indexed discipline on the sparse surface: same oracle as
    * v_sparse_search (materialization must not change one row), but the
    * plan now prunes posting-group partitions at file listing
    * (PartitionFilters on sgrp — OperatorSpec asserts it) and pushes the
    * sbucket predicate into the scan, so a few-term query opens a few
    * 64ths of the index bytes at any corpus size. */
  val vSparseIndexed = Q("v_sparse_indexed",
    (s, dir) =>
      graft.sources.SparseIndex.search(s, sparseIndexDir(s, dir),
        "doc_id", sparseQueryBuckets, 10),
    vSparseSearch.oracle)

  /** Sparse search with the public Qdrant `modifier: idf` weighting:
    * every matched sparse dimension's contribution is scaled by its
    * inverse document frequency, so ubiquitous dimensions stop dominating
    * the dot product (Qdrant applies the BM25-style idf to the QUERY
    * values at search time; df is per sparse dimension = #points
    * containing it). The idf here is the repo's ln-free integer surrogate
    * `1e6·N DIV (df+1)` — same monotone-rank argument as
    * TextAnalysis.bm25 (an exact-hash oracle can't replay ln), and the
    * posting value is the dimension's tf in the doc. Scale shape: the
    * query's bucket set is a LITERAL isin filter applied before any
    * aggregation, so only hit tokens ever shuffle (BM25's hits-only
    * contract) — per-dimension df for the probed buckets and the posting
    * tf fold come from that same filtered pass (df of an unprobed bucket
    * is never needed); N is one count over the id column. The df
    * broadcast is bounded by |query| ≤ the pinned 4096-bucket space —
    * data-independent, unlike a distinct-token table. */
  val vSparseIdf = Q("v_sparse_idf",
    (s, dir) => {
      val qBuckets = sparseQueryBuckets
      val qw = broadcast(
        s.createDataFrame(qBuckets).toDF("bucket", "w"))
      val docs = Tables.load(s, dir, "documents")
      // literal probe-bucket filter BEFORE any shuffle: only hit tokens
      // leave the scan pass
      val post = docs
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.tokens(col("text")))
            .as("tok"))
        .select(col("doc_id"),
          (graft.operators.Dedup.h32(col("tok")) % 4096).as("bucket"))
        .filter(col("bucket").isin(qBuckets.map(_._1): _*))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
      val dfB = post.groupBy("bucket").agg(count(lit(1)).as("df"))
      val nRow = docs.agg(count(lit(1)).as("n"))
      post.join(qw, "bucket")
        .join(broadcast(dfB), "bucket")
        .crossJoin(broadcast(nRow))
        .withColumn("term_score",
          expr("w * tf * (1000000 * n DIV (df + 1))"))
        .groupBy("doc_id")
        .agg(sum("term_score").as("score_micro"))
        .orderBy(desc("score_micro"), col("doc_id"))
        .limit(10)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS tok
        FROM documents),
      b AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS bucket
        FROM tok),
      post AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM b GROUP BY 1, 2),
      dfb AS (SELECT bucket, COUNT(*) AS df FROM post GROUP BY 1),
      nn AS (SELECT COUNT(*) AS n FROM documents),
      qw AS (
        SELECT ('0x' || substr(md5(t.term), 1, 8))::BIGINT % 4096 AS bucket,
               CAST(SUM(t.w) AS BIGINT) AS w
        FROM (VALUES ('data', 3), ('query', 2), ('table', 1)) t(term, w)
        GROUP BY 1)
      SELECT p.doc_id,
             CAST(SUM(q.w * p.tf *
               (1000000 * (SELECT n FROM nn) // (d.df + 1))) AS BIGINT)
               AS score_micro
      FROM post p
      JOIN qw q USING (bucket)
      JOIN dfb d USING (bucket)
      GROUP BY p.doc_id
      ORDER BY score_micro DESC, p.doc_id
      LIMIT 10"""))

  def queries: Seq[Q] = Seq(vRecommend, vRecommendLookup, vRecommendBest,
    vRecommendSum, vRecommendGroups, vMatrix, vMatrixOffsets, vMmr,
    vKnnGroups, vKnnGroupsLookup, collCount, collCountApprox, collScroll,
    collScrollIndexed, collScrollDesc, collScrollFiltered,
    collFacet, collSample, collGet, vDiscover, vContext, chromaWhere,
    vSparseSearch,
    vSparseIndexed, vSparseIdf)
}
