package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.functions.VectorOps

/** Declared approximate-nearest-neighbor queries (the 100 TB similarity-
  * search path; brute-force exact kNN is `v_knn`). Both the IVF and LSH
  * pipelines are fully deterministic, so the DuckDB oracle replays the
  * identical algorithm — these are exact-match checks of an approximate
  * ALGORITHM, not recall checks. */
object AnnQueries {

  private val cosineSqlAB =
    """list_inner_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))
       / (sqrt(list_inner_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[])))
          * sqrt(list_inner_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))))"""

  private def cosSql(a: String, b: String) =
    cosineSqlAB.format(a, b, a, a, b, b)

  /** DuckDB replay of Ann.kmeansFit(k, iters) over `embeddings`: a CTE
    * chain ending in `c<iters>` (cid BIGINT, cv DOUBLE[]). Mirrors every
    * determinism pin of the Scala side — lowest-id seeding, argmin with
    * (distance, cid) tie-break, DECIMAL(25,12) sums, micro-quantized
    * means, empty-cluster carry-over. */
  private[graft] def kmeansSql(k: Int, iters: Int): String = {
    val init = s"""
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
        FROM (SELECT * FROM e ORDER BY vec_id LIMIT $k))"""
    val steps = (0 until iters).map { n =>
      s""",
      a${n + 1} AS (
        SELECT vec_id, cid FROM (
          SELECT e.vec_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
          FROM e CROSS JOIN c$n c) WHERE rn = 1),
      m${n + 1} AS (
        SELECT a.cid, ii.i,
               floor((CAST(SUM(CAST(e.v[ii.i + 1] AS DECIMAL(25,12)))
                             AS DOUBLE) / COUNT(*)) * 1000000 + 0.5)
                 / 1000000 AS c
        FROM a${n + 1} a JOIN e ON e.vec_id = a.vec_id
        CROSS JOIN (SELECT unnest(range(64)) AS i) ii
        GROUP BY a.cid, ii.i),
      c${n + 1} AS (
        SELECT c.cid, COALESCE(m.cv, c.cv) AS cv
        FROM c$n c LEFT JOIN (
          SELECT cid, array_agg(c ORDER BY i) AS cv
          FROM m${n + 1} GROUP BY cid) m ON m.cid = c.cid)"""
    }.mkString
    init + steps
  }

  /** Trained-centroid memo keyed by (sfDir, k, iters): ann_kmeans and
    * ann_ivf share one training run per fixture instead of each
    * re-training. Values are plain driver-side arrays (session-safe; a
    * DataFrame is rebuilt per call) and deterministic by construction
    * (kmeansFit's determinism is spec-asserted), so memoization cannot
    * change any result. */
  private val kmCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Int, Int), Array[(Long, Seq[Double])]]

  private[graft] def trainedCentroids(s: org.apache.spark.sql.SparkSession,
                               dir: String, k: Int, iters: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    kmCache.getOrElseUpdate((dir, k, iters),
      Ann.kmeansFit(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k, iters)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))))
      .toSeq.toDF("cid", "cv")
  }

  /** Deterministic k-means centroid table (k=8, 2 Lloyd rounds) as a
    * declared query — the oracle replays TRAINING itself, so the gate
    * covers the index build, not just the search. Long format (cid, dim,
    * micro) because the driver compare cannot hash array columns. */
  val annKmeans = Q("ann_kmeans",
    (s, dir) => {
      trainedCentroids(s, dir, k = 8, iters = 2)
        .select(col("cid"), posexplode(col("cv")).as(Seq("i", "c")))
        .select(col("cid"), col("i"),
          floor(col("c") * 1e6 + lit(0.5)).cast("long").as("c_micro"))
        .orderBy("cid", "i")
    },
    Some(s"""
      WITH ${kmeansSql(8, 2)}
      SELECT cid, ii.i AS i,
             CAST(floor(cv[ii.i + 1] * 1000000 + 0.5) AS BIGINT) AS c_micro
      FROM c2 CROSS JOIN (SELECT unnest(range(64)) AS i) ii
      ORDER BY cid, i"""))

  /** IVF with TRAINED centroids (kmeansFit k=8 × 2 rounds), nprobe=2,
    * top-10 cosine within probed cells. */
  val annIvf = Q("ann_ivf",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = trainedCentroids(s, dir, k = 8, iters = 2)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.ivfSearch(emb, "vec_id", "embedding", centroids, "cid", "cv",
          q, nprobe = 2, k = 10)
        .select(col("vec_id"), col("cluster"),
          floor(col("score") * 1e6 + lit(0.5)).cast("long").as("score_micro"))
    },
    Some(s"""
      WITH ${kmeansSql(8, 2)},
      q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id = 0),
      assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
        FROM e CROSS JOIN c2 c),
      amin AS (SELECT vec_id, cid AS cluster FROM assign WHERE rn = 1),
      probes AS (
        SELECT cid FROM c2 CROSS JOIN q
        ORDER BY list_distance(cv, qv), cid LIMIT 2),
      cand AS (
        SELECT e.vec_id, a.cluster,
               ${cosSql("e.v", "(SELECT qv FROM q)")} AS score
        FROM e
        JOIN amin a ON a.vec_id = e.vec_id
        WHERE a.cluster IN (SELECT cid FROM probes))
      SELECT vec_id, cluster,
             CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM cand ORDER BY score DESC, vec_id LIMIT 10"""))

  /** Session-lifetime materialized-index memo: the IVF index (collection
    * parquet PARTITIONED BY cluster) is built once per JVM per fixture,
    * under java.io.tmpdir. Rebuilt on every fresh JVM (overwrite), so no
    * cross-run staleness; contents are deterministic (trained centroids +
    * deterministic assignment). */
  private def ivfIndexDir(s: org.apache.spark.sql.SparkSession,
                          dir: String): String =
    Tables.memoTempDir("ivf", dir) { target =>
      Ann.buildIvfIndex(Tables.load(s, dir, "embeddings"), "vec_id",
        "embedding", trainedCentroids(s, dir, 8, 2), "cid", "cv", target)
    }

  /** The materialized-index form of ann_ivf: probes are PARTITION PRUNING
    * on the cluster-partitioned parquet (PartitionFilters — the scan
    * touches ~nprobe/k of the bytes; OperatorSpec asserts the plan).
    * Same oracle as ann_ivf: materialization must not change one row. */
  val annIvfIndexed = Q("ann_ivf_indexed",
    (s, dir) => {
      val idx = ivfIndexDir(s, dir)
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.ivfSearchIndexed(s, idx, "vec_id", "embedding",
          trainedCentroids(s, dir, 8, 2), "cid", "cv", q,
          nprobe = 2, k = 10)
        // partition-column discovery narrows cluster to INT; restore the
        // centroid id's BIGINT so the schema matches the oracle
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          floor(col("score") * 1e6 + lit(0.5)).cast("long").as("score_micro"))
    },
    annIvf.oracle) // identical oracle: materialization changes no row

  /** FILTERED search through the materialized ANN index — Qdrant's core
    * serving path is filter+ANN *combined* (collections are queried with
    * a vector AND a payload predicate, `qdrant_embedder.py:98-103`): a
    * payload-DSL predicate (`label` match.any) rides the probe-pruned
    * IVF scan, so the plan carries BOTH PartitionFilters (the probes) and
    * PushedFilters (the payload predicate) on one scan — OperatorSpec
    * asserts it. Top-k is taken over the filtered candidates (post-filter
    * semantics: probes are chosen by the query vector alone; the filter
    * never widens the probe set). Oracle: the ann_ivf CTE chain + the
    * same predicate on the candidate set. */
  val annIvfFiltered = Q("ann_ivf_filtered",
    (s, dir) => {
      val idx = ivfIndexDir(s, dir)
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val dsl = graft.operators.PayloadFilter.fromJson(
        """{"must": [{"key": "label", "match": {"any": [2, 3, 5]}}]}""")
      Ann.ivfSearchIndexed(s, idx, "vec_id", "embedding",
          trainedCentroids(s, dir, 8, 2), "cid", "cv", q,
          nprobe = 2, k = 10, filter = dsl)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("label").cast("long").as("label"),
          floor(col("score") * 1e6 + lit(0.5)).cast("long").as("score_micro"))
    },
    Some(s"""
      WITH ${kmeansSql(8, 2)},
      q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id = 0),
      assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
        FROM e CROSS JOIN c2 c),
      amin AS (SELECT vec_id, cid AS cluster FROM assign WHERE rn = 1),
      probes AS (
        SELECT cid FROM c2 CROSS JOIN q
        ORDER BY list_distance(cv, qv), cid LIMIT 2),
      cand AS (
        SELECT e.vec_id, a.cluster, CAST(emb.label AS BIGINT) AS label,
               ${cosSql("e.v", "(SELECT qv FROM q)")} AS score
        FROM e
        JOIN amin a ON a.vec_id = e.vec_id
        JOIN embeddings emb ON emb.vec_id = e.vec_id
        WHERE a.cluster IN (SELECT cid FROM probes)
          AND emb.label IN (2, 3, 5))
      SELECT vec_id, cluster, label,
             CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM cand ORDER BY score DESC, vec_id LIMIT 10"""))

  private val NumPlanes = 8
  private lazy val planes = Ann.hyperplanes(NumPlanes, 64)

  private[graft] def planeSqlLit(p: Seq[Double]): String =
    p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** LSH bucket id SQL expression for a column named `c` over `pls` —
    * DuckDB replay of Ann.lshBucket(c, pls). */
  private[graft] def bucketSqlFor(c: String, pls: Seq[Seq[Double]]): String =
    pls.zipWithIndex.map { case (pl, p) =>
      s"(CASE WHEN list_inner_product(CAST($c AS DOUBLE[]), ${planeSqlLit(pl)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def bucketSql(c: String): String = bucketSqlFor(c, planes)

  /** LSH probe: top-10 cosine within the query vector's 8-bit bucket. */
  val annLsh = Q("ann_lsh",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .withColumn("bucket", Ann.lshBucket(col("embedding"), planes))
      val qRow = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"), col("bucket"))
        .head()
      val (qv, qb) = (qRow.getSeq[Double](0), qRow.getLong(1))
      emb.filter(col("bucket") === qb)
        .withColumn("score", VectorOps.cosine(col("embedding"), typedLit(qv)))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("bucket"),
          floor(col("score") * 1e6 + lit(0.5)).cast("long").as("score_micro"))
    },
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
        FROM embeddings),
      q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, bucket AS qb
            FROM b WHERE vec_id = 0)
      SELECT vec_id, bucket,
             CAST(floor(${cosSql("embedding", "(SELECT qv FROM q)")}
               * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM b WHERE bucket = (SELECT qb FROM q)
      ORDER BY ${cosSql("embedding", "(SELECT qv FROM q)")} DESC, vec_id
      LIMIT 10"""))

  /** LSH bucket histogram — the data-distribution sanity check an LSH
    * index build needs (skewed buckets → more planes). */
  val annLshStats = Q("ann_lsh_stats",
    (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .withColumn("bucket", Ann.lshBucket(col("embedding"), planes))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
    Some(s"""
      SELECT ${bucketSql("embedding")} AS bucket, COUNT(*) AS n
      FROM embeddings GROUP BY 1 ORDER BY bucket"""))

  /** HARD-NEGATIVE MINING — the contrastive-training data op (pick, per
    * anchor, the most-similar examples that are NOT semantically the
    * anchor's neighborhood): anchors = every 100th vector; negatives
    * ranked by exact cosine but restricted to vectors assigned to a
    * DIFFERENT trained-k-means cluster (the cluster gate is what makes
    * them semi-hard — similar, yet provably outside the anchor's cell).
    * Composition gate: training → assignment → cross-cluster scoring →
    * per-anchor top-5, all in one oracle chain. Scale: anchors broadcast
    * (the knnMulti shape), scoring is one narrow pass, and the per-anchor
    * top-5 uses the bounded-heap aggregate — |partitions|·|anchors|·5
    * rows cross the shuffle, never the scored pairs. */
  val pipeHardNegatives = Q("pipe_hard_negatives",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val assigned = emb.join(
        Ann.argminAssign(emb, "vec_id", "embedding",
          trainedCentroids(s, dir, 8, 2), "cid", "cv"), "vec_id")
      val anchors = assigned.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("anchor"), col("embedding").as("__av"),
          col("cluster").as("__acl"))
      assigned.crossJoin(broadcast(anchors))
        .filter(col("cluster") =!= col("__acl"))
        .withColumn("__sm",
          floor(VectorOps.cosine(col("embedding"), col("__av")) * 1e6
            + lit(0.5)).cast("double"))
        .groupBy("anchor")
        .agg(graft.plans.TopKByScore.topK(col("__sm"), col("vec_id"), 5)
          .as("__tk"))
        .select(col("anchor"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("anchor"), col("__e.id").as("vec_id"),
          col("__e.score").cast("long").as("score_micro"),
          (col("__pos") + 1).cast("long").as("rnk"))
        .orderBy("anchor", "rnk")
    },
    Some(s"""
      WITH ${kmeansSql(8, 2)},
      assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
        FROM e CROSS JOIN c2 c),
      amin AS (SELECT vec_id, cid AS cluster FROM assign WHERE rn = 1),
      d AS (SELECT e.vec_id, e.v, a.cluster
            FROM e JOIN amin a ON a.vec_id = e.vec_id),
      anch AS (SELECT vec_id AS anchor, v AS av, cluster AS acl
               FROM d WHERE vec_id % 100 = 0),
      scored AS (
        SELECT an.anchor, d.vec_id,
               CAST(floor(list_cosine_similarity(d.v, an.av) * 1000000 + 0.5)
                 AS BIGINT) AS score_micro
        FROM d CROSS JOIN anch an
        WHERE d.cluster <> an.acl),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor
                    ORDER BY score_micro DESC, vec_id) AS rnk
        FROM scored)
      SELECT anchor, vec_id, score_micro, CAST(rnk AS BIGINT) AS rnk
      FROM r WHERE rnk <= 5 ORDER BY anchor, rnk"""))

  /** CLUSTER-BALANCED sampling — dataset balancing over the embedding
    * space (the published cluster-then-cap recipe for diversity-preserving
    * subsampling, e.g. the SemDeDup/SSL-curation family): assign every
    * vector to a trained cluster, keep AT MOST `quota` per cluster chosen
    * by seeded 32-bit md5 hash order (deterministic, reshuffle-proof —
    * the same pure-function-of-id contract as `pipe_sample`).
    * Over-represented regions are capped, sparse regions survive whole.
    * Output pins the per-cluster accounting AND the exact kept set (id
    * sum). Scale (r6 re-shape): the per-cluster quota runs on the
    * bounded-heap top-k aggregate (TopKByScore, score = −hashKey so its
    * (score DESC, id ASC) rank order IS (hashKey ASC, vec_id ASC) — a
    * 32-bit key is exactly representable in a Double) — partial heaps
    * below the exchange mean only |partitions|·k·quota rows ever cross
    * the shuffle. The window form (rank the WHOLE corpus inside k=8
    * fixed partitions — one task per cluster sorting corpus/8 rows,
    * regardless of cluster count) is kept as the oracle twin only. */
  val pipeBalance = Q("pipe_balance",
    (s, dir) => {
      val quota = 20
      val emb = Tables.load(s, dir, "embeddings")
      val assigned = emb.join(
        Ann.argminAssign(emb, "vec_id", "embedding",
          trainedCentroids(s, dir, 8, 2), "cid", "cv"), "vec_id")
      val hashKey =
        graft.operators.Dedup.h32(concat(lit("bal|"), col("vec_id")))
      assigned
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_total"),
          graft.plans.TopKByScore.topK(
            -hashKey.cast("double"), col("vec_id"), quota).as("__kept"))
        .select(col("cluster"), col("n_total"),
          size(col("__kept")).cast("long").as("n_kept"),
          aggregate(col("__kept"), lit(0L),
            (acc, e) => acc + e.getField("id")).as("kept_id_sum"))
        .orderBy("cluster")
    },
    Some(s"""
      WITH ${kmeansSql(8, 2)},
      assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
        FROM e CROSS JOIN c2 c),
      amin AS (SELECT vec_id, cid AS cluster FROM assign WHERE rn = 1),
      ranked AS (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY cluster
                 ORDER BY ('0x' || substr(md5('bal|' || vec_id), 1, 8))::BIGINT,
                          vec_id) AS r
        FROM amin)
      SELECT cluster, COUNT(*) AS n_total,
             CAST(SUM(CASE WHEN r <= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             CAST(SUM(CASE WHEN r <= 20 THEN vec_id ELSE 0 END) AS BIGINT)
               AS kept_id_sum
      FROM ranked GROUP BY cluster ORDER BY cluster"""))

  /** Bulk kNN JOIN ([[Ann.knnJoin]]): every embedding's approximate
    * top-3 cosine neighbors in one pass — the kNN-graph construction
    * primitive. Candidates are hyperplane-LSH band collisions (the
    * `dedup_embed` geometry, auto-sized from the corpus estimate and
    * resolving to the pinned (6, 6) at gate SFs so the static oracle
    * replays it); each source keeps a bounded top-k heap with map-side
    * partials — no window sort, no all-pairs anywhere. The oracle
    * replays banding, exact scoring, and the (desc micro-score, asc
    * neighbor) rank order per source. */
  val vKnnJoin = Q("v_knn_join",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val (bands, ps) = DedupQueries.embGeometry(s, dir)
      Ann.knnJoin(emb, "vec_id", "embedding", ps, bands, k = 3)
        .orderBy("src_id", "rnk")
    },
    Some(s"""
      ${knnJoinCtes()}
      SELECT src_id, nbr_id, score_micro, rnk
      FROM ranked WHERE rnk <= 3
      ORDER BY src_id, rnk"""))

  /** NN-descent refinement round ([[Ann.knnRefine]]) over the
    * `v_knn_join` base graph — the recall-improving second stage of
    * kNN-graph construction. The base graph is materialized ONCE per
    * fixture ([[Tables.memoTempDir]] — the derived-layout discipline; at
    * scale the base graph is a written table and each refinement round
    * reads the previous round's output), then candidates = base ∪
    * reverse(base) ∪ base∘base, rescored exactly, per-source bounded
    * heap. The oracle replays the base chain and the three expansion
    * arms in one statement; the refined score at each rank dominates the
    * base's (candidates ⊇ base edges — spec-asserted). */
  val vKnnJoinRefined = Q("v_knn_join_refined",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val baseDir = Tables.memoTempDir("knnjoin", dir) { target =>
        val (bands, ps) = DedupQueries.embGeometry(s, dir)
        Ann.knnJoin(emb, "vec_id", "embedding", ps, bands, k = 3)
          .write.mode("overwrite").parquet(target)
      }
      Ann.knnRefine(emb, "vec_id", "embedding",
          s.read.parquet(baseDir), k = 3)
        .orderBy("src_id", "rnk")
    },
    Some(s"""
      ${knnJoinCtes()},
      base AS (SELECT src_id, nbr_id FROM ranked WHERE rnk <= 3),
      expand AS (
        SELECT src_id, nbr_id FROM base
        UNION
        SELECT nbr_id AS src_id, src_id AS nbr_id FROM base
        UNION
        SELECT e1.src_id, e2.nbr_id
        FROM base e1 JOIN base e2 ON e1.nbr_id = e2.src_id),
      cand2 AS (
        SELECT src_id, nbr_id FROM expand WHERE src_id <> nbr_id),
      scored2 AS (${cosineScoredSql("cand2")}),
      ranked2 AS (
        SELECT src_id, nbr_id, score_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY src_id
                 ORDER BY score_micro DESC, nbr_id) AS BIGINT) AS rnk
        FROM scored2)
      SELECT src_id, nbr_id, score_micro, rnk
      FROM ranked2 WHERE rnk <= 3
      ORDER BY src_id, rnk"""))

  /** SemDeDup over the kNN graph ([[Ann.semanticDrop]]): exact clones
    * are PLANTED (every 50th vector copied under id+1000000 — the
    * oracle replays the plant as a UNION ALL source), the kNN join runs
    * over the planted corpus, and the keep-lowest-id ε-ball rule drops
    * each clone in favor of its original (τ = 0.999 in micro units —
    * only exact/near-exact duplicates qualify; the fixture's max
    * natural cosine ≈ 0.51 stays untouched). Output = the dropped ids
    * with their chosen representative and edge score. */
  val dedupKnnGraph = Q("dedup_knn_graph",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .select("vec_id", "embedding")
      val pts = emb.unionByName(emb.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      val (bands, ps) = DedupQueries.embGeometry(s, dir)
      Ann.semanticDrop(
          Ann.knnJoin(pts, "vec_id", "embedding", ps, bands, k = 3),
          tauMicro = 999000L)
        .orderBy("src_id")
    },
    Some {
      val src = """(SELECT vec_id, embedding FROM embeddings
                    UNION ALL
                    SELECT vec_id + 1000000 AS vec_id, embedding
                    FROM embeddings WHERE vec_id % 50 = 0)"""
      s"""
      ${knnJoinCtes(src)},
      topk AS (SELECT * FROM ranked WHERE rnk <= 3),
      drops AS (
        SELECT src_id, MIN(nbr_id) AS dup_of
        FROM topk WHERE score_micro >= 999000 AND nbr_id < src_id
        GROUP BY src_id)
      SELECT d.src_id, d.dup_of, t.score_micro
      FROM drops d JOIN topk t
        ON t.src_id = d.src_id AND t.nbr_id = d.dup_of
      ORDER BY d.src_id"""
    })

  /** Exact cosine scoring of a candidate-pair CTE (columns `src_id`,
    * `nbr_id`) against the points source `src`, micro-quantized — the
    * shared verify stage of the kNN-join oracles. */
  private def cosineScoredSql(candCte: String,
                              src: String = "embeddings"): String = s"""
        SELECT n.src_id, n.nbr_id,
               CAST(floor(
                 list_inner_product(CAST(sa.embedding AS DOUBLE[]),
                                    CAST(sb.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(CAST(sa.embedding AS DOUBLE[]),
                                            CAST(sa.embedding AS DOUBLE[])))
                    * sqrt(list_inner_product(CAST(sb.embedding AS DOUBLE[]),
                                              CAST(sb.embedding AS DOUBLE[]))))
                 * 1000000 + 0.5) AS BIGINT) AS score_micro
        FROM $candCte n
        JOIN $src sa ON sa.vec_id = n.src_id
        JOIN $src sb ON sb.vec_id = n.nbr_id"""

  /** Shared banded-oracle SQL parts for a (planes, bands) hyperplane
    * geometry: the per-band bucket column list (`… AS b0, …`) and the
    * any-band OR-join predicate. Every oracle that replays banding
    * (`dedup_embed`, the kNN-join family) builds from THIS pair, so the
    * replayed geometry cannot drift between them. */
  private[graft] def bandedOracleParts(planes: Seq[Seq[Double]],
                                       bands: Int): (String, String) = {
    val per = planes.length / bands
    // mirror the engine's divisibility contract (Ann.lshBandBuckets) —
    // integer division would otherwise silently band fewer planes here
    require(bands * per == planes.length,
      s"$bands bands must divide ${planes.length} planes")
    val bucketCols = (0 until bands).map { b =>
      s"${bucketSqlFor("embedding", planes.slice(b * per, (b + 1) * per))} AS b$b"
    }.mkString(", ")
    val orJoin = (0 until bands).map(b => s"a.b$b = c.b$b").mkString(" OR ")
    (bucketCols, orJoin)
  }

  /** Shared oracle chain of the bulk-kNN-join family: per-band bucket
    * columns → distinct collision pairs (either direction) → exact
    * micro-quantized cosine → per-source rank. Ends at `ranked`;
    * callers append the final SELECT (and the refined form its
    * expansion CTEs). Geometry is the pinned gate-SF resolution of the
    * auto-sizer, exactly like `dedup_embed`'s oracle. */
  private def knnJoinCtes(src: String = "embeddings"): String = {
    val (bucketCols, orJoin) =
      bandedOracleParts(DedupQueries.embPlanes, DedupQueries.embBands)
    s"""
      WITH bk AS (
        SELECT vec_id, embedding, $bucketCols FROM $src __p),
      cand AS (
        SELECT DISTINCT a.vec_id AS src_id, c.vec_id AS nbr_id
        FROM bk a JOIN bk c ON a.vec_id <> c.vec_id AND ($orJoin)),
      scored AS (${cosineScoredSql("cand", src)}),
      ranked AS (
        SELECT src_id, nbr_id, score_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY src_id
                 ORDER BY score_micro DESC, nbr_id) AS BIGINT) AS rnk
        FROM scored)"""
  }

  def queries: Seq[Q] = Seq(annKmeans, annIvf, annIvfIndexed,
    annIvfFiltered, annLsh, annLshStats, pipeHardNegatives, pipeBalance,
    vKnnJoin, vKnnJoinRefined, dedupKnnGraph)
}
