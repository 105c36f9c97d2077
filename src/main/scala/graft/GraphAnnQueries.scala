package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, GraphAnn}

/** Declared graph-ANN (HNSW-family) queries: batch NN-descent graph
  * construction + fixed-round beam-search serving, both fully
  * deterministic so the DuckDB oracle replays the BUILD and the SEARCH
  * end to end (the [[AnnQueries]] contract: exact-match gating of an
  * approximate algorithm). See [[graft.operators.GraphAnn]] for the
  * scale shape. */
object GraphAnnQueries {

  // graph hyper-parameters, shared by both queries and the oracle chain
  private val Bands = 4     // independent LSH orderings for init
  private val Per = 6       // planes per band → 64 buckets each
  private val W = 8         // successors linked per bucket ordering
  private val M = 12        // neighbors kept per node
  private val Rounds = 6    // NN-descent refinement rounds
  private val Beam = 10     // serving beam width
  private[graft] val SRounds = 5   // serving expansion rounds
  private val K = 10

  private lazy val planes = Ann.hyperplanes(Bands * Per, 64)

  /** DuckDB replay of GraphAnn.buildGraph: CTE chain ending in
    * `g{Rounds}` (src, dst, sm) — the ranked adjacency. Mirrors every
    * determinism pin: per-bucket id-ordered successor init, symmetric
    * closure, micro-quantized scores, (sm DESC, dst ASC) top-M. */
  private[graft] def graphSql: String = {
    val bandCtes = (0 until Bands).map { b =>
      val slice = planes.slice(b * Per, (b + 1) * Per)
      s"""
      o$b AS MATERIALIZED (
        SELECT vec_id, bkt,
               ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY vec_id) AS rn
        FROM (SELECT vec_id, ${AnnQueries.bucketSqlFor("embedding", slice)} AS bkt
              FROM embeddings))"""
    }.mkString(",")
    val pairSelects = (0 until Bands).map { b =>
      s"""
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM o$b a JOIN o$b b
          ON a.bkt = b.bkt AND b.rn BETWEEN a.rn + 1 AND a.rn + $W"""
    }.mkString(" UNION ")
    def scoreSelect(cand: String) = s"""
        SELECT c.src, c.dst,
               CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5)
                 AS BIGINT) AS sm
        FROM $cand c JOIN e a ON a.vec_id = c.src
                     JOIN e b ON b.vec_id = c.dst"""
    // `sm IS NOT NULL` mirrors the Spark side's null-score exclusion
    // (GraphAnn.scoreEdges drops unscorable edges BEFORE top-M): without
    // it a fixture row with a null/invalid embedding would occupy rank
    // slots here (DuckDB NULLS LAST) and silently diverge the gate
    def topMSelect(scored: String) = s"""
        SELECT src, dst, sm FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                      ORDER BY sm DESC, dst) AS rk
          FROM $scored WHERE sm IS NOT NULL) WHERE rk <= $M"""
    val init = s"""
      e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      $bandCtes,
      p AS MATERIALIZED ($pairSelects),
      c0 AS MATERIALIZED (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
      s0 AS MATERIALIZED (${scoreSelect("c0")}),
      g0 AS MATERIALIZED (${topMSelect("s0")})"""
    val rounds = (1 to Rounds).map { r =>
      s""",
      u$r AS MATERIALIZED (SELECT src, dst FROM g${r - 1}
              UNION SELECT dst, src FROM g${r - 1}),
      c$r AS MATERIALIZED (SELECT src, dst FROM u$r
              UNION
              SELECT a.src, b.dst FROM u$r a JOIN u$r b
              ON a.dst = b.src AND a.src <> b.dst),
      s$r AS MATERIALIZED (${scoreSelect(s"c$r")}),
      g$r AS MATERIALIZED (${topMSelect(s"s$r")})"""
    }.mkString
    init + rounds
  }

  /** Session-lifetime materialized graph index (src-sorted adjacency
    * parquet) — built once per JVM per fixture, shared by build digest,
    * search, and the recall spec; deterministic contents, so
    * memoization cannot change a result. */
  private[graft] def graphIndexDir(s: org.apache.spark.sql.SparkSession,
                                   dir: String): String =
    Tables.memoTempDir("graphann", dir) { target =>
      GraphAnn.buildGraphIndex(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", planes, Bands, Per, W, M, Rounds, target)
    }

  /** Graph CONSTRUCTION gate: per-node adjacency digest (degree,
    * neighbor-id sum, score sum) over the full NN-descent build — the
    * oracle replays init + both refinement rounds, so a single edge
    * difference anywhere in the graph flips the hash. */
  val annGraph = Q("ann_graph",
    (s, dir) =>
      s.read.parquet(graphIndexDir(s, dir))
        .groupBy("src")
        .agg(count(lit(1)).as("deg"),
          sum(col("dst")).as("nbr_sum"),
          sum(col("score_micro")).as("score_sum"))
        .orderBy("src"),
    Some(s"""
      WITH $graphSql
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg,
             CAST(SUM(dst) AS BIGINT) AS nbr_sum,
             CAST(SUM(sm) AS BIGINT) AS score_sum
      FROM g$Rounds GROUP BY src ORDER BY src"""))

  /** Graph SERVING gate: fixed-round beam search over the materialized
    * index — persisted entry seeds (no per-query corpus pass), frontier
    * probes as PushedFilters on the adjacency's `src`, candidate scoring
    * as literal id probes into the collection (GraphAnnSpec asserts both
    * plan shapes). The oracle unrolls the same $SRounds expansion rounds
    * over the replayed graph. */
  val annGraphSearch = Q("ann_graph_search",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      GraphAnn.beamSearchIndexed(emb, "vec_id", "embedding",
          graphIndexDir(s, dir), q, Beam, SRounds, K)
        .select(col("rnk"), col("id").as("vec_id"), col("score_micro"))
    },
    Some(s"""
      WITH $graphSql,
      $seedSql,
      ${searchCtes("", 0L)}
      SELECT CAST(rk AS BIGINT) AS rnk, vec_id, sm AS score_micro
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY sm DESC, vec_id) AS rk
            FROM sc$SRounds)
      WHERE rk <= $K ORDER BY rnk"""))

  /** The query-independent entry-seed CTE (the persisted `_seeds`
    * ordering) — shared by every serving replay in one statement. */
  private[graft] def seedSql: String = s"""
      seed AS MATERIALIZED (SELECT vec_id FROM e
               ORDER BY ('0x' || substr(md5('gseed|' || vec_id), 1, 8))::BIGINT,
                        vec_id LIMIT $Beam)"""

  /** One query's beam-search CTE chain (q/x/sc/f per round), names
    * prefixed so several queries replay inside ONE statement — the
    * batched-serving oracle's building block. */
  private[graft] def searchCtes(pfx: String, qid: Long): String = {
    val rounds = (1 to SRounds).map { r =>
      val prev = if (r == 1) "seed" else s"${pfx}f${r - 1}"
      s""",
        ${pfx}x$r AS MATERIALIZED (SELECT vec_id FROM $prev
                UNION
                SELECT a.dst AS vec_id FROM $prev s
                JOIN g$Rounds a ON a.src = s.vec_id),
        ${pfx}sc$r AS MATERIALIZED (
          SELECT x.vec_id,
                 CAST(floor(list_cosine_similarity(e.v,
                        (SELECT qv FROM ${pfx}q))
                        * 1000000 + 0.5) AS BIGINT) AS sm
          FROM ${pfx}x$r x JOIN e ON e.vec_id = x.vec_id),
        ${pfx}f$r AS MATERIALIZED (SELECT vec_id FROM (
                  SELECT *, ROW_NUMBER() OVER (ORDER BY sm DESC, vec_id) AS rk
                  FROM ${pfx}sc$r) WHERE rk <= $Beam)"""
    }.mkString
    s"""${pfx}q AS MATERIALIZED (SELECT v AS qv FROM e WHERE vec_id = $qid)
      $rounds"""
  }

  /** BATCHED serving gate: [[GraphAnn.beamSearchMultiIndexed]] — two
    * queries advance in lock-step sharing one adjacency probe and one
    * collection probe per round (job budget independent of batch size;
    * GraphAnnSpec asserts the budget and per-query equality with the
    * single-query path). The oracle replays BOTH beam searches inside
    * one statement over the same replayed graph. */
  val annGraphSearchMulti = Q("ann_graph_search_multi",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      def qv(id: Long): Seq[Double] = emb.filter(col("vec_id") === id)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      GraphAnn.beamSearchMultiIndexed(emb, "vec_id", "embedding",
          graphIndexDir(s, dir), Seq(0L -> qv(0L), 7L -> qv(7L)),
          Beam, SRounds, K)
        .select(col("query_id"), col("rnk"), col("id").as("vec_id"),
          col("score_micro"))
        .orderBy("query_id", "rnk")
    },
    Some(s"""
      WITH $graphSql,
      $seedSql,
      ${searchCtes("qa", 0L)},
      ${searchCtes("qb", 7L)}
      SELECT query_id, CAST(rk AS BIGINT) AS rnk, vec_id,
             sm AS score_micro
      FROM (
        SELECT 0 AS query_id, vec_id, sm,
               ROW_NUMBER() OVER (ORDER BY sm DESC, vec_id) AS rk
        FROM qasc$SRounds
        UNION ALL
        SELECT 7 AS query_id, vec_id, sm,
               ROW_NUMBER() OVER (ORDER BY sm DESC, vec_id) AS rk
        FROM qbsc$SRounds)
      WHERE rk <= $K ORDER BY query_id, rnk"""))

  /** Session-lifetime MAINTAINED graph index (sources/GraphIndex — the
    * refreshable per-round layout) built with the identical params. */
  private def graphIndexV2Dir(s: org.apache.spark.sql.SparkSession,
                              dir: String): String =
    Tables.memoTempDir("graphidx2", dir) { target =>
      graft.sources.GraphIndex.buildFromPoints(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", 16,
        target, graft.sources.GraphIndex.Params(Bands, Per, W, M, Rounds,
          planes))
    }

  /** The MAINTAINED layout's serving gate: the same per-node adjacency
    * digest as `ann_graph`, read from sources/GraphIndex's final-round
    * table (partition pruning on `round`) — the refreshable layout must
    * not change one row vs the flat build (the `ann_ivf_indexed`
    * materialization contract; refresh equivalence is GraphIndexSpec's
    * gate). */
  val annGraphIndexed = Q("ann_graph_indexed",
    (s, dir) =>
      graft.sources.GraphIndex.adjacency(s, graphIndexV2Dir(s, dir))
        .groupBy("src")
        .agg(count(lit(1)).as("deg"),
          sum(col("dst")).as("nbr_sum"),
          sum(col("score_micro")).as("score_sum"))
        .orderBy("src"),
    annGraph.oracle)

  def queries: Seq[Q] = Seq(annGraph, annGraphSearch,
    annGraphSearchMulti, annGraphIndexed)
}
