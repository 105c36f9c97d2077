package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.operators.TextAnalysis

/** Declared text-analysis queries over the `documents` fixture (V7 +
  * training-data-pipeline suite): token counting, language ID, quality
  * scoring, fingerprinting, corpus rollups. All emitted numbers are
  * integers (counts, micro-unit ratios, md5-derived hashes) for exact
  * oracle hashing. */
object TextQueries {

  /** Closed-form exact NTILE over columns `rnk` (1-based global rank)
    * and `n` (total rows): the first (n mod k) buckets hold (n div k)+1
    * rows, the rest (n div k). ONE definition — pipe_curriculum builds
    * its phase column from this string and PropertySpec evaluates the
    * SAME string against the windowed NTILE spec, so the production
    * expression cannot drift from the tested one. */
  private[graft] def ntileSql(k: Int, rnk: String = "rnk",
                              n: String = "n"): String = s"""
    CASE WHEN $rnk <= ($n % $k) * ($n DIV $k + 1)
         THEN ($rnk - 1) DIV ($n DIV $k + 1) + 1
         ELSE $n % $k + ($rnk - 1 - ($n % $k) * ($n DIV $k + 1))
              DIV ($n DIV $k) + 1 END"""

  /** DuckDB token-array CTE matching TextAnalysis.tokens. */
  private val tkSql = """
      WITH tk AS (
        SELECT doc_id, lang, source, n_chars, text,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           t -> t <> '') AS tk
        FROM documents)"""

  /** V7 — token counting: whitespace tokens, BPE-ish subwords, distinct
    * tokens, type-token ratio. */
  val txtTokens = Q("txt_tokens",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
      d.select(col("doc_id"),
          size(col("__tk")).as("ws_tokens"),
          TextAnalysis.subwordCount(col("text")).as("subwords"),
          size(array_distinct(col("__tk"))).as("uniq_tokens"),
          expr("CAST(size(array_distinct(__tk)) AS BIGINT) * 1000000 DIV size(__tk)")
            .as("ttr_micro"))
        .orderBy("doc_id")
    },
    Some(tkSql + """
      SELECT doc_id,
             len(tk) AS ws_tokens,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
               AS subwords,
             len(list_distinct(tk)) AS uniq_tokens,
             len(list_distinct(tk)) * 1000000 // len(tk) AS ttr_micro
      FROM tk ORDER BY doc_id"""))

  /** V7 — stopword-heuristic language ID; output is the (actual,
    * predicted) confusion matrix. */
  val txtLangid = Q("txt_langid",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .withColumn("pred_lang", TextAnalysis.langId(col("__tk")))
      d.groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },
    Some {
      val scoreCols = TextAnalysis.stopwords.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(tk, t -> list_contains($list, t))) AS s_$lang"
      }.mkString(",\n               ")
      val langs = TextAnalysis.stopwords.map(_._1)
      val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val pred = langs.map(l => s"WHEN s_$l = m THEN '$l'")
        .mkString("CASE ", " ", " END")
      tkSql + s""",
      sc AS (
        SELECT doc_id, lang,
               $scoreCols
        FROM tk),
      p AS (
        SELECT lang, $pred AS pred_lang
        FROM (SELECT *, $m AS m FROM sc))
      SELECT lang, pred_lang, COUNT(*) AS n
      FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""
    })

  /** V7 — quality scoring: length/alpha/digit/stopword ratios + a binary
    * keep flag, the standard pre-training corpus filter shape. */
  val txtQuality = Q("txt_quality",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .withColumn("n_tok", size(col("__tk")))
        .withColumn("alpha",
          length(regexp_replace(lower(col("text")), "[^a-z]", "")))
        .withColumn("digits",
          length(regexp_replace(col("text"), "[^0-9]", "")))
        .withColumn("nonws",
          length(regexp_replace(col("text"), "\\s", "")))
        .withColumn("stop_hits",
          TextAnalysis.hitCount(col("__tk"),
            TextAnalysis.stopwords.toMap.apply("en")))
      d.select(col("doc_id"), col("n_tok"),
          expr("CAST(alpha AS BIGINT) * 1000000 DIV length(text)").as("alpha_micro"),
          expr("CAST(digits AS BIGINT) * 1000000 DIV length(text)").as("digit_micro"),
          expr("CAST(nonws AS BIGINT) * 1000000 DIV n_tok").as("mean_tok_len_micro"),
          expr("CAST(stop_hits AS BIGINT) * 1000000 DIV n_tok").as("stop_micro"),
          expr("""CASE WHEN n_tok BETWEEN 10 AND 1000
                        AND CAST(alpha AS BIGINT) * 1000000 DIV length(text) >= 500000
                       THEN 1 ELSE 0 END""").as("keep"))
        .orderBy("doc_id")
    },
    Some {
      val en = TextAnalysis.stopwords.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      tkSql + s""",
      q AS (
        SELECT doc_id, text, tk,
               len(tk) AS n_tok,
               length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
               length(regexp_replace(text, '\\s', '', 'g')) AS nonws,
               len(list_filter(tk, t -> list_contains($en, t))) AS stop_hits
        FROM tk)
      SELECT doc_id, n_tok,
             alpha * 1000000 // length(text) AS alpha_micro,
             digits * 1000000 // length(text) AS digit_micro,
             nonws * 1000000 // n_tok AS mean_tok_len_micro,
             stop_hits * 1000000 // n_tok AS stop_micro,
             CASE WHEN n_tok BETWEEN 10 AND 1000
                   AND alpha * 1000000 // length(text) >= 500000
                  THEN 1 ELSE 0 END AS keep
      FROM q ORDER BY doc_id"""
    })

  /** V7 — within-document n-gram repetition (quality signal:
    * template/boilerplate text repeats its trigrams; dedup catches
    * cross-doc copies, this catches within-doc copies). One fused
    * compiled pass per doc (GramStatsExpr); integer outputs only —
    * counts and a milli-ratio via integer division, exact across
    * engines. */
  val txtRepetition = Q("txt_repetition",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.repetitionStats(
            TextAnalysis.tokens(col("text")), 3).as("__g"))
        .select(col("doc_id"),
          col("__g.total").as("total_grams"),
          col("__g.uniq").as("distinct_grams"),
          expr("((__g.total - __g.uniq) * 1000) DIV __g.total")
            .as("rep_milli"))
        .orderBy("doc_id"),
    Some("""
      WITH tok AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS ts
        FROM documents),
      g AS (
        SELECT doc_id,
               CASE WHEN len(ts) >= 3
                    THEN list_transform(range(len(ts) - 2),
                           i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])
                    ELSE [array_to_string(ts, ' ')] END AS grams
        FROM tok)
      SELECT doc_id,
             CAST(len(grams) AS BIGINT) AS total_grams,
             CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_grams,
             (CAST(len(grams) AS BIGINT)
               - CAST(len(list_distinct(grams)) AS BIGINT)) * 1000
               // CAST(len(grams) AS BIGINT) AS rep_milli
      FROM g ORDER BY doc_id"""))

  /** V7 — document chunking (64-token windows, stride 48 → 16-token
    * overlap): the op that turns a curated corpus into model-ready
    * pieces. Chunks are emitted as md5 + char length (full text would
    * bloat the compare; the hash pins the exact string). */
  val txtChunks = Q("txt_chunks",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunk(
            TextAnalysis.tokens(col("text")), 64, 48))
            .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          md5(col("chunk")).as("chunk_md5"),
          length(col("chunk")).cast("long").as("chunk_chars"))
        .orderBy("doc_id", "chunk_idx"),
    Some("""
      WITH tok AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS ts
        FROM documents),
      c AS (
        SELECT doc_id,
               CASE WHEN len(ts) = 0 THEN ['']
                    ELSE list_transform(range((len(ts) + 47) // 48),
                           i -> array_to_string(
                             ts[i*48 + 1 : least(i*48 + 64, len(ts))], ' '))
               END AS chunks
        FROM tok)
      SELECT doc_id,
             CAST(generate_subscripts(chunks, 1) - 1 AS BIGINT) AS chunk_idx,
             md5(unnest(chunks)) AS chunk_md5,
             CAST(length(unnest(chunks)) AS BIGINT) AS chunk_chars
      FROM c
      ORDER BY doc_id, chunk_idx"""))

  /** V7 — rolling-hash fingerprint: min 60-bit hash over char 5-grams. */
  val txtFingerprint = Q("txt_fingerprint",
    (s, dir) =>
      TextAnalysis.fingerprint(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""
      WITH g AS (
        SELECT doc_id,
               unnest(CASE WHEN length(text) >= 5
                 THEN list_transform(range(length(text) - 4),
                        i -> substr(text, CAST(i + 1 AS INT), 5))
                 ELSE [text] END) AS gram
        FROM documents)
      SELECT doc_id,
             MIN(('0x' || substr(md5(gram), 1, 15))::BIGINT) AS fingerprint
      FROM g GROUP BY doc_id ORDER BY doc_id"""))

  /** V7 — corpus rollup by (lang, source) with grouping-set totals. */
  val txtStats = Q("txt_stats",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .rollup("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          expr("sum(n_chars) * 1000000 DIV count(1)").as("avg_chars_micro"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
        .orderBy(asc_nulls_first("lang"), asc_nulls_first("source")),
    Some("""
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(n_chars) AS BIGINT) * 1000000 // COUNT(*) AS avg_chars_micro,
             MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      FROM documents
      GROUP BY ROLLUP (lang, source)
      ORDER BY lang NULLS FIRST, source NULLS FIRST"""))

  /** V7/V8 — deterministic fixed-point BM25 (k1=1.2, b=0.75 milli;
    * ln-free monotone idf surrogate — see TextAnalysis.bm25 scaladoc for
    * why an exact-hash gate can't use transcendentals): top-10 docs for a
    * 3-term query. The principled keyword side of hybrid retrieval. */
  /** The BM25 query-term set — single source for the Scala calls AND the
    * SQL CTE, so the engine and its oracle cannot drift. */
  private val bm25Terms = Seq("data", "query", "table")
  private val bm25TermsSql = bm25Terms.map(t => s"'$t'").mkString(", ")

  /** Shared BM25 CTE chain ending in `bm(doc_id, bm25_micro,
    * n_terms_hit)` — replays TextAnalysis.bm25 step by step. */
  private val bm25Ctes = tkSql + s""",
      lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM tk),
      stats AS (SELECT COUNT(*) AS n, SUM(len) AS sumlen FROM lens),
      tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(tk) AS tok FROM tk) u
        WHERE tok IN ($bm25TermsSql)
        GROUP BY doc_id, tok),
      dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      sc AS (
        SELECT t.doc_id, t.tf, l.len,
               s.sumlen * 1000 // s.n AS avglen_milli,
               1000000 * s.n // (d.df + 1) AS idf_micro
        FROM tf t
        JOIN dft d ON d.tok = t.tok
        JOIN lens l ON l.doc_id = t.doc_id
        CROSS JOIN stats s),
      sc2 AS (SELECT *, len * 1000000 // avglen_milli AS ratio_milli FROM sc),
      sc3 AS (SELECT *,
               (1000 - 750) + (750 * ratio_milli) // 1000 AS norm_milli
              FROM sc2),
      sc4 AS (SELECT *,
               tf * 1000 + (1200 * norm_milli) // 1000 AS denom_milli
              FROM sc3),
      sc5 AS (SELECT doc_id,
               idf_micro * tf * (1000 + 1200) // denom_milli
                 AS term_score_micro
              FROM sc4),
      bm AS (
        SELECT doc_id, CAST(SUM(term_score_micro) AS BIGINT) AS bm25_micro,
               COUNT(*) AS n_terms_hit
        FROM sc5 GROUP BY doc_id)"""

  val txtBm25 = Q("txt_bm25",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      TextAnalysis.bm25(d, "doc_id", "text", terms = bm25Terms)
        .orderBy(desc("bm25_micro"), col("doc_id"))
        .limit(10)
        .select("doc_id", "bm25_micro", "n_terms_hit")
    },
    Some(bm25Ctes + """
      SELECT doc_id, bm25_micro, n_terms_hit
      FROM bm ORDER BY bm25_micro DESC, doc_id LIMIT 10"""))

  /** [[txtBm25]] over the MATERIALIZED lexical postings — standalone
    * BM25 retrieval served without touching the corpus text
    * ([[graft.sources.LexIndex.bm25]], integer-for-integer the in-plan
    * chain, spec-pinned): a 3-term query opens ≤ 3/64 of the postings
    * bytes, scores fold per hit document, bounded top-10 heap. Same
    * oracle as `txt_bm25`. */
  val txtBm25Indexed = Q("txt_bm25_indexed",
    (s, dir) =>
      graft.sources.LexIndex.bm25(s,
          VectorQueries.lexIndexDir(s, dir), bm25Terms)
        .orderBy(desc("bm25_micro"), col("doc_id"))
        .limit(10)
        .select("doc_id", "bm25_micro", "n_terms_hit"),
    txtBm25.oracle)

  /** The BM25 chain of [[bm25Ctes]] parameterized by CTE suffix and
    * term set, ending at `bm$i(doc_id, bm25_micro, n_terms_hit)` — the
    * batched keys replay one chain per request (`lens` / `stats` are
    * term-independent and shared) and append their own tails. */
  private def bm25ChainFor(i: Int, terms: Seq[String]): String = {
    val ts = terms.map(t => s"'$t'").mkString(", ")
    s"""
      tf$i AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(tk) AS tok FROM tk) u
        WHERE tok IN ($ts)
        GROUP BY doc_id, tok),
      dft$i AS (SELECT tok, COUNT(*) AS df FROM tf$i GROUP BY tok),
      sc$i AS (
        SELECT t.doc_id, t.tf, l.len,
               s.sumlen * 1000 // s.n AS avglen_milli,
               1000000 * s.n // (d.df + 1) AS idf_micro
        FROM tf$i t
        JOIN dft$i d ON d.tok = t.tok
        JOIN lens l ON l.doc_id = t.doc_id
        CROSS JOIN stats s),
      sc2$i AS (SELECT *, len * 1000000 // avglen_milli AS ratio_milli
                FROM sc$i),
      sc3$i AS (SELECT *,
                 (1000 - 750) + (750 * ratio_milli) // 1000 AS norm_milli
                FROM sc2$i),
      sc4$i AS (SELECT *,
                 tf * 1000 + (1200 * norm_milli) // 1000 AS denom_milli
                FROM sc3$i),
      sc5$i AS (SELECT doc_id,
                 idf_micro * tf * (1000 + 1200) // denom_milli
                   AS term_score_micro
                FROM sc4$i),
      bm$i AS (
        SELECT doc_id, CAST(SUM(term_score_micro) AS BIGINT) AS bm25_micro,
               COUNT(*) AS n_terms_hit
        FROM sc5$i GROUP BY doc_id)"""
  }

  /** [[bm25ChainFor]] + the standalone-retrieval tail (per-query
    * bounded top-10 with the batch's query id). */
  private def bm25CtesFor(i: Int, terms: Seq[String]): String =
    bm25ChainFor(i, terms) + s""",
      top$i AS (
        SELECT CAST($i AS BIGINT) AS query_id, doc_id, bm25_micro,
               n_terms_hit
        FROM bm$i ORDER BY bm25_micro DESC, doc_id LIMIT 10)"""

  /** The batched BM25 request set — heterogeneous term sets, one with a
    * term the corpus may not contain (robustness of the pruned-scan
    * path to empty posting groups). */
  private val bm25Batch: Seq[(Long, Seq[String])] = Seq(
    0L -> bm25Terms,
    1L -> Seq("scan", "index"),
    2L -> Seq("the", "of", "data"))

  /** BATCHED indexed BM25 — N term sets through ONE pruned postings
    * scan ([[graft.sources.LexIndex.bm25Multi]]: the per-(token,
    * document) term score is query-independent, so the batch computes
    * it once over the union term set and each request's fold is a
    * broadcast membership join + Σ), per-query bounded top-10. The
    * Qdrant `query_batch_points` shape for the standalone BM25 surface;
    * the oracle replays every request's full fixed-point chain and
    * unions — the batch must be integer-identical to N single
    * queries. */
  val txtBm25MultiIndexed = Q("txt_bm25_multi_indexed",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.sources.LexIndex.bm25Multi(s,
          VectorQueries.lexIndexDir(s, dir), bm25Batch)
        .withColumn("__rk", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(desc("bm25_micro"), col("doc_id"))))
        .filter(col("__rk") <= 10)
        .select("query_id", "doc_id", "bm25_micro", "n_terms_hit")
        .orderBy(col("query_id"), desc("bm25_micro"), col("doc_id"))
    },
    Some {
      val legs = bm25Batch.map { case (qid, ts) =>
        bm25CtesFor(qid.toInt, ts)
      }
      tkSql + s""",
      lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM tk),
      stats AS (SELECT COUNT(*) AS n, SUM(len) AS sumlen FROM lens),
      ${legs.mkString(",")}
      SELECT query_id, doc_id, bm25_micro, n_terms_hit FROM (
        ${bm25Batch.map { case (qid, _) => s"SELECT * FROM top${qid.toInt}" }
          .mkString(" UNION ALL ")})
      ORDER BY query_id, bm25_micro DESC, doc_id"""
    })

  /** V8 — hybrid retrieval with the PRINCIPLED keyword side: BM25 top-100
    * list fused with the vector top-100 by RRF (same bounded-list form as
    * v_hybrid_rrf — TakeOrderedAndProject per side, rank over survivors,
    * full-outer fusion, rank-0 sentinel for absence). */
  val vHybridBm25 = Q("v_hybrid_bm25",
    (s, dir) => {
      val bmTop = graft.operators.Fusion.topNRanked(
          TextAnalysis.bm25(Tables.load(s, dir, "documents"),
            "doc_id", "text", terms = bm25Terms),
          100, "r_t", desc("bm25_micro"), col("doc_id"))
        .select(col("doc_id"), col("r_t"))
      graft.operators.Fusion.rrfFuse(bmTop,
        VectorQueries.vectorTop100(s, dir))
    },
    Some(bm25Ctes + s""",
      tr AS (
        SELECT doc_id, r_t FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS r_t
          FROM bm) WHERE r_t <= 100),
      ${VectorQueries.vectorTop100Sql}
      ${VectorQueries.rrfFuseTailSql}"""))

  /** [[vHybridBm25]] over the MATERIALIZED layouts (the r13 verdict's
    * top gap): the BM25 leg is served ENTIRELY from the lexical
    * postings index — tf and document length ride the posting row, df
    * folds over the ≤ 3 pruned term postings, N/Σlen are the pinned
    * build stats ([[graft.sources.LexIndex.bm25]], integer-for-integer
    * the [[TextAnalysis.bm25]] chain, spec-pinned) — so the keyword leg
    * never touches the corpus text; the vector leg is the exact-bound
    * codes-sidecar pipeline (VectorQueries.vectorTop100Indexed). No
    * zero tail here: BM25 lists only documents hitting ≥ 1 term, the
    * in-plan contract. Same oracle as `v_hybrid_bm25`. */
  val vHybridBm25Indexed = Q("v_hybrid_bm25_indexed",
    (s, dir) => {
      val lex = VectorQueries.lexIndexDir(s, dir)
      val bmTop = graft.operators.Fusion.topNRanked(
          graft.sources.LexIndex.bm25(s, lex, bm25Terms),
          100, "r_t", desc("bm25_micro"), col("doc_id"))
        .select(col("doc_id"), col("r_t"))
      graft.operators.Fusion.rrfFuse(bmTop,
        VectorQueries.vectorTop100Indexed(s, dir,
          VectorQueries.quantIndexDir(s, dir)).select("doc_id", "r_v"))
    },
    vHybridBm25.oracle)

  /** BATCHED indexed BM25 hybrid — the `query_batch_points` shape with
    * a BM25 prefetch leg: N requests (vector + term set) share ONE
    * pruned postings scan for the keyword legs
    * ([[graft.sources.LexIndex.bm25Multi]], per-query top-100 via
    * WindowGroupLimit heaps) and the TWO codes-only candidate scans
    * for the dense legs
    * ([[VectorQueries.vectorTopNIndexedMulti]]), fused per query
    * ([[graft.operators.Fusion.rrfFuseMulti]]). No zero tail — the
    * BM25 hybrid contract. The oracle replays every request's full
    * fixed-point BM25 chain + vector ranking + fuse and unions. */
  val vHybridBm25MultiIndexed = Q("v_hybrid_bm25_multi_indexed",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val reqs = AutoQueries.hybridBatch(s, dir)
      val bmTops = graft.sources.LexIndex.bm25Multi(s,
          VectorQueries.lexIndexDir(s, dir),
          reqs.map(r => r._1 -> r._3))
        .withColumn("r_t", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(desc("bm25_micro"), col("doc_id"))))
        .filter(col("r_t") <= 100)
        .select("query_id", "doc_id", "r_t")
      val vTops = VectorQueries.vectorTopNIndexedMulti(s, dir,
          VectorQueries.quantIndexDir(s, dir),
          reqs.map(r => r._1 -> r._2), 100)
        .select("query_id", "doc_id", "r_v")
      graft.operators.Fusion.rrfFuseMulti(bmTops, vTops)
    },
    Some {
      val legs = Seq((0, 0L, bm25Terms), (1, 3L, Seq("scan", "index")),
        (2, 7L, Seq("the", "of", "data")))
      tkSql + s""",
      lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM tk),
      stats AS (SELECT COUNT(*) AS n, SUM(len) AS sumlen FROM lens),
      ${legs.map { case (i, v, ts) =>
        bm25ChainFor(i, ts) + s""",
      tr$i AS (
        SELECT doc_id, r_t FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id)
                   AS r_t
          FROM bm$i) WHERE r_t <= 100),
      ${VectorQueries.vectorTopSqlFor(i, v)},
      ${VectorQueries.rrfFuseCteFor(i)}"""
      }.mkString(",")}
      SELECT query_id, doc_id, r_t, r_v, rrf_milli FROM (
        ${legs.map { case (i, _, _) => s"SELECT * FROM f$i" }
          .mkString(" UNION ALL ")})
      ORDER BY query_id, rrf_milli DESC, doc_id"""
    })

  /** Deterministic hash sampling — the reproducible subsampling op every
    * training-data pipeline needs (a seeded md5 bucket per doc id, no
    * rand()): the SAME rows are sampled on any engine, any run, any
    * partitioning. 10% sample, per-language counts. Narrow filter +
    * partial-agg — scale-free. */
  val pipeSample = Q("pipe_sample",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("__bucket",
          conv(substring(md5(concat(lit("sample|"), col("doc_id"))), 1, 8),
            16, 10).cast("long") % 100)
        .filter(col("__bucket") < 10)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang"),
    Some("""
      SELECT lang, COUNT(*) AS n_sampled
      FROM documents
      WHERE ('0x' || substr(md5('sample|' || doc_id), 1, 8))::BIGINT % 100 < 10
      GROUP BY lang ORDER BY lang"""))

  /** Deterministic train/val/test split assignment (80/10/10 by seeded
    * hash bucket) — membership is a pure function of the doc id, so the
    * split survives reshuffles, backfills, and engine changes. */
  val pipeSplit = Q("pipe_split",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("__bucket",
          conv(substring(md5(concat(lit("split|"), col("doc_id"))), 1, 8),
            16, 10).cast("long") % 100)
        .withColumn("split",
          when(col("__bucket") < 80, "train")
            .when(col("__bucket") < 90, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("chars"))
        .orderBy("split"),
    Some("""
      WITH b AS (
        SELECT *,
               ('0x' || substr(md5('split|' || doc_id), 1, 8))::BIGINT % 100
                 AS bucket
        FROM documents)
      SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
             COUNT(*) AS n,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM b GROUP BY 1 ORDER BY 1"""))

  /** Qdrant PHRASE matching (`match: {"phrase": ...}`, public since
    * 1.15) through the filter DSL: the query tokens must appear
    * CONSECUTIVELY in the field's token stream — `match.text` with word
    * order. Translated to one in-row containment test over the
    * normalized token join (no position explode, no shuffle); the
    * filter composes with any scan like every DSL predicate. */
  val txtPhrase = Q("txt_phrase",
    (s, dir) => {
      val dsl =
        """{"must": [{"key": "text", "match": {"phrase": "scan query"}}]}"""
      Tables.load(s, dir, "documents")
        .filter(graft.operators.PayloadFilter.fromJson(dsl, idCol = "doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy("lang")
    },
    Some("""
      WITH n AS (
        SELECT lang, n_chars,
               ' ' || array_to_string(list_filter(
                 string_split_regex(lower(text), '\s+'), x -> x <> ''), ' ')
                 || ' ' AS norm
        FROM documents)
      SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM n WHERE norm LIKE '% scan query %'
      GROUP BY lang ORDER BY lang"""))

  /** [[txtPhrase]] served through the TEXT payload index (Qdrant's
    * full-text `create_payload_index` type): the query tokens' posting
    * groups are probed at FILE LISTING (≤ 2/64 of the index bytes for
    * this 2-token phrase — the unindexed form scans every document's
    * text), candidate ids containing ALL token buckets come back, and
    * only those candidates' rows are fetched — a literal id probe when
    * the candidate set fits the ProbeLimit (driver memory bounded BY
    * CONSTRUCTION: `inIdsFrame` collects at most limit+1 ids), a fully
    * distributed semi-join when a common-token phrase makes it large —
    * then verified against the EXACT phrase predicate: hash collisions
    * and word order are both settled on the candidate rows, the
    * candidates-then-verify shape Qdrant's own phrase matching uses.
    * The postings dir is the SAME materialization the sparse queries
    * memoize (`RecommendQueries.sparseIndexDir` — one builder, one
    * on-disk copy). Same oracle as txt_phrase: the index must not
    * change a row. */
  val txtPhraseIndexed = Q("txt_phrase_indexed",
    (s, dir) => {
      val phrase = "scan query"
      val dsl =
        s"""{"must": [{"key": "text", "match": {"phrase": "$phrase"}}]}"""
      val cands = graft.sources.SparseIndex.candidatesContainingAll(
        s, RecommendQueries.sparseIndexDir(s, dir), "doc_id",
        phrase.split("\\s+").toSeq)
      graft.operators.GraphAnn.inIdsFrame(
          Tables.load(s, dir, "documents"), "doc_id", cands)
        .filter(graft.operators.PayloadFilter.fromJson(dsl, idCol = "doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy("lang")
    },
    txtPhrase.oracle)

  /** [[txtPhrase]] served from the POSITIONAL postings alone
    * ([[graft.sources.LexIndex.phraseMatches]]): adjacency and word
    * order are verified by intersecting the terms' shifted position
    * lists — the candidates-then-verify document fetch of
    * txt_phrase_indexed disappears, and the corpus TEXT column is never
    * read anywhere in the plan (only the matched ids' lang/n_chars for
    * the roll-up — the spec asserts text-free ReadSchemas). The
    * textbook positional-index phrase algorithm, each term's leg a
    * tgrp-pruned 64th of the index. Same oracle as txt_phrase: the
    * layout must not change a row. */
  val txtPhraseLex = Q("txt_phrase_lex",
    (s, dir) => {
      val matched = graft.sources.LexIndex.phraseMatches(
        s, VectorQueries.lexIndexDir(s, dir), Seq("scan", "query"))
      Tables.load(s, dir, "documents")
        .join(matched, Seq("doc_id"), "left_semi")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy("lang")
    },
    txtPhrase.oracle)

  /** STRATIFIED sampling — the language-rebalancing form of pipe_sample a
    * multilingual training mix needs: each stratum gets its OWN keep rate
    * (the dominant language downsampled hard, the rest kept high), and
    * membership stays a pure function of (seed, doc_id) — reshuffle/
    * backfill-proof like pipe_sample, so the mix is reproducible on any
    * engine. One scan: the per-row keep decision and both counts ride a
    * single partial-agg (no join against a rates table — the rate map is
    * a literal CASE, bounded by the declared strata). */
  val pipeStratified = Q("pipe_stratified",
    (s, dir) => {
      val rate = when(col("lang") === "en", 10L).otherwise(60L)
      Tables.load(s, dir, "documents")
        .withColumn("__keep",
          (conv(substring(md5(concat(lit("strat|"), col("doc_id"))), 1, 8),
            16, 10).cast("long") % 100) < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("__keep"), 1)).as("n_sampled"))
        .orderBy("lang")
    },
    Some("""
      WITH b AS (
        SELECT lang,
               ('0x' || substr(md5('strat|' || doc_id), 1, 8))::BIGINT % 100
                 < CASE WHEN lang = 'en' THEN 10 ELSE 60 END AS keep
        FROM documents)
      SELECT lang, COUNT(*) AS n_total,
             CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_sampled
      FROM b GROUP BY lang ORDER BY lang"""))

  /** Full winnowing fingerprints (Schleimer–Wilkerson–Aiken): character
    * 5-gram hashes → min per sliding window of 4 → distinct selections.
    * Guarantees any shared substring of length ≥ g + w − 1 = 8 chars
    * contributes a shared fingerprint — the near-dup detection contract a
    * single global-min fingerprint (txt_fingerprint) cannot give. Still
    * entirely in-row (nested HOFs over one text column): no explode, no
    * shuffle, a narrow map at any scale. Emitted as order-independent
    * integer digests (count, min, mod-sum) — fingerprint SETS can't be
    * hash-compared as array cells. */
  val txtWinnow = Q("txt_winnow",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("__fps",
          TextAnalysis.winnow(col("text"), g = 5, w = 4))
        .select(col("doc_id"),
          size(col("__fps")).as("n_fps"),
          array_min(col("__fps")).as("min_fp"),
          aggregate(transform(col("__fps"), x => x % 1000000007L),
            lit(0L), (a, x) => a + x).as("fp_modsum"))
        .orderBy("doc_id")
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               CASE WHEN length(text) >= 5
                 THEN list_transform(range(length(text) - 4), i ->
                   ('0x' || substr(md5(substr(text, CAST(i AS INT) + 1, 5)),
                    1, 15))::BIGINT)
                 ELSE [('0x' || substr(md5(text), 1, 15))::BIGINT]
               END AS grams
        FROM documents),
      w AS (
        SELECT doc_id,
               CASE WHEN len(grams) >= 4
                 THEN list_transform(range(len(grams) - 3), j ->
                   list_min(grams[(CAST(j AS INT) + 1):(CAST(j AS INT) + 4)]))
                 ELSE [list_min(grams)]
               END AS wins
        FROM g),
      f AS (SELECT doc_id, list_distinct(wins) AS fps FROM w)
      SELECT doc_id,
             CAST(len(fps) AS INT) AS n_fps,
             list_min(fps) AS min_fp,
             CAST(list_sum(list_transform(fps, x -> x % 1000000007))
               AS BIGINT) AS fp_modsum
      FROM f ORDER BY doc_id"""))

  /** The WHOLE curation pipeline as one composed declared query — the
    * end-to-end a training-data team actually runs: exact dedup (keep
    * the smallest id per content hash) → quality gate (token count +
    * alphabetic ratio, same thresholds as txt_quality) → deterministic
    * train/val/test assignment → per-(split, lang) corpus accounting.
    * One content-hash shuffle, narrow filters, one final partial-agg —
    * every stage is an operator gated above, composed here to prove the
    * shapes fit together (and that Catalyst fuses the narrow stages into
    * the scan pass). */
  val pipeCurate = Q("pipe_curate",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val keepers = docs
        .groupBy(md5(col("text")).as("__h"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      docs.join(keepers, "doc_id")
        .withColumn("__ntok", size(TextAnalysis.tokens(col("text"))))
        .withColumn("__alpha",
          length(regexp_replace(lower(col("text")), "[^a-z]", "")))
        .filter(col("__ntok").between(10, 1000) &&
          expr("CAST(__alpha AS BIGINT) * 1000000 DIV length(text)") >= 500000)
        .withColumn("__bucket",
          conv(substring(md5(concat(lit("split|"), col("doc_id"))), 1, 8),
            16, 10).cast("long") % 100)
        .withColumn("split",
          when(col("__bucket") < 80, "train")
            .when(col("__bucket") < 90, "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          sum(col("__ntok").cast("long")).as("tokens"))
        .orderBy("split", "lang")
    },
    Some("""
      WITH keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      kept AS (
        SELECT d.*,
               len(list_filter(regexp_split_to_array(lower(d.text), '\s+'),
                   t -> t <> '')) AS ntok,
               length(regexp_replace(lower(d.text), '[^a-z]', '', 'g'))
                 AS alpha
        FROM documents d JOIN keepers k ON k.doc_id = d.doc_id),
      gated AS (
        SELECT * FROM kept
        WHERE ntok BETWEEN 10 AND 1000
          AND CAST(alpha AS BIGINT) * 1000000 // length(text) >= 500000),
      assigned AS (
        SELECT *,
               CASE WHEN ('0x' || substr(md5('split|' || doc_id), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                    WHEN ('0x' || substr(md5('split|' || doc_id), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM gated)
      SELECT split, lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars,
             CAST(SUM(ntok) AS BIGINT) AS tokens
      FROM assigned
      GROUP BY split, lang
      ORDER BY split, lang"""))

  /** Deterministic EPOCH SHUFFLE — the global training-order permutation:
    * epoch e's order key is md5(e ‖ id), so every epoch is a different
    * but perfectly reproducible permutation (any engine, any run, any
    * partitioning — the pipe_sample contract extended to ordering). The
    * write path at scale is `repartitionByRange(key)` + in-file sort (a
    * distributed sort, the op's irreducible cost); the GATE pins (a) the
    * permutation PREFIX (first 10 docs of epoch 1 — TakeOrderedAndProject,
    * never a global window) and (b) the per-range-shard accounting (count
    * + id sum per key range = the shard assignment a range write would
    * produce), both bounded outputs. */
  val pipeShuffle = Q("pipe_shuffle",
    (s, dir) => {
      val key = conv(substring(
        md5(concat(lit("epoch1|"), col("doc_id"))), 1, 15), 16, 10)
        .cast("long")
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        .withColumn("__k", key)
      val head = docs.orderBy("__k", "doc_id").limit(10)
        .select(lit("head").as("part"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("__k", "doc_id")).cast("long").as("pos"),
          col("doc_id").as("val"))
      // 8 equal key ranges of the 60-bit hash space = the range-write
      // shard assignment; count + id sum pin membership exactly
      val shards = docs
        // integral shiftright, not Column `/` — a 60-bit key exceeds the
        // double mantissa, so float division could misplace boundary keys
        .groupBy(call_function("shiftright", col("__k"), lit(57)).as("pos"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("idsum"))
        .select(lit("shard").as("part"), col("pos"),
          (col("n") * 1000000000L + col("idsum")).as("val"))
      head.unionAll(shards).orderBy("part", "pos")
    },
    Some("""
      WITH k AS (
        SELECT doc_id,
               ('0x' || substr(md5('epoch1|' || doc_id), 1, 15))::BIGINT
                 AS kk
        FROM documents),
      h AS (
        SELECT 'head' AS part,
               ROW_NUMBER() OVER (ORDER BY kk, doc_id) AS pos,
               doc_id AS val
        FROM k ORDER BY kk, doc_id LIMIT 10),
      sh AS (
        SELECT 'shard' AS part, kk // 144115188075855872 AS pos,
               COUNT(*) * 1000000000 + SUM(doc_id) AS val
        FROM k GROUP BY 2)
      SELECT part, CAST(pos AS BIGINT) AS pos, CAST(val AS BIGINT) AS val
      FROM (SELECT * FROM h UNION ALL SELECT * FROM sh)
      ORDER BY part, pos"""))

  /** COUNT-MIN sketch over corpus token frequencies — the mergeable
    * heavy-hitter/frequency-estimation pass (Cormode–Muthukrishnan) a
    * 100 TB pipeline runs instead of a full token-frequency table when it
    * only needs point estimates: d=4 hash rows × w=1024 cells, cell =
    * Σ count of tokens hashing there (a SUM per cell — order-independent,
    * so unlike Misra–Gries-family sketches an exact-hash oracle CAN
    * replay it), estimate(t) = min over rows of t's cell. The row hashes
    * reuse the public affine family of the MinHash/Bloom kernels. Scale:
    * the exploded (row, cell, count) stream folds map-side into at most
    * d·w cells — the shuffle is bounded by the SKETCH size, never the
    * corpus; sketches merge by cell-wise addition (same contract as the
    * KMV sketch). The query emits, per probe term, the CM estimate
    * beside the exact count, pinning both the hash arithmetic and the
    * ≥-exact overestimate guarantee. */
  val sketchCm = Q("sketch_cm",
    (s, dir) => {
      val (d, w) = (4, 1024)
      val probes = Seq("data", "query", "table", "zebra")
      val toks = Tables.load(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("tok"), graft.operators.Dedup.h32(col("tok")).as("h"))
      val cells = toks
        .select(col("tok"), posexplode(array((0 until d).map(j =>
          ((lit(2L * j + 3) * col("h") + lit(104729L * j + 12345L))
            % graft.operators.Bloom.Mod) % w): _*)).as(Seq("row", "cell")))
        .groupBy("row", "cell").agg(count(lit(1)).as("c"))
      // probe cells are literals (driver-side md5 of the probe terms)
      val probeCells = probes.flatMap { t =>
        (0 until d).map(j => (t, j.toLong,
          ((2L * j + 3) * graft.operators.Dedup.h32(t)
            + (104729L * j + 12345L)) % graft.operators.Bloom.Mod % w))
      }
      val pc = s.createDataFrame(probeCells).toDF("term", "row", "cell")
      // the hint belongs on the JOINED (right) side of the left-outer
      // join — `cells` is the ≤ d·w-row sketch, the bounded side
      val est = pc.join(broadcast(cells), Seq("row", "cell"), "left")
        .na.fill(0L, Seq("c"))
        .groupBy("term").agg(min("c").as("cm_est"))
      val exact = toks.filter(col("tok").isin(probes: _*))
        .groupBy(col("tok").as("term")).agg(count(lit(1)).as("exact"))
      est.join(exact, Seq("term"), "left")
        .na.fill(0L, Seq("exact"))
        .select(col("term"), col("cm_est"), col("exact"),
          (col("cm_est") - col("exact")).as("overcount"))
        .orderBy("term")
    },
    Some("""
      WITH tok AS (
        SELECT t AS tok, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h
        FROM (SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS t
              FROM documents)),
      js AS (SELECT unnest(range(4)) AS j),
      cells AS (
        SELECT j AS row,
               ((2*j+3) * h + 104729*j + 12345) % 2147483647 % 1024 AS cell,
               COUNT(*) AS c
        FROM tok CROSS JOIN js
        GROUP BY 1, 2),
      probes AS (
        SELECT term, j AS row,
               ((2*j+3) * ('0x' || substr(md5(term), 1, 8))::BIGINT
                 + 104729*j + 12345) % 2147483647 % 1024 AS cell
        FROM (SELECT unnest(['data', 'query', 'table', 'zebra']) AS term)
        CROSS JOIN js),
      est AS (
        SELECT p.term, MIN(COALESCE(c.c, 0)) AS cm_est
        FROM probes p LEFT JOIN cells c USING (row, cell)
        GROUP BY p.term),
      ex AS (
        SELECT tok AS term, COUNT(*) AS exact FROM tok
        WHERE tok IN ('data', 'query', 'table', 'zebra')
        GROUP BY tok)
      SELECT e.term, CAST(e.cm_est AS BIGINT) AS cm_est,
             CAST(COALESCE(x.exact, 0) AS BIGINT) AS exact,
             CAST(e.cm_est - COALESCE(x.exact, 0) AS BIGINT) AS overcount
      FROM est e LEFT JOIN ex x USING (term)
      ORDER BY e.term"""))

  /** KMV distinct-count sketch per language (plans/KmvSketch.scala): the
    * corpus-statistics pass a 100 TB pipeline runs instead of
    * COUNT(DISTINCT) — the sketch dedups map-side in a ≤k-long buffer, so
    * only k·partitions longs shuffle where exact distinct shuffles every
    * distinct value. The exact count is emitted alongside at fixture
    * scale so the gate pins BOTH the sketch's order statistics and the
    * estimate arithmetic (Spark's own approx_count_distinct can't be
    * oracle-gated: HLL++ registers are implementation-defined). */
  val sketchDistinct = Q("sketch_distinct",
    (s, dir) => {
      import graft.plans.KmvSketch
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("lang"), col("text"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
            .as("h"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("exact_distinct"),
          KmvSketch.kmv(col("h"), 64).as("__sk"))
        .select(col("lang"), col("n_docs"), col("exact_distinct"),
          floor(KmvSketch.estimate(col("__sk"), 64) * 1000 + lit(0.5))
            .cast("long").as("kmv_est_milli"))
        .orderBy("lang")
    },
    Some("""
      WITH h AS (
        SELECT lang, text,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        FROM documents),
      d AS (SELECT DISTINCT lang, h FROM h),
      rk AS (
        SELECT lang, h,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
        FROM d),
      sk AS (
        SELECT lang, COUNT(*) AS sz,
               MAX(CASE WHEN rn = 64 THEN h END) AS kth
        FROM rk WHERE rn <= 64 GROUP BY lang),
      agg AS (
        SELECT lang, COUNT(*) AS n_docs,
               COUNT(DISTINCT text) AS exact_distinct
        FROM h GROUP BY lang)
      SELECT a.lang, a.n_docs, a.exact_distinct,
             CAST(floor((CASE WHEN s.sz < 64 THEN CAST(s.sz AS DOUBLE)
               ELSE 63.0 * 1152921504606846976.0 / CAST(s.kth AS DOUBLE)
               END) * 1000 + 0.5) AS BIGINT) AS kmv_est_milli
      FROM agg a JOIN sk s ON s.lang = a.lang
      ORDER BY a.lang"""))

  /** Corpus-percentile estimation under BOUNDED state — the
    * HDR-histogram quantile sketch ([[graft.operators.Hdr]]): doc-length
    * percentiles (the quality-filter thresholds a curation pipeline sets,
    * e.g. "drop below p10 / above p99 length") at ≤1% relative error
    * from a ≤7.3k-bucket histogram, at ANY corpus size. `q_percentile`
    * already serves exact order statistics with a shuffle ∝ distinct
    * values; this is its 100-TB companion: the groupBy state is bounded
    * by the bucket space, only (bucket, count) pairs cross the shuffle,
    * and the quantile walk (cumulative window + rank probe) runs over
    * the SKETCH — a ≤7.3k-row frame — never the corpus. Unlike
    * KLL/t-digest (whose compactions depend on merge order), the HDR
    * bucket is a pure integer function of the value, so the sketch is
    * deterministic, reshuffle-proof, and the oracle replays it
    * bit-for-bit IN the approximate regime — the gate covers the
    * estimator itself, not just an exact small-n special case.
    * Output: (q_permille, est) with est = the rank-holding bucket's
    * upper bound — never under the true order statistic, within
    * 2^-7 relative above it. */
  val sketchQuantile = Q("sketch_quantile",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Hdr
      // quantiles are over the NON-NULL population (pinned explicitly:
      // Spark windows sort NULLS FIRST, DuckDB NULLS LAST — an implicit
      // null bucket would shift every cumulative count differently)
      val docs = Tables.load(s, dir, "documents")
        .filter(col("n_chars").isNotNull)
      val sketch = docs
        .select(Hdr.bucket(col("n_chars")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
      // cumulative walk over the bounded sketch (≤7.3k rows): the
      // single-partition window is the POINT — this stage's input is
      // sketch-sized regardless of corpus size
      val cum = sketch.withColumn("cum",
        sum("c").over(org.apache.spark.sql.expressions.Window
          .orderBy("b").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      val total = docs.agg(count(lit(1)).as("n"))
      val qdf = Seq(100L, 250L, 500L, 750L, 900L, 990L).toDF("q_permille")
      qdf.crossJoin(total).crossJoin(cum)
        .filter(col("cum") >=
          call_function("div", col("q_permille") * col("n") + 999,
            lit(1000L)))
        .groupBy("q_permille").agg(min("b").as("mb"))
        .select(col("q_permille"), Hdr.upper(col("mb")).as("est"))
        .orderBy("q_permille")
    },
    Some("""
      WITH b AS (
        SELECT CASE WHEN n_chars < 128 THEN n_chars
                    ELSE (length(printf('%b', n_chars)) - 7) * 128
                         + (n_chars >> (length(printf('%b', n_chars)) - 8))
                         - 128 END AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
      cum AS (
        SELECT b, CAST(SUM(c) OVER (ORDER BY b) AS BIGINT) AS cum FROM b),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
            WHERE n_chars IS NOT NULL),
      q AS (SELECT CAST(unnest([100, 250, 500, 750, 900, 990]) AS BIGINT)
              AS q_permille)
      SELECT q_permille,
             CAST(CASE WHEN mb < 128 THEN mb
                  WHEN mb >= 7295 THEN 9223372036854775807
                  ELSE ((mb % 128) + 129)
                       * (CAST(1 AS BIGINT) << CAST(mb // 128 - 1 AS INT))
                       - 1 END AS BIGINT) AS est
      FROM (
        SELECT q.q_permille AS q_permille, MIN(cum.b) AS mb
        FROM q, t, cum
        WHERE cum.cum >= (q.q_permille * t.n + 999) // 1000
        GROUP BY 1)
      ORDER BY q_permille"""))

  /** Benchmark DECONTAMINATION — the published train-set hygiene pass
    * (exact n-gram overlap against a held-out evaluation set, the
    * GPT-3/PaLM appendix recipe): any training document sharing a word
    * 8-gram with a benchmark document is flagged, with gram-level counts
    * for the removal audit. Benchmark = docs with id % 97 == 0; the
    * training corpus = the rest plus planted contaminated docs
    * (id + max(doc_id)+1 — collision-proof at any SF: benchmark text with
    * a harmless suffix, so every benchmark 8-gram survives in them).
    * Grams come from the fused ShinglesExpr
    * (short docs contribute their whole text — a sub-8-token benchmark is
    * matched whole). Scale shape: the benchmark gram set is small by
    * definition → broadcast; the corpus explodes grams but the broadcast
    * hash-semi happens MAP-SIDE, so only hits reach the per-doc
    * aggregation — hits-only shuffle, same as BM25's term filter. */
  val txtDecontam = Q("txt_decontam",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      // plant offset = max(doc_id)+1, computed IN-PLAN (1-row aggregate
      // broadcast under a cross join — the scalar-subquery shape) rather
      // than an eager .head() action: the declared query is one job, and
      // the offset scan is a pruned single-column subtree (r7; the r6
      // form cost one whole extra driver action per invocation)
      val mx = docs.agg(max("doc_id").as("__max_id"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        .unionAll(bench.crossJoin(broadcast(mx))
          .select((col("doc_id") + col("__max_id") + 1).as("doc_id"),
            concat(col("text"), lit(" plus harmless suffix appended here"))
              .as("text")))
      val grams = graft.operators.Dedup.shingles(
        TextAnalysis.tokens(col("text")), 8)
      val bg = bench.select(explode(grams).as("bg")).distinct()
      // n_grams joins back from a separate NARROW projection (one shingle
      // pass per doc): projecting size(grams) beside explode(grams) makes
      // the collapsed project re-tokenize and re-shingle per EXPLODED row
      // (measured 9.5 s → 0.9 s at sf0.1) — the same
      // expression-recompute class as the r4 winnow fix
      val spread = graft.operators.Par.spread(corpus)
      val hits = spread.select(col("doc_id"), explode(grams).as("g"))
        .join(broadcast(bg), col("g") === col("bg"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("g")).as("n_hit_grams"))
      val ng = spread.select(col("doc_id"),
        size(grams).cast("long").as("n_grams"))
      // hits is contamination-bounded (small) — AQE broadcasts it
      hits.join(ng, "doc_id")
        .select("doc_id", "n_grams", "n_hits", "n_hit_grams")
        .orderBy("doc_id")
    },
    Some("""
      WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
      corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + (SELECT MAX(doc_id) FROM documents) + 1,
               text || ' plus harmless suffix appended here'
        FROM bench),
      bt AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
               t -> t <> '') AS ts FROM bench),
      bg AS (SELECT DISTINCT unnest(
               CASE WHEN len(ts) >= 8
                 THEN list_transform(range(len(ts) - 7),
                        i -> array_to_string(ts[i+1:i+8], ' '))
                 ELSE [array_to_string(ts, ' ')] END) AS bg
             FROM bt),
      ct AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
               t -> t <> '') AS ts FROM corpus),
      cg AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
                    unnest(gs) AS g
             FROM (SELECT doc_id,
                     CASE WHEN len(ts) >= 8
                       THEN list_transform(range(len(ts) - 7),
                              i -> array_to_string(ts[i+1:i+8], ' '))
                       ELSE [array_to_string(ts, ' ')] END AS gs
                   FROM ct))
      SELECT cg.doc_id, cg.n_grams, COUNT(*) AS n_hits,
             CAST(COUNT(DISTINCT cg.g) AS BIGINT) AS n_hit_grams
      FROM cg JOIN bg ON bg.bg = cg.g
      GROUP BY cg.doc_id, cg.n_grams
      ORDER BY cg.doc_id"""))

  /** SEQUENCE PACKING accounting — the pretraining step that concatenates
    * documents and cuts the stream into fixed-token-budget training
    * sequences (bins). Documents are sharded by seeded hash (shard count
    * is the parallelism/output-file knob — at 100 TB it tracks the
    * cluster, and each shard packs independently, so the only wide op is
    * a per-shard window sort, never a global one). Within a shard,
    * arrival order is doc_id; a doc's bin is the budget-quotient of the
    * tokens BEFORE it (greedy concat-and-cut — docs can span a boundary
    * and are assigned to their starting bin). Output: per (shard, bin)
    * doc and token counts — the packing manifest a data loader consumes.
    * Deterministic: a pure function of (doc_id, ntok), engine-replayable. */
  val pipePack = Q("pipe_pack",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 512
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"))
        .withColumn("shard",
          conv(substring(md5(concat(lit("pack|"), col("doc_id"))), 1, 8),
            16, 10).cast("long") % 8)
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("cum", sum("ntok").over(w))
        .withColumn("bin", expr(s"(cum - ntok) DIV $budget"))
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tokens"))
        .orderBy("shard", "bin")
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                 t -> t <> '')) AS BIGINT) AS ntok,
               ('0x' || substr(md5('pack|' || doc_id), 1, 8))::BIGINT % 8
                 AS shard
        FROM documents),
      c AS (
        SELECT shard, ntok,
               CAST(SUM(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM d)
      SELECT shard, (cum - ntok) // 512 AS bin,
             COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS tokens
      FROM c GROUP BY shard, bin ORDER BY shard, bin"""))

  /** PII SCRUBBING accounting — the redaction pass a training corpus gets
    * before release: detect emails and phone-shaped strings, count them,
    * and pin the redacted text by md5. The fixture corpus is synthetic
    * prose, so PII is PLANTED (docs with id % 50 == 0 get an email +
    * phone tail; plant ids offset by max(doc_id)+1, collision-proof at
    * any SF) — the oracle replants identically and replays both the
    * counts and the redaction. Patterns use only
    * dialect-portable regex (char classes + bounded quantifiers — no
    * backslash classes, which differ between Java regex and RE2).
    * A narrow per-row map: no shuffle before the final hits-only sort. */
  val txtPii = Q("txt_pii",
    (s, dir) => {
      val emailPat = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
      val phonePat = "[0-9]{3}-[0-9]{4}"
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      // offset in-plan (1-row broadcast scalar) — see txt_decontam
      val mx = docs.agg(max("doc_id").as("__max_id"))
      val planted = docs.unionAll(
        docs.filter(col("doc_id") % 50 === 0).crossJoin(broadcast(mx))
          .select((col("doc_id") + col("__max_id") + 1).as("doc_id"),
            concat(col("text"),
              concat(lit(" contact agent"), col("doc_id") % 1000,
                lit("@example.com or call 555-0199 now"))).as("text")))
      planted
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(emailPat), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(phonePat), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("text"), emailPat, "[EMAIL]"),
            phonePat, "[PHONE]")).as("redacted_md5"))
        .filter(col("n_emails") + col("n_phones") > 0)
        .orderBy("doc_id")
    },
    Some("""
      WITH planted AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + (SELECT MAX(doc_id) FROM documents) + 1,
               text || ' contact agent' || doc_id % 1000
                    || '@example.com or call 555-0199 now'
        FROM documents WHERE doc_id % 50 = 0),
      scrubbed AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[a-z0-9]+@[a-z0-9]+[.][a-z]+')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text,
                 '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(
                 regexp_replace(text, '[a-z0-9]+@[a-z0-9]+[.][a-z]+',
                   '[EMAIL]', 'g'),
                 '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS redacted_md5
        FROM planted)
      SELECT * FROM scrubbed WHERE n_emails + n_phones > 0
      ORDER BY doc_id"""))

  /** BPE pair counting — the inner statistic of tokenizer training (the
    * published byte-pair-encoding merge step: count adjacent symbol
    * pairs weighted by word frequency, merge the argmax; this query is
    * one exact counting pass = one merge decision). Scale shape is the
    * REAL way to run BPE on a corpus: fold the corpus to its
    * distinct-word frequency table first (Zipf: ≪ corpus, one map-side-
    * combined shuffle), then explode character pairs over DISTINCT words
    * only, weighting by freq — pair counting never touches corpus-sized
    * data again. Top-20 by (count desc, pair) = the next merge. */
  val txtBpePairs = Q("txt_bpe_pairs",
    (s, dir) => {
      val words = Tables.load(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      words.filter(length(col("w")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), length(col("w")) - 2),
          i => col("w").substr(i + 1, lit(2)))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
    },
    Some("""
      WITH tok AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
          t -> t <> '')) AS w
        FROM documents),
      wf AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w),
      p AS (
        SELECT freq,
               unnest(list_transform(range(length(w) - 1),
                 i -> substr(w, CAST(i + 1 AS INT), 2))) AS pair
        FROM wf WHERE length(w) >= 2)
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
      FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20"""))

  /** One BPE training round of the [[txtBpeTrain]] oracle: pair counts
    * over the current segmentation, the argmax merge (ties lexicographic
    * on the pair), and the merged next-round word table. `range(len-1)`
    * is empty for single-symbol words — they simply stop contributing
    * pairs, exactly the engine's `size(syms) >= 2` filter. The LEFT JOIN
    * carries the word table through a DRY round unchanged (a corpus out
    * of pairs before the last round yields a partial merge table and a
    * final segmentation — [[withBpe]]'s stop-early contract; a cross
    * join would instead EMPTY every later round). */
  private def bpeRoundSql(r: Int): String = s"""
      p$r AS (
        SELECT pr.a AS a, pr.b AS b, CAST(SUM(freq) AS BIGINT) AS n
        FROM (
          SELECT freq,
                 unnest(list_transform(range(len(syms) - 1),
                   i -> {'a': syms[i+1], 'b': syms[i+2]})) AS pr
          FROM (SELECT freq, string_split(trim(sym, '|'), '||') AS syms
                FROM w$r)
        ) GROUP BY pr.a, pr.b),
      b$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
      w${r + 1} AS (
        SELECT freq,
               CASE WHEN mrg.a IS NULL THEN sym
                    ELSE replace(sym, '|' || mrg.a || '||' || mrg.b || '|',
                                 '|' || mrg.a || mrg.b || '|') END AS sym
        FROM w$r LEFT JOIN b$r mrg ON TRUE)"""

  private val BpeRounds = 5

  /** Shared oracle prefix of the BPE family: corpus → distinct-word
    * frequency table in the delimited-symbol encoding (the engine's
    * `base` frame, expressed over DuckDB's tokenizer twin). */
  private val bpeBaseSql = s"""
      WITH tok AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
          t -> t <> '')) AS w
        FROM documents),
      w0 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS freq,
               regexp_replace(w, '(.)', '|\\1|', 'g') AS sym
        FROM tok WHERE length(w) >= 2 AND NOT contains(w, '|')
        GROUP BY w),
      ${(0 until BpeRounds).map(bpeRoundSql).mkString(",\n")}"""

  /** Shared BPE trainer behind [[txtBpeTrain]] (the merge table) and
    * [[txtBpeEncode]] (the applied tokenizer). The corpus folds ONCE to
    * the persisted distinct-word table; the [[BpeRounds]] training rounds
    * run eagerly (each collects its one-row argmax — the k-means
    * per-round discipline). A corpus that runs OUT of adjacent pairs
    * before the last round stops early with a partial merge table — the
    * oracle's empty-round cross joins produce exactly the same partial
    * table, so the two engines share the degenerate-input contract.
    * `use` receives the merges and the final-round word table and is
    * evaluated INSIDE the persist scope (try/finally — no caller can
    * leak the cached word table, even on a failing round). */
  private def withBpe[A](s: SparkSession, dir: String)(
      use: (IndexedSeq[(Long, String, String, Long)], DataFrame) => A)
      : A = {
    val base = Tables.load(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2 && !col("w").contains("|"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        regexp_replace(col("w"), "(.)", "|$1|").as("sym"))
      .persist()
    try {
      var cur = base
      val merges =
        IndexedSeq.newBuilder[(Long, String, String, Long)]
      var r = 0
      var dry = false
      while (r < BpeRounds && !dry) {
        val best = cur
          .select(col("freq"),
            split(trim(col("sym"), "|"), "\\|\\|").as("syms"))
          .filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("a"),
              element_at(col("syms"), i + 2).as("b")))).as("pr"))
          .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
          .agg(sum("freq").as("n"))
          .orderBy(desc("n"), col("a"), col("b"))
          .limit(1).collect()
        if (best.isEmpty) dry = true
        else {
          val (a, b, n) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          cur = cur.withColumn("sym",
            replace(col("sym"), lit(s"|$a||$b|"), lit(s"|$a$b|")))
          merges += ((r.toLong, a, b, n))
        }
        r += 1
      }
      use(merges.result(), cur)
    } finally {
      base.unpersist()
      ()
    }
  }

  /** BPE merge TRAINING — tokenizer training at corpus scale (the
    * byte-pair-encoding algorithm of Sennrich et al. 2016, the public
    * construction behind GPT/Llama-family tokenizers; [[txtBpePairs]]
    * counts ONE round's pair statistics, this trains the merge TABLE).
    * Each round: adjacent-symbol pair counts over the current
    * segmentation weighted by word frequency (overlapping positions
    * count, the reference algorithm's statistic), the globally
    * most-frequent pair wins (ties: lexicographically smallest, pinned
    * in both engines), and every word merges that pair leftmost-first
    * non-overlapping. Words ride as `|`-delimited symbol strings
    * (`|h||e||l||l||o|`) so the merge is ONE literal `replace` — both
    * engines' `replace` scans left-to-right and continues AFTER each
    * replacement, which IS the BPE merge order (the shared-delimiter
    * encoding makes adjacent symbols consume disjoint text, verified
    * against the reference algorithm in the spec). Output: the learned
    * 5-round merge table (round, lhs, rhs, pair_count) — the artifact a
    * tokenizer ships.
    *
    * Scale: the corpus folds ONCE to its distinct-word frequency table
    * (the Zipf fold every `txt_*` two-pass kernel uses — corpus tokens
    * shuffle once, then rounds never touch the corpus again); each round
    * is one pair-explode aggregation over the word table (shuffle ∝
    * distinct pair kinds, map-side partial agg), a driver argmax of ONE
    * row (TakeOrderedAndProject — the k-means/Lloyd per-round
    * discipline), and a narrow map applying the merge. The word table is
    * persisted once; round lineage is `replace`-on-`replace`, depth =
    * rounds. */
  val txtBpeTrain = Q("txt_bpe_train",
    (s, dir) => {
      import s.implicits._
      withBpe(s, dir)((merges, _) => merges)
        .toDF("merge_round", "lhs", "rhs", "pair_count")
        .orderBy("merge_round")
    },
    Some(s"""
      $bpeBaseSql
      ${(0 until BpeRounds).map(r =>
        s"""SELECT CAST($r AS BIGINT) AS merge_round, a AS lhs, b AS rhs,
               n AS pair_count FROM b$r""").mkString("\nUNION ALL\n")}
      ORDER BY merge_round"""))

  /** BPE tokenizer APPLICATION — encode the corpus with the merge table
    * [[txtBpeTrain]] learns and report the resulting vocabulary's top-20
    * tokens by corpus frequency (the tokenizer-shipping artifact's other
    * half: train produces the merges, encode proves they apply — the
    * multi-character winners in the output are exactly the learned
    * merges' closures). Segmentation rides the same delimited-symbol
    * encoding, so "apply the tokenizer" is the training loop's final
    * word table read back out: explode each distinct word's symbols
    * weighted by word frequency, sum per token, top-20 (ties: token
    * lexicographic, pinned in both engines).
    *
    * Scale: training cost is [[txtBpeTrain]]'s (the corpus folds once —
    * rounds never touch it again); encoding adds ONE explode-aggregate
    * over the distinct-word table (shuffle ∝ vocabulary size, map-side
    * partials) and a 20-row driver heap (TakeOrderedAndProject). Per-doc
    * token ids at serving time would be the same replace-chain as a
    * narrow per-row map — no shuffle at all. */
  val txtBpeEncode = Q("txt_bpe_encode",
    (s, dir) => {
      import s.implicits._
      withBpe(s, dir) { (_, words) =>
        words
          .select(col("freq"),
            explode(split(trim(col("sym"), "|"), "\\|\\|")).as("token"))
          .groupBy("token").agg(sum("freq").as("n"))
          .orderBy(desc("n"), col("token"))
          .limit(20).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
      }.toDF("token", "n")
    },
    Some(s"""
      $bpeBaseSql
      SELECT token, CAST(SUM(freq) AS BIGINT) AS n
      FROM (SELECT freq, unnest(string_split(trim(sym, '|'), '||')) AS token
            FROM w$BpeRounds)
      GROUP BY token ORDER BY n DESC, token LIMIT 20"""))

  /** Corpus-frequency quality score — the integer-exact stand-in for the
    * CCNet LM-perplexity filter (engines can't replay transcendentals, so
    * instead of log-probs this scores each document by how much of it is
    * made of corpus-COMMON tokens): pass 1 folds the corpus to its
    * distinct-token frequency table; pass 2 re-joins it and aggregates
    * per doc. A doc heavy in rare/garbage tokens scores low — the same
    * rank ordering the perplexity filter produces, in exactly replayable
    * integer math. Output per doc: token count, common-token ratio
    * (freq ≥ 25, micro), average token corpus-frequency (integer
    * division). Scale: the per-doc re-agg is one corpus-token shuffle
    * keyed by doc — the standard two-pass shape (CCNet is also two
    * passes). The token⋈freq join carries NO broadcast hint: the
    * distinct-token table is Zipf-HEAVY in distinct terms at corpus
    * scale (typos/numbers/unicode junk — billions of rows at 100 TB), so
    * forcing a broadcast is the r4 connected-components defect over
    * again; AQE broadcasts when the actual size fits and shuffle-joins
    * on `w` when it doesn't. */
  /** The freq-scoring chain parameterized by DECLARATIONS (the
    * [[graft.sources.ModelRouter]] declare-once law): pass 1 (the
    * corpus token-frequency fold) serves from the first declared
    * `token-freq` model layout, or runs in-plan when nothing matches —
    * row-identical either way (the layout is the persisted form of the
    * same deterministic fold; spec-pinned in both declaration
    * states). */
  private[graft] def freqScoreFrom(s: SparkSession,
                                   docs: org.apache.spark.sql.DataFrame,
                                   declared: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text")))
        .as("w"))
    val freq = graft.sources.ModelRouter.tableOr(s, declared,
        "token-freq") {
      toks.groupBy("w").agg(count(lit(1)).as("freq"))
    }
    toks.join(freq.select("w", "freq"), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ntok"),
        sum(when(col("freq") >= 25, 1L).otherwise(0L)).as("__common"),
        sum("freq").as("__fsum"))
      .select(col("doc_id"), col("ntok"),
        expr("__common * 1000000 DIV ntok").as("common_micro"),
        expr("__fsum DIV ntok").as("avg_freq"))
      .orderBy("doc_id")
  }

  val txtFreqScore = Q("txt_freq_score",
    (s, dir) =>
      freqScoreFrom(s, Tables.load(s, dir, "documents"), Nil),
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS w
        FROM documents),
      freq AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w)
      SELECT t.doc_id, COUNT(*) AS ntok,
             CAST(SUM(CASE WHEN f.freq >= 25 THEN 1 ELSE 0 END) AS BIGINT)
               * 1000000 // COUNT(*) AS common_micro,
             CAST(SUM(f.freq) AS BIGINT) // COUNT(*) AS avg_freq
      FROM tok t JOIN freq f ON f.w = t.w
      GROUP BY t.doc_id ORDER BY t.doc_id"""))

  /** Fit the corpus token-frequency table into a persisted
    * [[graft.sources.ModelIndex]] layout (form `table`) — the CCNet
    * shape made explicit: the frequency model is fit ONCE, versioned,
    * and served everywhere (at 100 TB the pass-1 fold is a corpus job
    * you do not re-run inside every scoring query). Pinned signal =
    * fit-corpus OOV token mass (0 by construction — the LM layout's
    * law). */
  private[graft] def fitFreqModel(docs: org.apache.spark.sql.DataFrame,
                                  target: String): Unit =
    graft.sources.ModelIndex.buildTable(
      docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq")),
      target, "token-freq", "w", "freq",
      "corpus distinct-token frequencies", docs.count(),
      signalMicro = 0L)

  private[graft] def freqModelDir(s: SparkSession, dir: String): String =
    Tables.memoTempDir("modelfreq", dir) { target =>
      fitFreqModel(Tables.load(s, dir, "documents"), target)
    }

  /** [[txtFreqScore]] served from the persisted frequency model: pass 1
    * (the corpus fold) comes from the layout, pass 2 is the same
    * token ⋈ freq join and per-doc aggregate — fit once, score many,
    * with [[graft.sources.ModelIndex.maintain]]'s OOV signal guarding
    * staleness. Same oracle as `txt_freq_score`: serving from the
    * layout must not change a row (the frequency table is a
    * deterministic function of the corpus). */
  val txtFreqScoreIndexed = Q("txt_freq_score_indexed",
    (s, dir) => {
      val freq = graft.sources.ModelIndex.table(s, freqModelDir(s, dir))
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text")))
          .as("w"))
      toks.join(freq, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("ntok"),
          sum(when(col("freq") >= 25, 1L).otherwise(0L)).as("__common"),
          sum("freq").as("__fsum"))
        .select(col("doc_id"), col("ntok"),
          expr("__common * 1000000 DIV ntok").as("common_micro"),
          expr("__fsum DIV ntok").as("avg_freq"))
        .orderBy("doc_id")
    },
    txtFreqScore.oracle)

  /** [[txtFreqScore]] ROUTED through a model DECLARATION — the
    * declare-once law for the learned text gates
    * ([[graft.sources.ModelRouter]], r15 verdict worklist #5): the
    * collection declares its pinned `token-freq` layout once and every
    * freq-scoring query serves pass 1 from it (the
    * `txt_freq_score_indexed` pipeline), while an undeclared collection
    * runs the in-plan fold — row-identical in both declaration states
    * (spec-pinned, the `v_auto_hybrid` combination pattern) under the
    * UNCHANGED `txt_freq_score` oracle. */
  val txtFreqScoreRouted = Q("txt_freq_score_routed",
    (s, dir) =>
      freqScoreFrom(s, Tables.load(s, dir, "documents"),
        Seq(freqModelDir(s, dir))),
    txtFreqScore.oracle)

  /** Domain MIXTURE weights — the data-mixing step that turns per-source
    * corpus sizes into sampling weights (the published temperature-
    * sampling recipe with α = 0.5, i.e. weight ∝ tokens^α): per source,
    * total tokens → wᵢ = floor(√tokensᵢ·1e3+0.5) (sqrt is correctly
    * rounded IEEE on every engine, then pinned to an integer), and the
    * normalized weight is integer division wᵢ·1e6 DIV Σwᵢ — exact and
    * order-independent, no float summation across groups. One partial-agg
    * pass + a tiny cross join against the 1-row total. */
  val pipeMix = Q("pipe_mix",
    (s, dir) => {
      val bySource = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"))
        .groupBy("source").agg(sum("ntok").as("tokens"))
        .withColumn("w_milli",
          floor(sqrt(col("tokens").cast("double")) * 1e3 + lit(0.5))
            .cast("long"))
      val total = bySource.agg(sum("w_milli").as("__wsum"))
      bySource.crossJoin(broadcast(total))
        .select(col("source"), col("tokens"), col("w_milli"),
          expr("w_milli * 1000000 DIV __wsum").as("weight_micro"))
        .orderBy("source")
    },
    Some("""
      WITH t AS (
        SELECT source,
               CAST(SUM(len(list_filter(
                 regexp_split_to_array(lower(text), '\s+'), x -> x <> '')))
                 AS BIGINT) AS tokens
        FROM documents GROUP BY source),
      w AS (
        SELECT source, tokens,
               CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000 + 0.5)
                 AS BIGINT) AS w_milli
        FROM t)
      SELECT source, tokens, w_milli,
             w_milli * 1000000
               // CAST((SELECT SUM(w_milli) FROM w) AS BIGINT)
               AS weight_micro
      FROM w ORDER BY source"""))

  /** BIGRAM NOVELTY score — the n-gram-LM quality signal corpus curation
    * uses without a model: a document whose word bigrams rarely appear in
    * the corpus-frequent set is "novel" (or noisy); one whose bigrams are
    * all stock phrases is boilerplate. novelty_pm = ‰ of the doc's bigram
    * INSTANCES absent from the corpus top-200 bigram table (exact integer,
    * `1000·unseen DIV total`).
    *
    * Scale shape: pass 1 folds exploded bigrams into (bigram, count)
    * partials map-side and keeps only the global top-200 on a bounded
    * heap — K is DATA-INDEPENDENT, so broadcasting the reference table is
    * legitimate (contrast the txt_freq_score defect class: an unbounded
    * distinct-token table must never be hinted). Pass 2 left-joins each
    * doc's bigrams against that 200-row broadcast map-side and partial-
    * aggregates per doc before the doc-keyed shuffle — the exploded
    * volume never crosses the wire unaggregated. */
  val txtNovelty = Q("txt_novelty",
    (s, dir) => {
      val bg = explodedBigrams(Tables.load(s, dir, "documents"))
      val top = broadcast(
        bg.groupBy("bigram").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), col("bigram")).limit(200)
          .select(col("bigram"), lit(1).as("hit")))
      bg.join(top, Seq("bigram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          count(col("hit")).as("seen"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("1000 * (n_bigrams - seen) DIV n_bigrams").as("novelty_pm"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS tk
        FROM documents),
      bg AS (
        SELECT doc_id, unnest(list_transform(range(len(tk) - 1),
          i -> tk[i + 1] || ' ' || tk[i + 2])) AS bigram
        FROM toks),
      top AS (SELECT bigram, COUNT(*) AS cnt FROM bg
              GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 200),
      per AS (SELECT b.doc_id, COUNT(*) AS n_bigrams, COUNT(t.bigram) AS seen
              FROM bg b LEFT JOIN top t USING (bigram) GROUP BY 1)
      SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
             CAST(1000 * (n_bigrams - seen) // n_bigrams AS BIGINT)
               AS novelty_pm
      FROM per ORDER BY doc_id"""))

  /** Corpus-trained BIGRAM-LM fluency score — the perplexity-filter
    * shape of CCNet/Gopher curation (Wenzek et al. 2020 §3.3: score
    * every document under a language model, drop the worst tail), with
    * the LM trained ON THE CORPUS ITSELF and an integer probability
    * surrogate instead of log-perplexity (ln is not exact-hash-
    * replayable — verify skill notes; the RANKING a filter needs is
    * preserved: fluent text has common transitions, garbage has rare
    * ones). Per bigram: p_micro = cnt(bigram)·1e6 DIV cnt(prefix w1);
    * per doc: the k-weighted mean of its bigrams' p_micro, integer DIV.
    *
    * Scale shape: per-doc bigram counts fold map-side; the transition
    * table and its prefix marginal are two aggregates over the DISTINCT
    * bigram domain (the second aggregates the first — never re-reads
    * the corpus); the per-doc probability lookup is an equi-join on
    * bigram between two distinct-domain tables (both ≪ corpus tokens),
    * and the final doc aggregate partial-folds again. No broadcast of
    * the corpus-scaling LM table anywhere — AQE decides. cnt·1e6 stays
    * in BIGINT below ~1e12 total bigrams; beyond, widen to decimal.
    *
    * The transition table is MATERIALIZED once per fixture
    * (`Tables.memoTempDir`, the ann_ivf_indexed discipline) — it is a
    * trained model artifact: at 100 TB the LM is trained once and
    * scoring runs per-document at ingest. Without the materialization
    * the naive plan re-derived the corpus bigram explode THREE times
    * (LM counts, prefix marginal, scoring join — three full scans,
    * 1.75 s idle); with it, scoring is ONE corpus scan + one
    * distinct-domain join. Deterministic contents → memo is gate-safe. */
  /** (doc_id, bigram) exploded rows — ONE definition feeding both
    * txt_novelty (ungrouped) and txt_lm_score (grouped counts); a
    * tokenization change edits exactly one place. */
  private def explodedBigrams(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.operators.TextAnalysis
    docs.withColumn("graft_toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        explode(when(size(col("graft_toks")) >= 2,
          expr("""transform(sequence(0, size(graft_toks) - 2),
                  i -> concat(graft_toks[i], ' ', graft_toks[i + 1]))"""))
          .otherwise(array())).as("bigram"))
  }

  private def bigramsOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    explodedBigrams(docs)
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("k"))

  /** DENOISING-OBJECTIVE CORPUS PREP (BERT/T5-style token masking) — the
    * augmentation step that turns raw text into (corrupted input, target)
    * training pairs: each token position masks independently at 15% by a
    * SEEDED HASH of (doc_id, position) — pure function of the data, so
    * the same pairs materialize on any engine, any run, any partitioning
    * (the `pipe_sample` reshuffle-proof contract; rand() would break
    * retry idempotence). Output pins the pair content via md5 of the
    * masked text and of the target sequence. Entirely in-row (one
    * `transform` lambda over the token array — no explode, no shuffle
    * beyond the final order): the 100 TB shape is a narrow map. */
  val pipeMask = Q("pipe_mask",
    (s, dir) => {
      import graft.operators.TextAnalysis
      Tables.load(s, dir, "documents")
        .withColumn("graft_toks", TextAnalysis.tokens(col("text")))
        .withColumn("mask", expr("""
          transform(graft_toks, (t, i) ->
            CAST(conv(substring(md5(concat(doc_id, '|', i)), 1, 8), 16, 10)
              AS BIGINT) % 20 < 3)"""))
        .select(col("doc_id"),
          size(col("graft_toks")).cast("long").as("n_tokens"),
          expr("""CAST(aggregate(mask, 0, (a, m) ->
            a + IF(m, 1, 0)) AS BIGINT)""").as("n_masked"),
          md5(expr("""array_join(zip_with(graft_toks, mask,
            (t, m) -> IF(m, '[MASK]', t)), ' ')""")).as("masked_md5"),
          md5(expr("""array_join(filter(zip_with(graft_toks, mask,
            (t, m) -> IF(m, t, NULL)), x -> x IS NOT NULL), ' ')"""))
            .as("target_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS tk
        FROM documents),
      m AS (
        SELECT doc_id, tk,
               list_transform(range(len(tk)), i ->
                 ('0x' || substr(md5(doc_id || '|' || i), 1, 8))::BIGINT
                   % 20 < 3) AS mask
        FROM toks)
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(mask, x -> x)) AS BIGINT) AS n_masked,
             -- COALESCE: DuckDB array_to_string([]) is NULL, Spark
             -- array_join([]) is '' — pin the empty case to md5('')
             md5(COALESCE(array_to_string(list_transform(range(len(tk)),
               i -> CASE WHEN mask[i + 1] THEN '[MASK]'
                    ELSE tk[i + 1] END), ' '), '')) AS masked_md5,
             md5(COALESCE(array_to_string(list_filter(
               list_transform(range(len(tk)),
                 i -> CASE WHEN mask[i + 1] THEN tk[i + 1] END),
               x -> x IS NOT NULL), ' '), '')) AS target_md5
      FROM m ORDER BY doc_id"""))

  /** Per-document TF-IDF KEYWORD EXTRACTION — the feature-extraction op
    * behind tag generation, sparse retrieval fields, and topic labeling:
    * each document's top-3 terms by tf·idf, idf the same ln-free
    * monotone integer surrogate BM25 uses ((1e6·N) DIV (df+1) — exact-
    * hash-replayable, order-preserving). Scale shape: (doc, term, tf)
    * folds map-side; the df table AGGREGATES THE AGGREGATE (never
    * re-reads the corpus); N is a 1-row stat (broadcast legal); the
    * per-doc top-3 ranks inside doc-keyed windows — millions of tiny
    * partitions, no global sort; scoring joins dt⋈df on term, both
    * sides ∝ the distinct (doc,term) / term domains. */
  val txtIdfKeywords = Q("txt_idf_keywords",
    (s, dir) => {
      import graft.operators.TextAnalysis
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val dt = docs
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfs = dt.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      dt.join(dfs, "term").crossJoin(broadcast(n))
        .withColumn("score",
          col("tf") * expr("(1000000 * n) DIV (df + 1)"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
          col("term"), col("score"))
        .orderBy("doc_id", "rnk")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS tk
        FROM documents),
      dt AS (
        SELECT doc_id, unnest(tk) AS term FROM toks),
      dtc AS (SELECT doc_id, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2),
      dfs AS (SELECT term, COUNT(*) AS df FROM dtc GROUP BY term),
      nn AS (SELECT COUNT(*) AS n FROM documents),
      sc AS (
        SELECT d.doc_id, d.term,
               d.tf * ((1000000 * nn.n) // (f.df + 1)) AS score
        FROM dtc d JOIN dfs f ON f.term = d.term, nn),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rnk FROM sc)
      SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
             CAST(score AS BIGINT) AS score
      FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  /** CURRICULUM PHASE ASSIGNMENT — order training data easy→hard and
    * split into k phases (curriculum learning; length is the standard
    * first-order difficulty proxy). The interesting part is HOW the
    * exact global rank is computed at scale: never a global sort of the
    * corpus. The length DOMAIN is bounded (distinct values ≪ rows), so
    * (1) per-length counts fold map-side, (2) ONE window over the
    * distinct-length table computes the running offset, (3) docs join
    * back on length and rank within their length group only
    * (`row_number` partitioned by length — thousands of small
    * partitions, no single-reducer sort anywhere), (4) global rank =
    * offset + within-group rank, and the NTILE bucketing is replayed as
    * a closed-form integer expression. The oracle is the plain
    * `NTILE(k) OVER (ORDER BY len, doc_id)` — the gate proves the
    * distributed rank IS the global sort's. */
  val pipeCurriculum = Q("pipe_curriculum",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 4
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      // off AND the global total n both ride ONE window over the
      // distinct-length table (the q_percentile discipline) — a global
      // count window over the joined corpus would funnel every row
      // through a single partition
      val wLen = Window.orderBy("len")
      val vc = docs.groupBy("len").agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(sum("c").over(
          wLen.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum("c").over(wLen.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      docs.join(vc.select("len", "off", "n"), "len")
        .withColumn("rnk", col("off") + row_number().over(
          Window.partitionBy("len").orderBy("doc_id")))
        .withColumn("phase", expr(TextQueries.ntileSql(k)))
        .select(col("doc_id"), col("len"), col("rnk"),
          col("phase").cast("long").as("phase"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
             CAST(ROW_NUMBER() OVER (ORDER BY length(text), doc_id)
               AS BIGINT) AS rnk,
             CAST(NTILE(4) OVER (ORDER BY length(text), doc_id)
               AS BIGINT) AS phase
      FROM documents ORDER BY doc_id"""))

  /** Fit the LM bigram-continuation table into a persisted
    * [[graft.sources.ModelIndex]] layout (form `table`): per-bigram
    * micro-probability p(w₂|w₁) = (count(w₁w₂)·1e6) DIV count(w₁·).
    * The pinned signal is the fit-corpus OOV mass — 0 BY CONSTRUCTION
    * (the fit corpus covers its own bigrams), so any new vocabulary
    * moves the maintain ratio off 1.0. The table also carries `cb` —
    * the bigram's fit-corpus occurrence count — so serving can split
    * the model into a bounded HOT head (top mass, broadcast) and a
    * join-served cold tail ([[txtLmScore]]'s r16 pruning). */
  private[graft] def fitLmModel(docs: org.apache.spark.sql.DataFrame,
                                target: String): Unit = {
    val dbg = bigramsOf(docs)
    val bgc = dbg.groupBy("bigram").agg(sum("k").as("cb"))
      .withColumn("w1", expr("split(bigram, ' ')[0]"))
    val pfx = bgc.groupBy("w1").agg(sum("cb").as("cp"))
    graft.sources.ModelIndex.buildTable(
      bgc.join(pfx, "w1")
        .select(col("bigram"), expr("(cb * 1000000) DIV cp").as("p_micro"),
          col("cb")),
      target, "lm-bigram", "bigram", "p_micro",
      "corpus bigram continuation counts", docs.count(),
      signalMicro = 0L)
  }

  /** Current-corpus OOV mass against a pinned LM layout — the drift
    * signal [[graft.sources.ModelIndex.maintain]] compares against the
    * fit-time 0. */
  private[graft] def lmSignalMicro(s: SparkSession, modelDir: String,
                                   docs: org.apache.spark.sql.DataFrame)
      : Long =
    graft.sources.ModelIndex.oovMicro(s, modelDir, bigramsOf(docs),
      "bigram", "k")

  private[graft] def lmModelDir(s: SparkSession, dir: String): String =
    Tables.memoTempDir("modellm", dir) { target =>
      fitLmModel(Tables.load(s, dir, "documents"), target)
    }

  /** Bounded hot-head size for the LM model's serving split: the top
    * [[LmHotBigrams]] bigrams by fit-corpus mass (the pinned `cb`
    * column) ride into generated code as a bound hash table — a
    * driver-bounded collect of exactly this many (bigram, p_micro)
    * rows — so the Zipf-overwhelming share of occurrences scores
    * IN-ROW and never shuffles. Correctness is split-independent —
    * both paths read the same pinned p_micro — so the knob tunes IO,
    * never rows. */
  private[graft] val LmHotBigrams: Int = 1 << 18

  /** The hot head: top-`k` model rows by pinned fit-time mass, as the
    * literal map [[graft.functions.LmBigramHotExpr]] binds — a
    * driver-bounded collect of exactly `k` (bigram, p_micro) rows. */
  private[graft] def lmHotHead(model: org.apache.spark.sql.DataFrame,
                               k: Int): Map[String, Long] =
    model.orderBy(desc("cb"), col("bigram"))
      .limit(k)
      .select("bigram", "p_micro")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The r16 LM serving chain, parameterized by the hot head so the
    * spec can force a TINY head and exercise the cold tail (at the
    * gate SFs the default head covers every bigram): hot occurrences
    * score in-row ([[graft.functions.LmBigramHotExpr]]), cold
    * occurrences explode into a left join against the model table,
    * and n_bigrams counts matched occurrences only — the wholesale
    * inner join's semantics row-for-row, whatever the split. */
  private[graft] def lmScoreServed(docs: org.apache.spark.sql.DataFrame,
                                   model: org.apache.spark.sql.DataFrame,
                                   hotMap: Map[String, Long])
      : org.apache.spark.sql.DataFrame = {
    val st = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.LmBigramHotExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(
          graft.operators.TextAnalysis.tokens(col("text"))),
        hotMap))
    docs
      .select(col("doc_id"), st.as("__lm"))
      .select(col("doc_id"), col("__lm.n_hot").as("n_hot"),
        col("__lm.sp_hot").as("sp_hot"),
        explode_outer(col("__lm.cold")).as("bigram"))
      .join(model.select("bigram", "p_micro"), Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(max("n_hot").as("n_hot"), max("sp_hot").as("sp_hot"),
        count("p_micro").as("n_cold"), sum("p_micro").as("sp_cold"))
      .withColumn("sp_cold", coalesce(col("sp_cold"), lit(0L)))
      .withColumn("n_bigrams", col("n_hot") + col("n_cold"))
      .filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("n_bigrams"),
        expr("(sp_hot + sp_cold) DIV n_bigrams").as("lm_score_micro"))
      .orderBy("doc_id")
  }

  val txtLmScore = Q("txt_lm_score",
    (s, dir) => {
      // served from the persisted model layout (the fit is pinned once
      // per fixture; at 100 TB it is a versioned corpus pass, not a
      // per-query memo) — same rows as fitting in-plan. r16: the
      // corpus ⋈ corpus-sized-model join (the suite's worst 1000×
      // probe, 148 s) is split on the pinned fit-time mass column:
      // the HOT head (top LmHotBigrams by cb) scores in-row through
      // [[graft.functions.LmBigramHotExpr]] — one documents scan, no
      // bigram explode, no (doc, bigram) aggregation, no shuffle for
      // the hot mass — and only COLD-tail occurrences explode into
      // the join against the model table. Σ p over occurrences equals
      // Σ k·p over distinct bigrams, and n_bigrams counts matched
      // occurrences only (the old inner join's semantics), so rows
      // are unchanged by construction (the DuckDB oracle is the gate).
      val model = graft.sources.ModelIndex.table(s, lmModelDir(s, dir))
      lmScoreServed(Tables.load(s, dir, "documents"), model,
        lmHotHead(model, LmHotBigrams))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS tk
        FROM documents),
      bg AS (
        SELECT doc_id, unnest(list_transform(range(len(tk) - 1),
          i -> tk[i + 1] || ' ' || tk[i + 2])) AS bigram
        FROM toks),
      dbg AS (SELECT doc_id, bigram, COUNT(*) AS k FROM bg GROUP BY 1, 2),
      bgc AS (SELECT bigram, SUM(k) AS cb,
                     split_part(bigram, ' ', 1) AS w1
              FROM dbg GROUP BY bigram),
      pfx AS (SELECT w1, SUM(cb) AS cp FROM bgc GROUP BY w1),
      pm AS (SELECT b.bigram, (b.cb * 1000000) // p.cp AS p_micro
             FROM bgc b JOIN pfx p ON p.w1 = b.w1),
      per AS (
        SELECT d.doc_id, SUM(d.k) AS n_bigrams,
               SUM(d.k * pm.p_micro) AS sp
        FROM dbg d JOIN pm ON pm.bigram = d.bigram
        GROUP BY d.doc_id)
      SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
             CAST(sp // n_bigrams AS BIGINT) AS lm_score_micro
      FROM per ORDER BY doc_id"""))

  /** V7 — hashed-feature linear classifier inference (the fastText /
    * quality-classifier serving shape a curation pipeline runs over every
    * document): token bigrams → hashing trick into 4096 buckets → fixed
    * integer weight per bucket → document score = Σ weights, keep iff
    * score > 0. UNLIKE txt_freq_score/txt_lm_score there is NO model
    * table and NO join — the weight lookup is a hash computed in-row
    * (that is the point of the hashing trick), so the whole inference is
    * one codegen'd projection and the only shuffle is the final per-lang
    * roll-up. Weights here are a deterministic md5-derived stand-in
    * (centered on 0, ±1000) — the same Embedder-style boundary as the
    * embedding stand-ins — but they enter the plan the way a TRAINED
    * model's would: as a literal 4096-long weight array indexed in-row
    * (the oracle recomputes each weight from its md5 definition; the
    * driver-side h32 twin makes the two bit-equal). Inference is the
    * fused TokensNgramScoreExpr kernel — the transform+aggregate HOF
    * chain it replaces evaluated interpreted lambdas per bigram:
    * same-session A/B at the 100× probe (`Dev classifyprobe`) 12.2–12.6 s
    * warm HOF vs 0.35–0.45 s fused, ~30× (spec pins the two bit-equal).
    * All-integer output, drift-free under the exact hash compare. */
  val txtClassify = Q("txt_classify",
    (s, dir) => {
      val weights = (0 until 4096).map(b =>
        (graft.operators.Dedup.h32("w|" + b) % 2001L) - 1000L)
      val score = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.TokensNgramScoreExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(
            graft.operators.Dedup.tokens(col("text"))),
          weights))
      Tables.load(s, dir, "documents")
        .select(col("lang"), score.as("score"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("score") > 0, 1)).as("n_keep"),
          sum("score").as("sum_score"))
        .orderBy("lang")
    },
    Some("""
      WITH tk AS (
        SELECT lang, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS tk
        FROM documents),
      sc AS (
        SELECT lang, coalesce(list_sum(list_transform(
          CASE WHEN len(tk) >= 2
            THEN list_transform(range(len(tk) - 1),
                   i -> tk[i + 1] || ' ' || tk[i + 2])
            ELSE [] END,
          g -> (('0x' || substr(md5('w|' ||
                  (('0x' || substr(md5(g), 1, 8))::BIGINT % 4096)),
                1, 8))::BIGINT % 2001) - 1000)), 0) AS score
        FROM tk)
      SELECT lang, COUNT(*) AS n_docs,
             COUNT(CASE WHEN score > 0 THEN 1 END) AS n_keep,
             CAST(SUM(score) AS BIGINT) AS sum_score
      FROM sc GROUP BY lang ORDER BY lang"""))

  /** Fit the DSIR importance-ratio LUT into a persisted
    * [[graft.sources.ModelIndex]] layout: one corpus pass aggregates
    * raw and target (lang = 'en') token counts per hashed unigram
    * bucket — BOUNDED at 1024 rows by construction, so the collect is
    * the literal-LUT discipline, never a corpus collect. Ratios are
    * Laplace-smoothed integer micro-probabilities (the log-free,
    * oracle-exact surrogate of the DSIR log-likelihood ratio: monotone
    * per bucket, summed per token). The pinned signal is the fit-time
    * teacher disagreement: target membership (lang = 'en') vs the
    * model's own above-parity call (per-token milli-ratio > 1000). */
  private[graft] def fitDsirModel(docs: org.apache.spark.sql.DataFrame,
                                  target: String): Unit = {
    val rows = docs
      .select(col("lang"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("t"))
      .select(col("lang"),
        pmod(graft.operators.Dedup.h32(col("t")), lit(1024L))
          .cast("int").as("bk"))
      .groupBy("bk")
      .agg(count(lit(1)).as("pr"),
        count(when(col("lang") === "en", 1)).as("pt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val prt = rows.map(_._2).sum
    val ptt = rows.map(_._3).sum
    val m = rows.map(t => t._1 -> (t._2, t._3)).toMap
    val ratios = (0 until 1024).map { b =>
      val (pr, pt) = m.getOrElse(b, (0L, 0L))
      val prm = math.max(((pr + 1L) * 1000000L) / (prt + 1024L), 1L)
      val ptm = ((pt + 1L) * 1000000L) / (ptt + 1024L)
      (ptm * 1000L) / prm
    }
    val (n, d) = dsirDisagreement(docs, ratios)
    graft.sources.ModelIndex.buildLut(docs.sparkSession, ratios, target,
      "dsir-ratio", "target domain = lang en", n, d)
  }

  /** Teacher disagreement of a DSIR ratio LUT on a corpus: target
    * membership vs the model's above-parity per-token score. Returns
    * (nDocs, disagreeMicro) — the [[graft.sources.ModelIndex]] drift
    * signal for the DSIR layout. */
  private[graft] def dsirDisagreement(
      docs: org.apache.spark.sql.DataFrame, ratios: Seq[Long])
      : (Long, Long) = {
    val toks = graft.operators.Dedup.tokens(col("text"))
    val score = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TokensNgramScoreExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(toks),
        ratios, g = 1))
    graft.sources.ModelIndex.disagreementMicro(
      docs.select(col("lang"), size(toks).cast("long").as("n_tok"),
          score.as("score"))
        .filter(col("n_tok") > 0)
        .withColumn("keep", expr("score DIV n_tok") > 1000),
      col("lang") === "en", col("keep"))
  }

  private[graft] def dsirModelDir(s: SparkSession, dir: String): String =
    Tables.memoTempDir("modeldsir", dir) { target =>
      fitDsirModel(Tables.load(s, dir, "documents"), target)
    }

  /** The served DSIR LUT (per-JVM memo of the persisted layout's
    * bounded weight read — deterministic, gate-safe). */
  private val dsirCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Long]]()
  private def dsirRatios(s: SparkSession, dir: String): Seq[Long] =
    dsirCache.computeIfAbsent(dir, _ =>
      graft.sources.ModelIndex.lut(s, dsirModelDir(s, dir)))

  /** Importance-resampling data selection (the DSIR shape, Xie et al.
    * 2023 — hashed n-gram importance weights of a TARGET domain against
    * the raw corpus): fit = ONE corpus pass into a 1024-bucket
    * (raw, target) frequency table (bounded output, map-side combined);
    * inference = the per-bucket micro-prob ratio LUT bound into the
    * fused unigram kernel (TokensNgramScoreExpr g = 1) — in-row scoring,
    * no model join, exactly the txt_classify serving shape with
    * data-FITTED weights instead of stand-ins. Integer ratios replace
    * the log-likelihood (transcendental-free oracle law); output = the
    * top-50 most-target-like documents by per-token milli-ratio. Target
    * here = lang 'en'; at scale the target table is the curated seed
    * corpus and the LUT refits per selection round. */
  val pipeDsir = Q("pipe_dsir",
    (s, dir) => {
      val toks = graft.operators.Dedup.tokens(col("text"))
      val score = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.TokensNgramScoreExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(toks),
          dsirRatios(s, dir), g = 1))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(toks).cast("long").as("n_tok"),
          score.as("score"))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("n_tok"),
          expr("score DIV n_tok").as("dsir_milli"))
        .orderBy(desc("dsir_milli"), col("doc_id"))
        .limit(50)
    },
    Some("""
      WITH tk AS (
        SELECT doc_id, lang, list_filter(
          regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS tk
        FROM documents),
      b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(unnest(tk)), 1, 8))::BIGINT % 1024 AS bk
        FROM tk),
      freq AS (
        SELECT bk, COUNT(*) AS pr,
               COUNT(CASE WHEN lang = 'en' THEN 1 END) AS pt
        FROM b GROUP BY bk),
      tot AS (SELECT SUM(pr) AS prt, SUM(pt) AS ptt FROM freq),
      ratio AS (
        SELECT bk,
               (((pt + 1) * 1000000) // (ptt + 1024) * 1000) //
                 greatest(((pr + 1) * 1000000) // (prt + 1024), 1) AS r
        FROM freq CROSS JOIN tot),
      per AS (
        SELECT b.doc_id, CAST(SUM(r.r) AS BIGINT) AS score
        FROM b JOIN ratio r USING (bk) GROUP BY b.doc_id)
      SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tok,
             CAST(p.score // len(t.tk) AS BIGINT) AS dsir_milli
      FROM tk t JOIN per p ON p.doc_id = t.doc_id
      WHERE len(t.tk) > 0
      ORDER BY dsir_milli DESC, t.doc_id LIMIT 50"""))

  /** The TRAINED classifier's weight LUT: ONE corpus pass folds
    * per-label bigram-bucket occurrence counts (output BOUNDED at 4096
    * rows by construction — the dsirRatios literal-LUT discipline), and
    * the weight is the Laplace-smoothed integer micro-prob ratio of the
    * two classes, CENTERED on 0 (ratio 1 → 0) so `score > 0` is the
    * likelihood-ratio keep decision. Teacher labels are the heuristic
    * stopword-density gate (`stop_hits · 10 ≥ n_tok`, the division-free
    * form of ratio ≥ 0.1) — the fastText recipe of distilling a cheap
    * rule/seed set into a hashed-feature model.
    *
    * Fit the trained quality classifier into a persisted
    * [[graft.sources.ModelIndex]] layout: the
    * [[graft.operators.TextAnalysis.fitBigramRatioWeights]] LUT over
    * the stopword-density teacher, with the fit-time teacher
    * disagreement pinned as the maintain signal. */
  /** The classifier's weight derivation — ONE definition shared by the
    * persisted fit ([[fitClassifierModel]]) and the router's in-plan
    * fallback ([[routedClassifierWeights]]), so the two can never
    * drift. */
  private[graft] def classifierFitWeights(
      docs: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val en = graft.operators.TextAnalysis.stopwords.toMap.apply("en")
    graft.operators.TextAnalysis.fitBigramRatioWeights(
      docs.select(graft.operators.Dedup.tokens(col("text")).as("tk"))
        .withColumn("label",
          graft.operators.TextAnalysis.hitCount(col("tk"), en) * 10
            >= size(col("tk"))),
      "tk", "label")
  }

  private[graft] def fitClassifierModel(
      docs: org.apache.spark.sql.DataFrame, target: String): Unit = {
    val w = classifierFitWeights(docs)
    val (n, d) = classifierDisagreement(docs, w)
    graft.sources.ModelIndex.buildLut(docs.sparkSession, w, target,
      "quality-classifier",
      "stopword-density rule (en hits x10 over n_tok)", n, d)
  }

  /** Teacher disagreement of a classifier LUT on a corpus — the
    * txt_classify_trained confusion's (label != keep) rate, one bounded
    * aggregation pass. Returns (nDocs, disagreeMicro). */
  private[graft] def classifierDisagreement(
      docs: org.apache.spark.sql.DataFrame, weights: Seq[Long])
      : (Long, Long) = {
    val en = graft.operators.TextAnalysis.stopwords.toMap.apply("en")
    val score = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TokensNgramScoreExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(col("tk")),
        weights))
    graft.sources.ModelIndex.disagreementMicro(
      docs.select(graft.operators.Dedup.tokens(col("text")).as("tk"))
        .withColumn("label", size(col("tk")) >= 2 &&
          graft.operators.TextAnalysis.hitCount(col("tk"), en) * 10
            >= size(col("tk")))
        .withColumn("keep", score > 0),
      col("label"), col("keep"))
  }

  private[graft] def classifierModelDir(s: SparkSession, dir: String)
      : String =
    Tables.memoTempDir("modelcls", dir) { target =>
      fitClassifierModel(Tables.load(s, dir, "documents"), target)
    }

  /** The served classifier LUT (per-JVM memo of the persisted layout's
    * bounded weight read — deterministic, gate-safe), ROUTED: the
    * memoized layout is the declaration, and
    * [[graft.sources.ModelRouter.lutOr]]'s in-plan fallback is the
    * same deterministic fit — so `pipe_curate_indexed`'s quality gate
    * and `txt_classify_trained` follow the declare-once law
    * (spec-pinned identical in both declaration states). */
  private val nbCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Long]]()
  private[graft] def trainedWeights(s: SparkSession, dir: String): Seq[Long] =
    nbCache.computeIfAbsent(dir, _ =>
      routedClassifierWeights(s, Tables.load(s, dir, "documents"),
        Seq(classifierModelDir(s, dir))))

  /** Classifier weight LUT by declaration with the in-plan fit as the
    * fallback (the [[graft.sources.ModelRouter]] law;
    * [[classifierFitWeights]] is the one weight definition both
    * states share). */
  private[graft] def routedClassifierWeights(
      s: SparkSession, docs: org.apache.spark.sql.DataFrame,
      declared: Seq[String]): Seq[Long] =
    graft.sources.ModelRouter.lutOr(s, declared, "quality-classifier") {
      classifierFitWeights(docs)
    }

  /** TRAINED hashed-feature quality classifier — closes the learned-gate
    * loop txt_classify (stand-in weights) and pipe_dsir (single-class
    * fit) left open: a two-class model FIT ON THE CORPUS (naive-Bayes
    * shape — per-bucket class-likelihood ratios over hashed token
    * bigrams, Laplace-smoothed, integer micro-probs replacing the
    * log-ratio exactly as pipe_dsir's transcendental-free oracle law)
    * against heuristic teacher labels, then served through the same
    * fused [[graft.functions.TokensNgramScoreExpr]] kernel inference
    * uses for the stand-in model — weights enter generated code via
    * addReferenceObj, no model table, no join. Training is ONE corpus
    * pass into a 4096-row bounded table (map-side combined); the output
    * is the per-language confusion roll-up of the model against its
    * teacher (n_docs / teacher positives / model keeps / agreement) —
    * the evaluation a pipeline runs before trusting a distilled gate.
    * All-integer, drift-free under the exact hash compare. */
  val txtClassifyTrained = Q("txt_classify_trained",
    (s, dir) => {
      val en = graft.operators.TextAnalysis.stopwords.toMap.apply("en")
      val toks = graft.operators.Dedup.tokens(col("text"))
      val score = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.TokensNgramScoreExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(col("tk")),
          trainedWeights(s, dir)))
      Tables.load(s, dir, "documents")
        .select(col("lang"), toks.as("tk"))
        .withColumn("label",
          when(size(col("tk")) >= 2 &&
            graft.operators.TextAnalysis.hitCount(col("tk"), en) * 10
              >= size(col("tk")), 1L).otherwise(0L))
        .withColumn("keep", when(score > 0, 1L).otherwise(0L))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("label").as("n_label"),
          sum("keep").as("n_keep"),
          sum(when(col("label") === col("keep"), 1L).otherwise(0L))
            .as("n_agree"))
        .orderBy("lang")
    },
    Some {
      val en = graft.operators.TextAnalysis.stopwords.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""
      WITH tk AS (
        SELECT doc_id, lang, list_filter(
          regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS tk
        FROM documents),
      lab AS (
        SELECT doc_id, lang, tk,
               CASE WHEN len(tk) >= 2 AND
                 len(list_filter(tk, t -> list_contains($en, t))) * 10
                   >= len(tk)
                 THEN 1 ELSE 0 END AS label
        FROM tk),
      bg AS (
        SELECT doc_id, label,
               unnest(list_transform(range(len(tk) - 1),
                 i -> tk[i + 1] || ' ' || tk[i + 2])) AS g
        FROM lab WHERE len(tk) >= 2),
      bk AS (
        SELECT doc_id, label,
               ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS bk
        FROM bg),
      freq AS (
        SELECT bk, COUNT(CASE WHEN label = 1 THEN 1 END) AS p,
                   COUNT(CASE WHEN label = 0 THEN 1 END) AS q
        FROM bk GROUP BY bk),
      tot AS (SELECT SUM(p) AS pt, SUM(q) AS qt FROM freq),
      w AS (
        SELECT bk,
               ((p + 1) * 1000000 // (pt + 4096)) * 1000 //
                 greatest((q + 1) * 1000000 // (qt + 4096), 1) - 1000 AS w
        FROM freq CROSS JOIN tot),
      sc AS (
        SELECT b.doc_id, SUM(w.w) AS score
        FROM bk b JOIN w USING (bk) GROUP BY b.doc_id),
      per AS (
        SELECT l.lang, l.label,
               CASE WHEN COALESCE(s.score, 0) > 0 THEN 1 ELSE 0 END AS keep
        FROM lab l LEFT JOIN sc s ON s.doc_id = l.doc_id)
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(label) AS BIGINT) AS n_label,
             CAST(SUM(keep) AS BIGINT) AS n_keep,
             CAST(SUM(CASE WHEN label = keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM per GROUP BY lang ORDER BY lang"""
    })

  /** SEMANTIC benchmark decontamination — the embedding-space twin of
    * txt_decontam's n-gram overlap (the published recipe for catching
    * paraphrased/translated eval leakage that n-gram matching misses:
    * flag every training item whose embedding sits within cosine τ of
    * any benchmark item). Decontamination needs EXACT RECALL — a missed
    * contamination poisons an eval — so unlike the cell-scoped
    * dedup_semantic_incremental there is NO candidate pruning: the
    * benchmark set (bounded by contract: eval suites are thousands of
    * items, not corpora) is BROADCAST and the corpus is scanned ONCE
    * with the per-row max-over-benchmark verify fused in-plan — zero
    * corpus shuffle, hits-only output. Fixture benchmark: perturbed
    * copies of every vec_id % 97 == 0 embedding (the leaked items,
    * cosine ≈ 0.97 to their sources) and negated copies of % 97 == 3
    * (clean items — max natural |cosine| is 0.60, far under τ = 0.9, so
    * they flag nothing). Verdict per contaminated doc: lowest matching
    * bench id (the dedup keep-lowest shape). */
  val txtDecontamSemantic = Q("txt_decontam_semantic",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val off = DedupQueries.plantOffset(s, dir, "embeddings", "vec_id")
      val bench = emb.filter(col("vec_id") % 97 === 0)
        .select((col("vec_id") + off).as("bench_id"),
          concat(array(element_at(col("v"), 1) + lit(0.25)),
            slice(col("v"), 2, 63)).as("bv"))
        .unionAll(emb.filter(col("vec_id") % 97 === 3)
          .select((col("vec_id") + off * 2).as("bench_id"),
            transform(col("v"), x => -x).as("bv")))
      emb.crossJoin(broadcast(bench))
        .withColumn("score_micro",
          floor(graft.functions.VectorOps.cosine(col("v"), col("bv"))
            * 1e6 + lit(0.5)).cast("long"))
        .filter(col("score_micro") >= 900000)
        .groupBy("vec_id")
        .agg(min("bench_id").as("bench_id"),
          min_by(col("score_micro"), col("bench_id")).as("score_micro"))
        .orderBy("vec_id")
    },
    Some("""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      boff AS (SELECT greatest(100000, max(vec_id) + 1) AS o
               FROM embeddings),
      bench AS (
        SELECT vec_id + (SELECT o FROM boff) AS bench_id,
               [v[1] + 0.25] || v[2:64] AS bv
        FROM e WHERE vec_id % 97 = 0
        UNION ALL
        SELECT vec_id + 2 * (SELECT o FROM boff),
               list_transform(v, x -> -x)
        FROM e WHERE vec_id % 97 = 3),
      hits AS (
        SELECT e.vec_id, b.bench_id,
               CAST(floor(list_cosine_similarity(e.v, b.bv) * 1000000 + 0.5)
                 AS BIGINT) AS score_micro
        FROM e CROSS JOIN bench b)
      SELECT vec_id, MIN(bench_id) AS bench_id,
             MIN_BY(score_micro, bench_id) AS score_micro
      FROM hits WHERE score_micro >= 900000
      GROUP BY 1 ORDER BY 1"""))

  def queries: Seq[Q] = Seq(txtBm25, txtBm25Indexed, txtBm25MultiIndexed,
    vHybridBm25, vHybridBm25MultiIndexed,
    vHybridBm25Indexed,
    txtTokens, txtLangid,
    txtQuality, txtFingerprint, txtRepetition, txtChunks, txtStats, txtPhrase,
    txtPhraseIndexed, txtPhraseLex,
    pipeSample, pipeSplit, pipeStratified, pipeShuffle, txtWinnow, pipeCurate,
    sketchDistinct, sketchCm, sketchQuantile, txtDecontam, pipePack,
    txtPii, txtBpePairs,
    txtBpeTrain, txtBpeEncode,
    txtFreqScore, txtFreqScoreIndexed, txtFreqScoreRouted, pipeMix,
    txtNovelty, txtLmScore,
    pipeCurriculum,
    txtIdfKeywords, pipeMask, txtClassify, pipeDsir, txtClassifyTrained,
    txtDecontamSemantic)
}
