package graft

import org.apache.spark.sql.functions._
import graft.operators.Embed

/** Declared embedding queries. The DuckDB oracle recomputes the whole
  * feature-hash pipeline (tokenize → md5 bucket/sign → bucket sums →
  * dense → L2 normalize) independently in SQL.
  *
  * Cross-engine exactness: every emitted number is an INTEGER in micro
  * units — element values are quantized with `floor(x*1e6 + 0.5)`, which
  * both engines evaluate on bit-identical doubles (integer-valued inputs,
  * IEEE sqrt/divide), so the ±0.5 margin makes the integer immune to
  * last-ulp drift. `round()` is deliberately avoided: Spark rounds via
  * exact BigDecimal, DuckDB via `std::round(x*1e6)/1e6`, and the two
  * disagree on values whose decimal expansion sits at the .5 boundary —
  * that killed the round-1 hash match. Arrays are never emitted directly
  * (the driver's row-sorting compare can't order array cells); vectors
  * travel as comma-joined integer strings. */
object EmbedQueries {

  /** Prefixed oracle CTE chain producing `{p}emb(doc_id, embedding)` with
    * floor-quantized elements for a given (dim, seed, source column) —
    * seed namespaces the hash family exactly like Embed.embedText's
    * `seed` parameter. Chains compose (multimodal = two chains). */
  private def vecCtes(p: String, dim: Int, seed: String,
                      textExpr: String): String = s"""
      ${p}toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower($textExpr), '\\s+')) AS tok
        FROM documents),
      ${p}h AS (
        SELECT doc_id,
               ('0x' || substr(md5('$seed' || tok), 1, 8))::BIGINT % $dim AS bucket,
               CASE WHEN ('0x' || substr(md5('$seed' || tok), 9, 1))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM ${p}toks WHERE tok <> ''),
      ${p}bsum AS (
        SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS v
        FROM ${p}h GROUP BY doc_id, bucket),
      ${p}dense AS (
        SELECT d.doc_id, i.bucket, CAST(COALESCE(b.v, 0) AS DOUBLE) AS v
        FROM (SELECT DISTINCT doc_id FROM documents) d
        CROSS JOIN (SELECT unnest(range($dim)) AS bucket) i
        LEFT JOIN ${p}bsum b ON b.doc_id = d.doc_id AND b.bucket = i.bucket),
      ${p}vec AS (
        SELECT doc_id, list(v ORDER BY bucket) AS raw
        FROM ${p}dense GROUP BY doc_id),
      ${p}nrm AS (
        SELECT doc_id, raw, sqrt(list_inner_product(raw, raw)) AS n
        FROM ${p}vec),
      ${p}emb AS (
        SELECT doc_id,
               CASE WHEN n = 0 THEN raw
                    ELSE list_transform(raw,
                      x -> CAST(floor(x / n * 1000000 + 0.5) AS DOUBLE) / 1000000)
               END AS embedding
        FROM ${p}nrm)"""

  /** Unprefixed single-chain form (text column, no seed). */
  private def oracleVecSql(dim: Int): String =
    "\n      WITH " + vecCtes("", dim, "", "text")

  /** O9/O10 — embed every document; vector emitted as a comma-joined
    * string of micro-unit (1e-6) integers. Runs through the BATCH
    * inference boundary (Embedder + mapPartitions, model init once per
    * partition — the path a real ONNX model plugs into); embed_checksum
    * below gates the SQL-expression twin of the same pipeline, so both
    * physical forms stay oracle-checked. */
  val embedText = Q("embed_text",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Embed.embedTextBatch(docs, "text", model = "graft/hash-64")
        .select(col("doc_id"),
          array_join(transform(col("embedding"),
            x => floor(x * 1e6 + lit(0.5)).cast("string")), ",").as("vec_str"))
        .orderBy("doc_id")
    },
    Some(oracleVecSql(64) + """
      SELECT doc_id,
             array_to_string(list_transform(embedding,
               x -> CAST(CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS vec_str
      FROM emb ORDER BY doc_id"""))

  /** Scalar fold of the same pipeline: dim + micro-unit element checksum. */
  val embedChecksum = Q("embed_checksum",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Embed.embedText(docs, "doc_id", "text", model = "graft/hash-64")
        .select(col("doc_id"),
          size(col("embedding")).as("dim"),
          aggregate(transform(col("embedding"), x => floor(x * 1e6 + lit(0.5))),
            lit(0L), (a, x) => a + x).as("checksum_micro"))
        .orderBy("doc_id")
    },
    Some(oracleVecSql(64) + """
      SELECT doc_id, len(embedding)::INT AS dim,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))) AS BIGINT) AS checksum_micro
      FROM emb ORDER BY doc_id"""))

  /** O10/O11 — the multimodal named-vector pair (CLIP text+vision stand-in,
    * `qdrant_embedder.py:71-90`): both 512-dim vectors per doc, emitted as
    * micro-unit checksums. The oracle recomputes BOTH hash families
    * (seed-namespaced) independently. */
  val embedMm = Q("embed_mm",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("caption", concat(lit("caption of "), col("text")))
      Embed.embedMultimodalBatch(docs, "text", "caption")
        .select(col("doc_id"),
          size(col("text_vec")).as("text_dim"),
          size(col("image_vec")).as("image_dim"),
          aggregate(transform(col("text_vec"),
            x => floor(x * 1e6 + lit(0.5))), lit(0L), (a, x) => a + x)
            .as("text_checksum_micro"),
          aggregate(transform(col("image_vec"),
            x => floor(x * 1e6 + lit(0.5))), lit(0L), (a, x) => a + x)
            .as("image_checksum_micro"))
        .orderBy("doc_id")
    },
    Some("\n      WITH " +
      vecCtes("t_", 512, "text|", "text") + "," +
      vecCtes("i_", 512, "image|", "'caption of ' || text") + """
      SELECT t.doc_id,
             len(t.embedding)::INT AS text_dim,
             len(i.embedding)::INT AS image_dim,
             CAST(list_sum(list_transform(t.embedding,
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))) AS BIGINT)
               AS text_checksum_micro,
             CAST(list_sum(list_transform(i.embedding,
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))) AS BIGINT)
               AS image_checksum_micro
      FROM t_emb t JOIN i_emb i ON i.doc_id = t.doc_id
      ORDER BY t.doc_id"""))

  /** O11 with REAL decode (r6): image embedding whose features come from
    * ACTUALLY-DECODED pixels — the full reference pipeline shape
    * (`embedder.py:271-277` decode → embed) with only the model itself a
    * stand-in (no ONNX runtime in the sandbox). Each doc's genuine PNG is
    * decoded through javax.imageio; the embedding is the normalized
    * color-distribution vector in exact integer micro-units: per-channel
    * mean (Σc · 1e6 DIV (w·h·255)) plus an aspect component — a real
    * (if tiny) image representation, and the oracle replays it from the
    * pixel formula, so agreement gates decode AND embed. Narrow
    * mapPartitions + in-row arithmetic; no shuffle. */
  val embedImage = Q("embed_image",
    (s, dir) => {
      import graft.operators.Multimodal
      val png = Multimodal.attachPng(Tables.load(s, dir, "documents"))
      Multimodal.decodeFeaturesBatch(png, "doc_id", "content")
        .select(col("doc_id"),
          col("features").getItem(0).cast("long").as("__w"),
          col("features").getItem(1).cast("long").as("__h"),
          col("features").getItem(2).cast("long").as("__rs"),
          col("features").getItem(3).cast("long").as("__gs"),
          col("features").getItem(4).cast("long").as("__bs"))
        .select(col("doc_id"),
          expr("__rs * 1000000 DIV (__w * __h * 255)").as("e_r"),
          expr("__gs * 1000000 DIV (__w * __h * 255)").as("e_g"),
          expr("__bs * 1000000 DIV (__w * __h * 255)").as("e_b"),
          expr("__w * 1000000 DIV (__w + __h)").as("e_aspect"))
        .orderBy("doc_id")
    },
    Some("""
      WITH dims AS (
        SELECT doc_id, n_chars % 13 + 4 AS w, (n_chars * 7) % 11 + 4 AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims),
      ch AS (
        SELECT doc_id, w, h,
               (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 AS r,
               (doc_id * 17 + (i % w) * 3 + (i // w) * 5) % 256 AS g,
               (doc_id * 11 + (i % w) * 2 + (i // w) * 19) % 256 AS b
        FROM px),
      agg AS (
        SELECT doc_id, w, h,
               CAST(SUM(r) AS BIGINT) AS rs, CAST(SUM(g) AS BIGINT) AS gs,
               CAST(SUM(b) AS BIGINT) AS bs
        FROM ch GROUP BY doc_id, w, h)
      SELECT doc_id,
             rs * 1000000 // (w * h * 255) AS e_r,
             gs * 1000000 // (w * h * 255) AS e_g,
             bs * 1000000 // (w * h * 255) AS e_b,
             w * 1000000 // (w + h) AS e_aspect
      FROM agg ORDER BY doc_id"""))

  def queries: Seq[Q] = Seq(embedText, embedChecksum, embedMm, embedImage)
}
