package graft

import org.apache.spark.sql.functions._
import graft.operators.Embed

/** Declared embedding queries. The DuckDB oracle recomputes the whole
  * feature-hash pipeline (tokenize → md5 bucket/sign → bucket sums →
  * dense → L2 normalize) independently in SQL. */
object EmbedQueries {

  /** Shared oracle CTE chain producing (doc_id, embedding DOUBLE[dim]). */
  private def oracleVecSql(dim: Int): String = s"""
      WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        FROM documents),
      h AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % $dim AS bucket,
               CASE WHEN ('0x' || substr(md5(tok), 9, 1))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM toks WHERE tok <> ''),
      bsum AS (
        SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS v
        FROM h GROUP BY doc_id, bucket),
      dense AS (
        SELECT d.doc_id, i.bucket, CAST(COALESCE(b.v, 0) AS DOUBLE) AS v
        FROM (SELECT DISTINCT doc_id FROM documents) d
        CROSS JOIN (SELECT unnest(range($dim)) AS bucket) i
        LEFT JOIN bsum b ON b.doc_id = d.doc_id AND b.bucket = i.bucket),
      vec AS (
        SELECT doc_id, list(v ORDER BY bucket) AS raw FROM dense GROUP BY doc_id),
      nrm AS (
        SELECT doc_id, raw,
               sqrt(list_inner_product(raw, raw)) AS n
        FROM vec),
      emb AS (
        SELECT doc_id,
               CASE WHEN n = 0 THEN raw
                    ELSE list_transform(raw, x -> round(x / n, 6)) END AS embedding
        FROM nrm)"""

  /** O9/O10 — embed every document; full vector output. */
  val embedText = Q("embed_text",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Embed.embedText(docs, "doc_id", "text", model = "graft/hash-64")
        .select("doc_id", "embedding")
        .orderBy("doc_id")
    },
    Some(oracleVecSql(64) +
      " SELECT doc_id, embedding FROM emb ORDER BY doc_id"))

  /** Scalar fold of the same pipeline (hedge in case array columns hash
    * differently in the driver compare): dim, unit norm, element checksum. */
  val embedChecksum = Q("embed_checksum",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Embed.embedText(docs, "doc_id", "text", model = "graft/hash-64")
        .select(col("doc_id"),
          size(col("embedding")).as("dim"),
          round(aggregate(col("embedding"), lit(0.0), (a, x) => a + x), 6)
            .as("checksum"))
        .orderBy("doc_id")
    },
    Some(oracleVecSql(64) + """
      SELECT doc_id, len(embedding)::INT AS dim,
             round(list_sum(embedding), 6) AS checksum
      FROM emb ORDER BY doc_id"""))

  def queries: Seq[Q] = Seq(embedText, embedChecksum)
}
