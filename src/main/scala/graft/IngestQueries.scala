package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** Declared ingestion queries: golden normalization of the reference's
  * documented messages (FIXTURES.md A), upsert semantics, and base64
  * payload enrichment. The DuckDB oracle RECOMPUTES the routing with its
  * own JSON functions from the same literal inputs — it is an independent
  * implementation, not a dumped expectation. */
object IngestQueries {

  /** The golden inputs (FIXTURES.md F1/F3/F5/F6 + edge cases):
    *  1 F1 full message, 2 rows;           2 F3 full, single row;
    *  3 F5 partial dict (data key);        4 F6 non-JSON raw;
    *  5 full-but-no-collection dict edge;  6 doc-truncation (3 docs, 2 metas);
    *  7 doc-underrun (1 doc, 2 metas → NULL document);  8 JSON scalar. */
  val fixtures: Seq[(Int, String)] = Seq(
    1 -> """{"collection": "xfiles", "documents": ["some story text", "text about something strange"], "metadatas": [{"title": "The end"}, {"title": "Dark star"}], "ids": ["id1", "id2"]}""",
    2 -> """{"collection": "xfiles", "documents": ["Bobs ROS nodes are a collection of NLP and LLM tools for ROS"], "metadatas": [{"author": "bob"}], "ids": ["id1"]}""",
    3 -> """{"data": "hello world", "extra": 1}""",
    4 -> """plain text""",
    5 -> """{"data": "no collection here", "title": "solo"}""",
    6 -> """{"collection": "trunc", "documents": ["a", "b", "c"], "metadatas": [{"m": "1"}, {"m": "2"}]}""",
    7 -> """{"collection": "short", "documents": ["only"], "metadatas": [{"m": "1"}, {"m": "2"}]}""",
    8 -> """42""")

  private val fixtureValues = fixtures
    .map { case (i, s) => s"($i, '${s.replace("'", "''")}')" }
    .mkString(", ")

  /** O5/O6/O13/O14 — normalize + explode the golden messages. */
  val ingestNormalize = Q("ingest_normalize",
    (s, dir) => {
      import s.implicits._
      val raw = fixtures.toDF("msg_id", "raw")
      val canon = Ingest.normalize(raw, "raw")
      Ingest.toPoints(canon, keep = Seq("msg_id"))
        .select(col("msg_id"), col("idx"), col("collection"), col("document"),
          col("id"),
          element_at(col("payload"), "title").as("m_title"),
          element_at(col("payload"), "data").as("m_data"),
          element_at(col("payload"), "extra").as("m_extra"),
          element_at(col("payload"), "author").as("m_author"),
          element_at(col("payload"), "m").as("m_m"))
        .orderBy("msg_id", "idx")
    },
    Some(s"""
      WITH input(msg_id, raw) AS (VALUES $fixtureValues),
      cls AS (
        -- json_type(raw::JSON) must stay inside a THEN branch: DuckDB
        -- evaluates CASE *conditions* for every row, and the ::JSON cast
        -- throws on non-JSON input.
        SELECT msg_id, raw,
          CASE WHEN json_valid(raw)
               THEN json_type(raw::JSON) = 'OBJECT' ELSE FALSE END AS is_obj,
          CASE WHEN json_valid(raw)
               THEN CASE WHEN json_type(raw::JSON) = 'OBJECT'
                    THEN json_extract(raw, '$$.collection') IS NOT NULL
                     AND json_extract(raw, '$$.documents') IS NOT NULL
                     AND json_extract(raw, '$$.metadatas') IS NOT NULL
                    ELSE FALSE END
               ELSE FALSE END AS is_full
        FROM input),
      canon AS (
        SELECT msg_id, raw, is_obj, is_full,
          CASE WHEN is_full THEN json_extract_string(raw, '$$.collection')
               ELSE 'embed_raw' END AS collection,
          CASE WHEN is_full THEN json_extract(raw, '$$.documents')::VARCHAR
               WHEN is_obj THEN COALESCE(json_extract(raw, '$$.documents')::VARCHAR,
                 to_json([COALESCE(json_extract_string(raw, '$$.data'), trim(raw))]))
               ELSE to_json([raw]) END AS docs,
          CASE WHEN is_full
               THEN json_array_length(json_extract(raw, '$$.metadatas'))
               ELSE 1 END AS n_rows,
          CASE WHEN is_full OR is_obj THEN json_extract(raw, '$$.ids')::VARCHAR
               ELSE NULL END AS ids
        FROM cls),
      pts AS (
        SELECT msg_id, raw, is_obj, is_full, collection, docs, ids,
               unnest(range(CAST(n_rows AS BIGINT))) AS idx
        FROM canon),
      out AS (
        SELECT msg_id, idx, collection,
          json_extract_string(docs, '$$[' || idx || ']') AS document,
          COALESCE(json_extract_string(ids, '$$[' || idx || ']'),
            sha256(collection || '|' ||
                   COALESCE(json_extract_string(docs, '$$[' || idx || ']'), '')
                   || '|' || idx)) AS id,
          CASE WHEN is_full THEN json_extract_string(raw, '$$.metadatas[' || idx || '].title')
               WHEN is_obj THEN json_extract_string(raw, '$$.title') END AS m_title,
          CASE WHEN is_full THEN json_extract_string(raw, '$$.metadatas[' || idx || '].data')
               WHEN is_obj THEN json_extract_string(raw, '$$.data')
               ELSE raw END AS m_data,
          CASE WHEN is_full THEN json_extract_string(raw, '$$.metadatas[' || idx || '].extra')
               WHEN is_obj THEN json_extract_string(raw, '$$.extra') END AS m_extra,
          CASE WHEN is_full THEN json_extract_string(raw, '$$.metadatas[' || idx || '].author')
               WHEN is_obj THEN json_extract_string(raw, '$$.author') END AS m_author,
          CASE WHEN is_full THEN json_extract_string(raw, '$$.metadatas[' || idx || '].m')
               WHEN is_obj THEN json_extract_string(raw, '$$.m') END AS m_m
        FROM pts)
      SELECT * FROM out ORDER BY msg_id, idx
    """))

  /** O14 upsert — same-id overwrite, keep-last by ingest sequence. */
  val ingestUpsert = Q("ingest_upsert",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("text"), col("lang"),
        lit(0).as("seq"))
      val upd = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"),
          concat(lit("updated:"), col("doc_id").cast("string")).as("text"),
          col("lang"), lit(1).as("seq"))
      Ingest.upsert(base.unionAll(upd), "doc_id", "seq")
        .orderBy("doc_id")
    },
    Some("""
      WITH base AS (SELECT doc_id, text, lang, 0 AS seq FROM documents),
      upd AS (SELECT doc_id, 'updated:' || doc_id AS text, lang, 1 AS seq
              FROM documents WHERE doc_id % 50 = 0),
      u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
            FROM u)
      SELECT doc_id, text, lang, seq FROM r WHERE rn = 1 ORDER BY doc_id
    """))

  /** O15 base64 + O16 no-overwrite enrichment: even doc_ids already carry
    * `image_base64` (must be preserved); odd ones get the computed b64 and
    * the path origin. */
  val ingestBase64 = Q("ingest_base64",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("payload",
          when(col("doc_id") % 2 === 0,
            map(lit("image_base64"), lit("pre")))
            .otherwise(typedLit(Map.empty[String, String])))
        .withColumn("image", concat(lit("path:"), col("doc_id").cast("string")))
      Ingest.enrichPayload(docs, Ingest.toBase64(col("text").cast("binary")))
        .select(col("doc_id"),
          element_at(col("payload"), "image_base64").as("image_base64"),
          element_at(col("payload"), "image_origin").as("image_origin"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'pre' ELSE base64(encode(text)) END AS image_base64,
        CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 'path:' || doc_id END AS image_origin
      FROM documents ORDER BY doc_id
    """))

  def queries: Seq[Q] = Seq(ingestNormalize, ingestUpsert, ingestBase64)
}
