package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embed-message ingestion: parse → 3-way normalize → explode to points.
  *
  * Implements the reference's native operators (SURVEY.md §2.1):
  *  - O5 JSON parse + field-presence routing (`embedder.py:234-267`)
  *  - O6 raw→canonical normalization, three branches (`embedder.py:239-267`)
  *  - O13 id generation (`qdrant_embedder.py:115-117`) — deterministic
  *    sha256 variant of the reference's uuid4 so results are testable
  *  - O14 point explosion with "metadatas drives the row count"
  *    (`qdrant_embedder.py:141`): extra documents are truncated, missing
  *    ones surface as NULL
  *  - O16 payload enrichment with no-overwrite semantics
  *    (`qdrant_embedder.py:119-128`)
  *
  * Everything is column expressions — the whole pipeline stays inside
  * whole-stage codegen and scales linearly with input splits; there is no
  * per-message driver work and no shuffle until the optional upsert.
  */
object Ingest {

  /** Canonical embed-message schema (`README.md:39-58`). Payload objects are
    * modeled as MAP<STRING,STRING>: scalar values arrive as their string
    * rendering, nested objects as their JSON text (SURVEY.md §1.4). */
  val messageSchema: StructType = StructType(Seq(
    StructField("collection", StringType),
    StructField("documents", ArrayType(StringType)),
    StructField("metadatas", ArrayType(MapType(StringType, StringType))),
    StructField("ids", ArrayType(StringType)),
    StructField("images", ArrayType(StringType))))

  /** O5+O6: raw string column → canonical message struct columns.
    * Branch order mirrors `embed_raw_callback`:
    *   full message (collection+documents+metadatas all present) → as-is;
    *   JSON object → default collection, documents from `documents` else
    *     `[data]` else `[raw text]`, whole object becomes the one metadata;
    *   anything else (non-JSON, JSON scalar/array) → raw wrap.
    * The reference re-serializes the dict (`json.dumps(data)`) for the
    * document fallback; we keep the raw input text — same information,
    * no engine-specific JSON formatting. */
  def normalize(raw: DataFrame, rawCol: String,
                defaultCollection: String = "embed_raw"): DataFrame = {
    val parsed = from_json(col(rawCol), messageSchema)
    val asMap = from_json(col(rawCol), MapType(StringType, StringType))
    val isObject = asMap.isNotNull
    val isFull = isObject && parsed.getField("collection").isNotNull &&
      parsed.getField("documents").isNotNull &&
      parsed.getField("metadatas").isNotNull

    raw
      .withColumn("collection",
        when(isFull, parsed.getField("collection"))
          .otherwise(lit(defaultCollection)))
      .withColumn("documents",
        when(isFull, parsed.getField("documents"))
          .when(isObject,
            coalesce(parsed.getField("documents"),
              array(coalesce(element_at(asMap, "data"), trim(col(rawCol))))))
          .otherwise(array(col(rawCol))))
      .withColumn("metadatas",
        when(isFull, parsed.getField("metadatas"))
          .when(isObject, array(asMap))
          .otherwise(array(map(lit("data"), col(rawCol)))))
      .withColumn("ids",
        when(isFull || isObject, parsed.getField("ids"))
          .otherwise(lit(null).cast(ArrayType(StringType))))
      .withColumn("images",
        when(isFull, parsed.getField("images"))
          .otherwise(lit(null).cast(ArrayType(StringType))))
  }

  /** O13: user id if present, else a deterministic content hash (stands in
    * for the reference's uuid4 — same uniqueness contract, oracle-testable;
    * SURVEY.md §7 nondeterminism risk). */
  def makeId(collection: Column, document: Column, idx: Column,
             userIds: Column): Column =
    coalesce(try_element_at(userIds, idx + 1),
      sha2(concat_ws("|", collection, coalesce(document, lit("")),
        idx.cast("string")), 256))

  /** O14: one row per metadata element — `metadatas` is the row-count
    * authority. Produces (keep..., collection, idx, document, payload,
    * image, id). `try_element_at` (not `element_at`): under ANSI mode the
    * doc-underrun case (more metadatas than documents,
    * `qdrant_embedder.py:141`) must surface as a NULL document, not an
    * INVALID_ARRAY_INDEX error. */
  def toPoints(messages: DataFrame, keep: Seq[String] = Seq()): DataFrame =
    messages
      .select(keep.map(col) ++ Seq(col("collection"), col("documents"),
        col("ids"), col("images"),
        posexplode(col("metadatas")).as(Seq("idx", "payload"))): _*)
      .withColumn("document", try_element_at(col("documents"), col("idx") + 1))
      .withColumn("image", try_element_at(col("images"), col("idx") + 1))
      .withColumn("id",
        makeId(col("collection"), col("document"), col("idx"), col("ids")))
      .drop("documents", "ids", "images")

  /** Media side-channel override (`qdrant_embedder.py:82-86`): when an
    * in-memory media payload travels with the message, it REPLACES the
    * `images` path field for that row — the reference logs a warning and
    * embeds the media. The engine makes the override OBSERVABLE instead of
    * a log line: `media_source` says which input won ("media" | "path" |
    * null) and `image` is nulled when overridden (so no downstream op can
    * accidentally read the ignored path — exactly the reference rule).
    * `media_overridden` marks rows where both were present (the warn
    * case). */
  def resolveMedia(points: DataFrame,
                   mediaCol: String = "media"): DataFrame =
    points
      .withColumn("media_overridden",
        col(mediaCol).isNotNull && col("image").isNotNull)
      .withColumn("media_source",
        when(col(mediaCol).isNotNull, lit("media"))
          .when(col("image").isNotNull, lit("path"))
          .otherwise(lit(null).cast("string")))
      .withColumn("image",
        when(col(mediaCol).isNotNull, lit(null).cast("string"))
          .otherwise(col("image")))

  /** O16: add `image_base64` (and `image_origin` when the image came from a
    * path rather than the in-memory media side-channel) unless the payload
    * already carries the key — the reference never overwrites
    * (`qdrant_embedder.py:122`). */
  def enrichPayload(points: DataFrame, b64: Column,
                    fromPath: Boolean = true): DataFrame =
    points.withColumn("payload",
      when(element_at(col("payload"), "image_base64").isNull && b64.isNotNull,
        map_concat(col("payload"),
          if (fromPath)
            map(lit("image_base64"), b64, lit("image_origin"), col("image"))
          else map(lit("image_base64"), b64)))
        .otherwise(col("payload")))

  /** O15: standard (RFC 4648) base64 of a binary column — the reference's
    * `base64.b64encode` has no line breaks, but Spark's `base64()` emits
    * MIME-chunked output (CRLF every 76 chars); strip the chunking. */
  def toBase64(bin: Column): Column =
    regexp_replace(base64(bin), "[\\r\\n]", "")

  /** O14 upsert semantics: same id overwrites (Qdrant `upload_points`).
    * Keep-last by ingest sequence via a per-id window — at scale one
    * hash-shuffle on id, no driver involvement; AQE handles skewed ids. */
  def upsert(points: DataFrame, idCol: String, seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy(col(seqCol).desc)
    points.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
