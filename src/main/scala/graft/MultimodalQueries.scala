package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Declared multimodal queries: binary media columns + typed metadata
  * over the documents fixture (bytes = utf8(text), a deterministic
  * stand-in for binaryFile content — see Multimodal scaladoc; the decode
  * kernel is a STUB, the Spark plumbing is real). All outputs are
  * integers/strings for exact oracle hashing. */
object MultimodalQueries {

  /** Shared oracle CTE: binary payload + synthesized media metadata. */
  private val mediaSql = """
      WITH media AS (
        SELECT doc_id,
               encode(text) AS content,
               n_chars % 613 + 16 AS width,
               (n_chars * 7) % 389 + 16 AS height,
               n_chars // 10 + 1 AS n_frames
        FROM documents)"""

  /** O7-analog — stub decode: byte length, 4-byte header, byte-value sum
    * computed from the hex rendering (what channel stats would be with a
    * real codec). */
  val mmDecode = Q("mm_decode",
    (s, dir) => {
      val m = Multimodal.attachBinary(Tables.load(s, dir, "documents"))
      m.select(col("doc_id"),
          Multimodal.byteLen(col("content")).as("byte_len"),
          Multimodal.headerHex(col("content"), 4).as("header_hex"),
          Multimodal.byteSum(col("content")).as("byte_sum"))
        .orderBy("doc_id")
    },
    Some(mediaSql + """
      SELECT doc_id,
             octet_length(content) AS byte_len,
             substr(upper(hex(content)), 1, 8) AS header_hex,
             list_sum(list_transform(range(octet_length(content)),
               i -> ('0x' || substr(upper(hex(content)),
                       CAST(2*i + 1 AS INT), 2))::BIGINT))::BIGINT AS byte_sum
      FROM media ORDER BY doc_id"""))

  /** Aspect-preserving resize planning (never upscale) in integer
    * micro-unit math. */
  val mmResize = Q("mm_resize",
    (s, dir) =>
      Multimodal.resizePlan(
          Multimodal.attachBinary(Tables.load(s, dir, "documents")), 128)
        .select(col("doc_id"),
          expr("media_meta.width").as("width"),
          expr("media_meta.height").as("height"),
          col("scale_micro"), col("new_w"), col("new_h"))
        .orderBy("doc_id"),
    Some(mediaSql + """
      SELECT doc_id, width, height,
             least(128000000 // width, 128000000 // height, 1000000)
               AS scale_micro,
             width * least(128000000 // width, 128000000 // height, 1000000)
               // 1000000 AS new_w,
             height * least(128000000 // width, 128000000 // height, 1000000)
               // 1000000 AS new_h
      FROM media ORDER BY doc_id"""))

  /** Video-frame sampling: every 7th frame index, per-frame content hash
    * (bounded explode — the keyframe-extraction shape). */
  val mmFrames = Q("mm_frames",
    (s, dir) =>
      Multimodal.frameSample(
          Multimodal.attachBinary(Tables.load(s, dir, "documents")),
          "doc_id", expr("media_meta.n_frames"), stride = 7)
        .select("doc_id", "frame_idx", "frame_hash")
        .orderBy("doc_id", "frame_idx"),
    Some(mediaSql + """
      SELECT doc_id, frame_idx,
             ('0x' || substr(md5(doc_id::VARCHAR || ':' || frame_idx::VARCHAR),
                             1, 8))::BIGINT AS frame_hash
      FROM (SELECT doc_id, unnest(range(0, n_frames, 7)) AS frame_idx
            FROM media)
      ORDER BY doc_id, frame_idx"""))

  def queries: Seq[Q] = Seq(mmDecode, mmResize, mmFrames)
}
