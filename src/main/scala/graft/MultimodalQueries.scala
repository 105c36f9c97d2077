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

  /** Shared oracle CTE: the synthetic-PNG pixel formula (ImageCodec) —
    * per-doc dims + per-pixel RGB channels. The Spark side never sees
    * this formula at query time: it encodes the pixels into REAL PNG
    * bytes and must decode them back through javax.imageio to match. */
  private val pngDimsSql = """
      dims AS (
        SELECT doc_id, n_chars % 13 + 4 AS w, (n_chars * 7) % 11 + 4 AS h
        FROM documents)"""

  /** O7 — REAL image decode: each doc's closed-form pixels are compressed
    * through the JVM PNG writer, then the query decodes the compressed
    * bytes with javax.imageio and emits decoded dims + per-channel pixel
    * sums. The oracle replays the pixel formula directly — the two can
    * only agree if the engine actually decoded real PNG data (byte
    * statistics of the compressed stream cannot reproduce pixel sums).
    * Scale: narrow mapPartitions batch, codec init once per partition,
    * no shuffle. */
  val mmDecode = Q("mm_decode",
    (s, dir) => {
      val png = Multimodal.attachPng(Tables.load(s, dir, "documents"))
      Multimodal.decodeFeaturesBatch(png, "doc_id", "content")
        .select(col("doc_id"),
          col("features").getItem(0).cast("long").as("width"),
          col("features").getItem(1).cast("long").as("height"),
          col("features").getItem(2).cast("long").as("r_sum"),
          col("features").getItem(3).cast("long").as("g_sum"),
          col("features").getItem(4).cast("long").as("b_sum"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $pngDimsSql,
      px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims),
      ch AS (
        SELECT doc_id, w, h,
               (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 AS r,
               (doc_id * 17 + (i % w) * 3 + (i // w) * 5) % 256 AS g,
               (doc_id * 11 + (i % w) * 2 + (i // w) * 19) % 256 AS b
        FROM px)
      SELECT doc_id, w AS width, h AS height,
             CAST(SUM(r) AS BIGINT) AS r_sum,
             CAST(SUM(g) AS BIGINT) AS g_sum,
             CAST(SUM(b) AS BIGINT) AS b_sum
      FROM ch GROUP BY doc_id, w, h ORDER BY doc_id"""))

  /** O7 fallback — the deterministic byte-statistics stub for NON-image
    * payloads (byte length, 4-byte header, byte-value sum): the error-
    * containment path when a payload isn't decodable media. */
  val mmDecodeFallback = Q("mm_decode_fallback",
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

  /** O8-analog — REAL resize: decode the PNG, plan the integer aspect-
    * preserving scale over the DECODED dims (never upscale), nearest-
    * neighbor resample (src = x'·w DIV nw — integer index math, exactly
    * replayable; interpolating resamplers couldn't be hash-gated), emit
    * the resized image's channel sums. */
  val mmResize = Q("mm_resize",
    (s, dir) =>
      Multimodal.resizePixels(
          Multimodal.attachPng(Tables.load(s, dir, "documents")),
          "doc_id", "content", target = 8)
        .orderBy("doc_id"),
    Some(s"""
      WITH $pngDimsSql,
      sc AS (SELECT *, least(8000000 // w, 8000000 // h, 1000000)
               AS scale_micro FROM dims),
      nd AS (SELECT *, w * scale_micro // 1000000 AS new_w,
               h * scale_micro // 1000000 AS new_h FROM sc),
      px AS (SELECT doc_id, w, h, scale_micro, new_w, new_h,
               unnest(range(new_w * new_h)) AS i FROM nd),
      m AS (SELECT doc_id, w, h, scale_micro, new_w, new_h,
              ((i % new_w) * w) // new_w AS xs,
              ((i // new_w) * h) // new_h AS ys
            FROM px),
      ch AS (SELECT doc_id, w, h, scale_micro, new_w, new_h,
               (doc_id * 31 + xs * 7 + ys * 13) % 256 AS r,
               (doc_id * 17 + xs * 3 + ys * 5) % 256 AS g,
               (doc_id * 11 + xs * 2 + ys * 19) % 256 AS b
             FROM m)
      SELECT doc_id, w AS width, h AS height, scale_micro, new_w, new_h,
             CAST(SUM(r) AS BIGINT) AS r_sum,
             CAST(SUM(g) AS BIGINT) AS g_sum,
             CAST(SUM(b) AS BIGINT) AS b_sum
      FROM ch GROUP BY doc_id, w, h, scale_micro, new_w, new_h
      ORDER BY doc_id"""))

  /** O7 audio — REAL WAV decode: each doc's closed-form PCM samples are
    * wrapped in a real RIFF/WAVE container, then the query parses the
    * bytes with javax.sound and emits decoded frame/format metadata +
    * sample sums. The oracle replays the sample formula — agreement
    * requires an actual container parse (the header is 44 bytes of
    * structure the byte-stub path would misread as data). */
  val mmAudio = Q("mm_audio",
    (s, dir) =>
      Multimodal.audioStatsBatch(
          Multimodal.attachWav(Tables.load(s, dir, "documents")),
          "doc_id", "content")
        .orderBy("doc_id"),
    Some("""
      WITH n AS (SELECT doc_id, n_chars % 97 + 16 AS n FROM documents),
      px AS (SELECT doc_id, n, unnest(range(n)) AS i FROM n),
      sm AS (SELECT doc_id, n,
               (doc_id * 7 + i * 13) % 65536 - 32768 AS s
             FROM px)
      SELECT doc_id, CAST(n AS BIGINT) AS frames,
             CAST(1 AS BIGINT) AS channels,
             CAST(8000000 AS BIGINT) AS rate_milli,
             CAST(SUM(s) AS BIGINT) AS sample_sum
      FROM sm GROUP BY doc_id, n ORDER BY doc_id"""))

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

  /** Perceptual-hash near-dup detection over the binary media column —
    * the image-dedup pass of a multimodal training pipeline (aHash +
    * banded hamming join; with a real codec only the hash input changes
    * from bytes to pixels). Same scale shape as dedup_simhash: one
    * narrow hashing pass, candidates via equi-join on a 16-bit band
    * match (never all-pairs), exact hamming verify on candidates only.
    * Plants exact binary copies (doc_id+100000) and same-length edits
    * ('zz' over the first two bytes, doc_id+200000): copies land at
    * hamming 0, edits ≤ 6 (only block 0 and mean-shift borderline blocks
    * flip), and the fixture's natural band collisions all verify > 6 —
    * measured 0 natural pairs at every SF. */
  val mmPhashDedup = Q("mm_phash_dedup",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select("doc_id", "text")
      val planted = d
        .unionAll(d.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .unionAll(d.filter(col("doc_id") % 100 === 1)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(lit("zz"), expr("substring(text, 3)")).as("text")))
        .repartition(s.sparkContext.defaultParallelism)
      val ph = planted.select(col("doc_id"),
        Multimodal.aHashBands(col("text").cast("binary")).as("bands"))
      // slim (doc_id, band, bits) rows through the explode — carrying the
      // `bands` array beside its own posexplode makes the collapsed
      // project re-run the whole 64-block hash per EXPLODED row (measured
      // 7.8 s → 0.7 s at sf0.1); the verify joins the signature back from
      // a narrow once-per-doc projection instead, candidates only
      val banded = ph.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "bits")))
      val cands = banded
        .select(col("band"), col("bits"), col("doc_id").as("doc_a"))
        .join(banded.select(col("band"), col("bits"),
          col("doc_id").as("doc_b")), Seq("band", "bits"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val hamming = (0 until 4).map(k =>
        bit_count(element_at(col("ba"), k + 1)
          .bitwiseXOR(element_at(col("bb"), k + 1)))).reduce(_ + _)
      cands
        .join(ph.select(col("doc_id").as("doc_a"), col("bands").as("ba")),
          "doc_a")
        .join(ph.select(col("doc_id").as("doc_b"), col("bands").as("bb")),
          "doc_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH docs2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 100 = 0
        UNION ALL
        SELECT doc_id + 200000, 'zz' || substr(text, 3)
        FROM documents WHERE doc_id % 100 = 1),
      m AS (
        SELECT doc_id, upper(hex(encode(text))) AS hx,
               octet_length(encode(text)) AS len
        FROM docs2),
      blocks AS (
        SELECT doc_id, b, (len*b)//64 AS s, (len*(b+1))//64 AS e, len, hx
        FROM m CROSS JOIN (SELECT unnest(range(64)) AS b) bb),
      bsum AS (
        SELECT doc_id, b, len, e - s AS blen,
               COALESCE(list_sum(list_transform(range(s, e),
                 i -> ('0x' || substr(hx, CAST(2*i+1 AS INT), 2))::BIGINT)),
                 0)::BIGINT AS bs
        FROM blocks),
      tot AS (SELECT doc_id, SUM(bs)::BIGINT AS total FROM bsum GROUP BY 1),
      phb AS (
        SELECT s.doc_id, s.b // 16 AS band,
               SUM(CASE WHEN s.bs * s.len > t.total * s.blen
                 THEN (1::BIGINT << (s.b % 16)) ELSE 0 END)::BIGINT AS bits
        FROM bsum s JOIN tot t ON t.doc_id = s.doc_id
        GROUP BY s.doc_id, s.b // 16),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM phb a JOIN phb b
          ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id),
      ham AS (
        SELECT c.doc_a, c.doc_b,
               SUM(bit_count(xor(pa.bits, pb.bits)))::BIGINT AS hamming
        FROM cand c
        JOIN phb pa ON pa.doc_id = c.doc_a
        JOIN phb pb ON pb.doc_id = c.doc_b AND pb.band = pa.band
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, hamming FROM ham
      WHERE hamming <= 6
      ORDER BY doc_a, doc_b"""))

  def queries: Seq[Q] = Seq(mmDecode, mmDecodeFallback, mmResize, mmAudio,
    mmFrames, mmPhashDedup)
}
