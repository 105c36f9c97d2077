package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column operators — the engine's model of
  * the reference's image path (O3/O7/O11: `sensor_msgs/Image` → cv2 → PIL →
  * CLIP embed, `bob_vector_db/embedder.py:269-277`,
  * `qdrant_embedder.py:81-90`).
  *
  * Model: media is an opaque `BINARY` column plus a typed metadata struct
  * (width/height/format/n_frames), exactly what `spark.read.format
  * ("binaryFile")` + a sidecar table produces at scale. Decode/feature
  * extraction is a per-row/per-batch function over the bytes. As of r6
  * the decode kernel is REAL: [[decodeFeaturesBatch]] and [[resizePixels]]
  * route image payloads (PNG/JPEG/GIF by magic bytes) through
  * `javax.imageio` ([[ImageCodec]]) and derive features from actually
  * decoded pixels; the deterministic byte-statistics STUB survives only
  * as the fallback for non-image payloads. The fixture tables carry no
  * media, so [[attachPng]] synthesizes a real PNG per document from a
  * closed-form pixel formula the oracle can replay (PNG is lossless).
  *
  * Scale notes: all ops are narrow per-row transforms (no shuffle);
  * binary payloads stream through the scan without being collected;
  * frame sampling explodes bounded sequences (n_frames/stride rows per
  * doc).
  */
object Multimodal {

  /** Attach a synthetic binary payload + media metadata to the documents
    * fixture: bytes = utf8(text) (a deterministic stand-in for file
    * content), dims derived from n_chars. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs
      .withColumn("content", col("text").cast("binary"))
      .withColumn("media_meta", struct(
        (col("n_chars") % 613 + 16).cast("long").as("width"),
        ((col("n_chars") * 7) % 389 + 16).cast("long").as("height"),
        lit("png").as("format"),
        expr("CAST(n_chars DIV 10 + 1 AS BIGINT)").as("n_frames")))

  /** Attach a REAL synthetic PNG per document: a small w×h RGB image
    * (dims a bounded function of n_chars — ≤ 16×14, so encode cost per
    * row is constant) whose pixels follow [[ImageCodec]]'s closed-form
    * formula, compressed through the JVM's real PNG writer. The resulting
    * `content` column is genuine compressed image data — decoding it is
    * the O7 gate, not a byte-statistics replay. Narrow mapPartitions:
    * no shuffle, binary payloads stream through the scan. */
  def attachPng(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    // the codec work below is CPU-heavy per row (PNG deflate) — a
    // single-split scan would run it on one core (the txt_decontam /
    // embed-boundary rationale; Par.spread is a plan-time no-op when
    // parallelism already exists)
    val input = Par.spread(docs.select(col("doc_id"),
      col("n_chars").cast("long")))
    val outSchema = StructType(Seq(
      input.schema.fields(0),
      StructField("content", BinaryType, nullable = true)))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val w = (n % 13 + 4).toInt
        val h = ((n * 7) % 11 + 4).toInt
        org.apache.spark.sql.Row(id, ImageCodec.encodePng(id, w, h))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Audio sibling of [[attachPng]]: a REAL RIFF/WAVE payload per document
    * (PCM 16-bit mono, ≤ 112 samples — closed-form samples the oracle
    * replays; see [[AudioCodec]]). Narrow mapPartitions, codec spread. */
  def attachWav(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    val input = Par.spread(docs.select(col("doc_id"),
      col("n_chars").cast("long")))
    val outSchema = StructType(Seq(
      input.schema.fields(0),
      StructField("content", BinaryType, nullable = true)))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (r.getLong(1) % 97 + 16).toInt
        org.apache.spark.sql.Row(id, AudioCodec.encodeWav(id, n))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Real audio decode: parse the WAV column with javax.sound, emit
    * (id, frames, channels, rate_milli, sample_sum) from the actually-
    * decoded stream; corrupt / non-WAV payloads are dropped (the
    * [[resizePixels]] containment contract). */
  def audioStatsBatch(df: DataFrame, idCol: String, binCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val input = df.select(col(idCol), col(binCol))
    val outSchema = StructType(
      input.schema.fields(0) +:
        Seq("frames", "channels", "rate_milli", "sample_sum")
          .map(StructField(_, LongType, nullable = false)))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes =
          if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val s = AudioCodec.parseWavStatsOrNull(bytes)
        if (s == null) None
        else Some(org.apache.spark.sql.Row(r.get(0), s(0), s(1), s(2), s(3)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** STUB decode: byte-level statistics of the binary content via its hex
    * rendering (length, header, byte-value sum) — deterministic and
    * SQL-expressible, so the oracle can replay it. Stands in for "decode
    * image, compute channel stats". */
  def byteLen(bin: Column): Column = length(bin).cast("long")

  def headerHex(bin: Column, nBytes: Int): Column =
    upper(substring(hex(bin), 1, nBytes * 2))

  /** Sum of unsigned byte values of the binary content — one fused
    * compiled loop (ByteSumExpr); identical to summing the hex-pair
    * rendering per byte (a hex pair IS the byte). */
  def byteSum(bin: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.ByteSumExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(bin)))

  /** Interpreted hex-parse twin of [[byteSum]] (value-identical,
    * spec-asserted; pass a PRE-MATERIALIZED `hex(bin)` column —
    * recomputing the hex inside the per-element lambda would be O(n²)).
    * ~40× slower than the fused loop. */
  def byteSumHof(hexStr: Column): Column =
    aggregate(
      transform(sequence(lit(1L), (length(hexStr) / 2).cast("long")),
        i => conv(hexStr.substr((i * 2 - 1).cast("int"), lit(2)), 16, 10)
          .cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Frame sampling: one output row per sampled frame index
    * (0, stride, 2·stride, … < n_frames) with a per-frame content hash —
    * the video-keyframe-extraction shape. */
  def frameSample(df: DataFrame, idCol: String, nFramesCol: Column,
                  stride: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0L), nFramesCol - 1, lit(stride.toLong))))
      .withColumn("frame_hash",
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col("frame_idx").cast("string"))), 1, 8), 16, 10).cast("long"))

  /** Aspect-preserving resize planning (integer micro-unit math): scale =
    * min(target/w, target/h, 1) — never upscale. */
  def resizePlan(df: DataFrame, target: Int): DataFrame =
    df.withColumn("scale_micro",
        least(expr(s"${target}000000 DIV media_meta.width"),
          expr(s"${target}000000 DIV media_meta.height"),
          lit(1000000L)))
      .withColumn("new_w", expr("media_meta.width * scale_micro DIV 1000000"))
      .withColumn("new_h", expr("media_meta.height * scale_micro DIV 1000000"))

  /** Perceptual hash (aHash — average hash, the classic pHash-family
    * image fingerprint) over the binary payload, emitted as `bands`
    * 16-bit band values rather than one 64-bit word (the top block's bit
    * would need the sign bit; bands are also exactly what the dedup join
    * keys on, Manku-style). Block `b` of `blocks` covers bytes
    * [len·b/blocks, len·(b+1)/blocks); its bit is set iff the block's
    * byte mean exceeds the whole payload's mean — compared
    * cross-multiplied in exact integer arithmetic (blocksum·len >
    * total·blocklen), so the oracle replays bit-for-bit. With a real
    * codec the input would be decoded grayscale pixels; the byte-level
    * stand-in exercises the identical plan shape (one narrow fused-kernel
    * pass, no shuffle). */
  def aHashBands(bin: Column, blocks: Int = 64, bands: Int = 4): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.AHashBandsExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(bin), blocks, bands))

  /** Composed-Column twin of [[aHashBands]] (64 substring/byteSum nodes —
    * the independent reference implementation; OperatorSpec asserts
    * bit-equality with the fused kernel, which replaced it after the
    * ~2000-node projection measured as the mm_phash_dedup hotspot). */
  def aHashBandsComposed(bin: Column, blocks: Int = 64,
                         bands: Int = 4): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column => C, expression => E}
    import org.apache.spark.sql.catalyst.expressions.Substring
    val len = length(bin).cast("long")
    // block boundary: len·b/blocks — double divide of exact ints < 2^53,
    // truncating cast == the oracle's integer //
    def bound(b: Int): Column = (len * lit(b.toLong) / lit(blocks.toLong))
      .cast("long")
    val bsums = (0 until blocks).map { b =>
      val s = bound(b)
      val n = bound(b + 1) - bound(b)
      byteSum(C(Substring(E(bin), E((s + 1).cast("int")), E(n.cast("int")))))
    }
    val total = byteSum(bin) // == Σ block sums: the blocks partition bin
    val perBand = blocks / bands
    array((0 until bands).map { k =>
      (0 until perBand).map { j =>
        val b = k * perBand + j
        val blen = bound(b + 1) - bound(b)
        when(bsums(b) * len > total * blen, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Typed per-partition batch decode — the Scala analog of a pandas-batch
    * UDF: each partition's rows are processed as one iterator (codec init
    * happens once per partition, then decode per row). Returns (id,
    * feature vector). Image payloads (magic-byte sniff) go through the
    * REAL `javax.imageio` decoder → features are [width, height, ΣR, ΣG,
    * ΣB] of the actually-decoded pixels; anything else falls back to the
    * deterministic byte-statistics STUB [len, first, sum, mean, 0]. Both
    * paths emit the SAME arity (5) plus a `modality` tag ("image" vs
    * "bytes") — a mixed or partially-corrupt corpus must not yield
    * ragged arrays where getItem(4) silently nulls on fallback rows, and
    * consumers split decoded from stub rows by tag, not array shape. */
  def decodeFeaturesBatch(df: DataFrame, idCol: String, binCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
    val input = df.select(col(idCol), col(binCol))
    // id keeps its own type (string-id collections work — no long cast)
    val outSchema = StructType(Seq(
      input.schema.fields(0),
      StructField("features", ArrayType(DoubleType), nullable = true),
      StructField("modality",
        org.apache.spark.sql.types.StringType, nullable = false)))
    input.mapPartitions { rows =>
      // per-partition init happens HERE once (codec/model handle)
      def byteStub(bytes: Array[Byte]): Array[Double] = {
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        Array(
          bytes.length.toDouble,
          if (bytes.nonEmpty) (bytes(0) & 0xff).toDouble else 0.0,
          sum.toDouble,
          if (bytes.nonEmpty) sum.toDouble / bytes.length else 0.0,
          0.0) // pad to the image arity — fixed-shape column
      }
      rows.map { r =>
        val bytes =
          if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (features, modality) =
          if (ImageCodec.isImage(bytes)) {
            val img = ImageCodec.decodeOrNull(bytes)
            if (img == null) (byteStub(bytes), "bytes")
            else {
              val s = ImageCodec.channelSums(img)
              (Array(img.getWidth.toDouble, img.getHeight.toDouble,
                s(0).toDouble, s(1).toDouble, s(2).toDouble), "image")
            }
          } else (byteStub(bytes), "bytes")
        org.apache.spark.sql.Row(r.get(0), features, modality)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Real pixel resize: decode the image column, plan the integer
    * aspect-preserving scale (same micro-unit math as [[resizePlan]],
    * but over the DECODED dimensions), then nearest-neighbor resample
    * and emit the resized image's channel sums. Output: (id, width,
    * height, scale_micro, new_w, new_h, r_sum, g_sum, b_sum). Narrow
    * mapPartitions — no shuffle; non-image/undecodable payloads are
    * dropped (quarantine-split upstream handles them, streaming O19). */
  def resizePixels(df: DataFrame, idCol: String, binCol: String,
                   target: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val input = df.select(col(idCol), col(binCol))
    val outSchema = StructType(
      input.schema.fields(0) +: Seq("width", "height", "scale_micro",
        "new_w", "new_h", "r_sum", "g_sum", "b_sum")
        .map(StructField(_, LongType, nullable = false)))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes =
          if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val img = if (ImageCodec.isImage(bytes)) ImageCodec.decodeOrNull(bytes)
                  else null
        if (img == null) None
        else {
          val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
          val scaleMicro =
            math.min(math.min(target * 1000000L / w, target * 1000000L / h),
              1000000L)
          val nw = w * scaleMicro / 1000000L
          val nh = h * scaleMicro / 1000000L
          // extreme aspect ratios can plan a zero-area output (never-
          // upscale scale capped by the LARGER dimension); drop them —
          // the same contract as the SQL replay, whose per-pixel unnest
          // emits no row for an empty pixel grid
          if (nw == 0 || nh == 0) None
          else {
            val s = ImageCodec.resizedChannelSums(img, nw.toInt, nh.toInt)
            Some(org.apache.spark.sql.Row(r.get(0), w, h, scaleMicro, nw, nh,
              s(0), s(1), s(2)))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
