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

  // the per-partition "model": a digest instance plus a token memo — the
  // (bucket, sign) of a token is a pure function of (seed, token), and
  // corpus vocabularies are far smaller than token streams (Zipf), so
  // md5 runs once per DISTINCT token instead of once per occurrence.
  // Bounded: cleared when it exceeds memoLimit so an adversarial
  // vocabulary cannot grow the executor heap.
  @transient private var md: java.security.MessageDigest = _
  @transient private var memo: java.util.HashMap[String, Int] = _
  private val memoLimit = 1 << 17
  override def init(): Unit = {
    md = java.security.MessageDigest.getInstance("MD5")
    memo = new java.util.HashMap[String, Int](1 << 12)
  }

  private val seedBytes = seed.getBytes("UTF-8")
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
    texts.map(embedOne)

  /** (bucket, sign) packed as bucket | (signBit << 30) — dim is far below
    * 2^30 so the bucket field never collides with the sign bit. */
  private def bucketSign(tok: String): Int = {
    val cached = memo.get(tok)
    if (cached != 0) return cached - 1 // stored +1 so 0 means absent
    md.update(seedBytes)
    md.update(tok.getBytes("UTF-8"))
    val h = md.digest()
    // first 8 md5 hex digits == first 4 digest bytes, big-endian
    // unsigned; the 9th hex digit's parity == bit 4 of digest byte 4 —
    // byte arithmetic, no hex-string materialization (13x faster)
    val bucket = ((((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) % dim).toInt
    val packed = bucket | (if (((h(4) >> 4) & 1) == 0) 0 else 1 << 30)
    if (memo.size >= memoLimit) memo.clear()
    memo.put(tok, packed + 1)
    packed
  }

  private def embedOne(text: String): Array[Double] = {
    if (md == null) init()
    val sums = new Array[Long](dim)
    val toks = wsPattern.split(text.toLowerCase)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        val packed = bucketSign(tok)
        sums(packed & ((1 << 30) - 1)) += (if ((packed >>> 30) == 0) 1L else -1L)
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
                     batchSize: Int = 64): DataFrame =
    embedBatchMulti(df, Seq((textCol, outCol, embedder)), batchSize)

  /** N embedding columns in ONE mapPartitions pass — the multimodal
    * named-vector pair (text + vision) costs one Row-codec round trip
    * instead of two chained passes where the second re-encodes the first
    * pass's vector per row. Each spec is (source column, output column,
    * embedder); outputs are appended in spec order. */
  def embedBatchMulti(df: DataFrame,
                      specs: Seq[(String, String, Embedder)],
                      batchSize: Int = 64): DataFrame = {
    require(specs.nonEmpty, "at least one embed spec required")
    // withColumn would REPLACE an existing column in place (not append),
    // and the row-carry below drops the source fields by position — so a
    // colliding name must be an error, not silent column corruption
    val srcNames = specs.indices.map(i => s"__embed_src_$i")
    (srcNames ++ specs.map(_._2)).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a column named $c")
    }
    require(specs.map(_._2).distinct.length == specs.length,
      s"duplicate output columns in ${specs.map(_._2)}")
    val input = specs.zip(srcNames).foldLeft(df) {
      case (d, ((textCol, _, _), src)) =>
        d.withColumn(src, col(textCol).cast("string"))
    }
    val srcIdx = srcNames.map(input.schema.fieldIndex)
    val outSchema = StructType(
      df.schema.fields ++ specs.map { case (_, outCol, _) =>
        StructField(outCol, ArrayType(DoubleType), nullable = true)
      })
    val embedders = specs.map(_._3)
    val nSrc = specs.length
    // single-split small scans would run the whole inference on one core
    Par.spread(input).mapPartitions { rows =>
      embedders.foreach(_.init()) // once per partition — the model-load point
      rows.grouped(batchSize).flatMap { chunk =>
        val outs = srcIdx.zip(embedders).map { case (idx, embedder) =>
          val texts = chunk.map(r =>
            if (r.isNullAt(idx)) "" else r.getString(idx))
          val out = embedder.embedBatch(texts)
          require(out.length == chunk.length,
            s"embedder ${embedder.name} returned ${out.length} vectors " +
              s"for ${chunk.length} inputs")
          out
        }
        chunk.indices.map { j =>
          val r = chunk(j)
          Row.fromSeq(r.toSeq.dropRight(nSrc) ++ outs.map(_(j)))
        }
      }
    }(Encoders.row(outSchema))
  }
}
