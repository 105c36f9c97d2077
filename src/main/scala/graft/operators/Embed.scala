package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, model-pluggable text vectorizer — the engine's stand-in
  * for the reference's fastembed models (O9/O10/O11, SURVEY.md §7 step 3):
  * no ONNX runtime exists offline, so embedding is a seeded feature-hash
  * pipeline with the same SHAPE as the real thing — a model-name → dim
  * registry mirroring `_get_model_description(model)["dim"]`
  * (`bob_vector_db/qdrant_embedder.py:78,89`), `ARRAY<DOUBLE>` output,
  * L2-normalized like fastembed's cosine-ready vectors. A real model slots
  * in by implementing the [[Embedder]] trait (batch inference over
  * `mapPartitions`, model loaded once per partition — see
  * [[EmbedderOps.embedTextBatch]]); [[FeatureHashEmbedder]] is the
  * deterministic default, bit-identical to the SQL-expression pipeline
  * here, and every downstream operator (kNN, dedup, fusion) is
  * embedding-agnostic.
  *
  * Algorithm (cross-engine reproducible, md5-based so DuckDB can recompute
  * it): tokenize on whitespace; each token hashes to a bucket
  * (md5 hex[0:8] mod dim) with a sign (md5 hex[8] parity); bucket sums are
  * exact integers; the dense vector is L2-normalized.
  *
  * Scale shape: explode → per-(id,bucket) partial-aggregated sum →
  * per-id dense array. Two hash aggregations with map-side combine — the
  * canonical distributed TF pattern; no driver work, no skew (buckets are
  * uniform by construction).
  */
object Embed {

  /** name → dim registry (reference defaults: MiniLM 384, CLIP 512). */
  val models: Map[String, Int] = Map(
    "sentence-transformers/all-MiniLM-L6-v2" -> 384,
    "Qdrant/clip-ViT-B-32-text" -> 512,
    "Qdrant/clip-ViT-B-32-vision" -> 512,
    "graft/hash-64" -> 64)

  val defaultTextModel = "sentence-transformers/all-MiniLM-L6-v2"
  val multimodalPair = "Qdrant/clip-ViT-B-32-text Qdrant/clip-ViT-B-32-vision"

  def dimOf(model: String): Int = models(model)

  /** Feature-hash bucket of a token: first 8 md5 hex digits mod dim. */
  def bucket(tok: Column, dim: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % dim

  /** ±1 sign from the 9th md5 hex digit's parity. */
  def sign(tok: Column): Column =
    when(conv(substring(md5(tok), 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
      .otherwise(-1L)

  /** Embed `textCol` of `df` into an L2-normalized dense `ARRAY<DOUBLE>`
    * named `outCol`; all other columns pass through via the `idCol` join
    * key. A `seed` namespaces the hash family (distinct pseudo-models —
    * e.g. the CLIP text vs vision halves of a named-vector pair). */
  def embedText(df: DataFrame, idCol: String, textCol: String,
                outCol: String = "embedding",
                model: String = defaultTextModel,
                seed: String = ""): DataFrame = {
    val dim = dimOf(model)
    // spread: the md5 bucket/sign hashing runs in this projection — a
    // single-split local scan would hash the whole corpus on one core
    // (no-op on a real cluster; see Par.spread)
    // ONE md5 per token (r16): bucket and sign are both substrings of the
    // same digest — the previous bucket(...)/sign(...) pair evaluated two
    // full md5 calls per token (bit-identical digests, so results are
    // unchanged; guide §1.2 per-task work)
    val toks = Par.spread(df)
      .select(col(idCol),
        explode(filter(split(lower(col(textCol)), "\\s+"),
          t => t =!= "")).as("__tok"))
      .select(col(idCol),
        md5(concat(lit(seed), col("__tok"))).as("__md5"))
      .select(col(idCol),
        (conv(substring(col("__md5"), 1, 8), 16, 10).cast("long") % dim)
          .as("__bucket"),
        when(conv(substring(col("__md5"), 9, 1), 16, 10)
          .cast("long") % 2 === 0, 1L).otherwise(-1L).as("__sgn"))
    val sums = toks.groupBy(idCol, "__bucket")
      .agg(sum("__sgn").as("__v"))
    val vecs = sums.groupBy(idCol)
      .agg(map_from_entries(collect_list(struct(col("__bucket"), col("__v"))))
        .as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i.cast("long")), lit(0L))
            .cast("double")).as("__raw"))
      .withColumn("__norm",
        sqrt(aggregate(col("__raw"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col(idCol),
        when(col("__norm") === 0.0, col("__raw"))
          .otherwise(transform(col("__raw"),
            // floor(x*1e6+0.5)/1e6, not round(x,6): the floor form is
            // bit-reproducible across engines (see EmbedQueries scaladoc).
            x => floor(x / col("__norm") * 1e6 + lit(0.5)).cast("double") / 1e6))
          .as(outCol))
    df.join(vecs, Seq(idCol), "left")
  }

  /** Named-vector pair (the reference's multimodal collection shape:
    * `{"text", "image"}` named vectors from the CLIP text+vision pair,
    * `qdrant_embedder.py:71-90`): two vector columns produced by the two
    * halves of `modelPair`, hash families namespaced by seed so the
    * "models" are genuinely different functions. `textCol` feeds the text
    * vector; `captionCol` (the image's caption/description stand-in —
    * a real vision model would read the binary content instead) feeds the
    * image vector. */
  def embedMultimodal(df: DataFrame, idCol: String, textCol: String,
                      captionCol: String,
                      modelPair: String = multimodalPair): DataFrame = {
    val Array(textModel, visionModel) = modelPair.split(" ")
    val withText = embedText(df, idCol, textCol,
      outCol = "text_vec", model = textModel, seed = "text|")
    embedText(withText, idCol, captionCol,
      outCol = "image_vec", model = visionModel, seed = "image|")
  }

  /** [[embedText]] through the batch-inference boundary ([[Embedder]] +
    * mapPartitions): the production path a real ONNX model plugs into.
    * With the default [[FeatureHashEmbedder]] the output is bit-identical
    * to the expression pipeline (asserted in OperatorSpec). No id column
    * is involved — rows carry through in place (each ROW is embedded;
    * the expression twin's per-id token merge coincides when ids are
    * unique). */
  def embedTextBatch(df: DataFrame, textCol: String,
                     outCol: String = "embedding",
                     model: String = defaultTextModel,
                     seed: String = ""): DataFrame =
    EmbedderOps.embedTextBatch(df, textCol, outCol,
      new FeatureHashEmbedder(model, seed))

  /** [[embedMultimodal]] through the batch-inference boundary — both
    * named vectors in ONE mapPartitions pass (chaining two passes would
    * re-encode the first 512-dim vector through the Row codec per row). */
  def embedMultimodalBatch(df: DataFrame, textCol: String,
                           captionCol: String,
                           modelPair: String = multimodalPair): DataFrame = {
    val Array(textModel, visionModel) = modelPair.split(" ")
    EmbedderOps.embedBatchMulti(df, Seq(
      (textCol, "text_vec", new FeatureHashEmbedder(textModel, "text|")),
      (captionCol, "image_vec", new FeatureHashEmbedder(visionModel, "image|"))))
  }
}
