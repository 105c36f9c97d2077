package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns.
  *
  * The reference pins cosine as the collection metric
  * (`bob_vector_db/qdrant_embedder.py:98,101`); L2 and dot are the Chroma /
  * fastembed variants (SURVEY.md §2.2 V1/V4).
  *
  * Two interchangeable engines, bit-identical results:
  *  - **native** (the default): fused codegen Catalyst expressions
  *    (VectorExpressions.scala) — one primitive Java loop per row pair,
  *    float arrays read in place, no intermediate array, no boxing. The
  *    100 TB path (SURVEY.md §4).
  *  - **HOF** (`hofDot`/`hofCosine`/`hofL2`): `zip_with` + `aggregate`
  *    built-ins — kept as the independent reference implementation; the
  *    test suite asserts bit-equality between the two.
  *
  * All math is double: float inputs are widened exactly per element (same
  * IEEE value as a prior `cast(array<double>)`), summation is index-order
  * sequential in both engines, so DuckDB-oracle parity arguments carry
  * over unchanged.
  */
object VectorOps {

  private def native2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                          org.apache.spark.sql.catalyst.expressions.Expression)
                        => org.apache.spark.sql.catalyst.expressions.Expression)
                     (a: Column, b: Column): Column =
    GraftSqlBridge.column(f(GraftSqlBridge.expression(a),
                            GraftSqlBridge.expression(b)))

  /** Exact widening cast `ARRAY<FLOAT>` → `ARRAY<DOUBLE>`. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ — fused native expression, index-order accumulation. */
  def dot(a: Column, b: Column): Column = native2(DotProductExpr.apply)(a, b)

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column = dot(a, a)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** cosine(a,b) = dot/(‖a‖‖b‖) — the reference's collection metric.
    * Single fused pass (three accumulators). */
  def cosine(a: Column, b: Column): Column = native2(CosineSimExpr.apply)(a, b)

  /** Euclidean distance (Chroma's default space). */
  def l2(a: Column, b: Column): Column = native2(L2DistExpr.apply)(a, b)

  /** Manhattan (L1) distance — Qdrant's `Distance.MANHATTAN`. */
  def l1(a: Column, b: Column): Column = native2(L1DistExpr.apply)(a, b)

  // ---- HOF reference implementations (bit-identical, interpreted) ----

  /** `aggregate(zip_with(...))` form of [[dot]] — reference engine. */
  def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** HOF form of [[cosine]]. */
  def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))

  /** HOF form of [[l2]]. */
  def hofL2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** HOF form of [[l1]]. */
  def hofL1(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => abs(x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** v / s — scale a vector by a scalar column. Combine with [[norm]]
    * computed ONCE in a prior `withColumn` to L2-normalize: pre-normalizing
    * at ingest lets kNN use a plain dot product (one multiply-add per
    * element instead of three reductions per comparison — the 100 TB path;
    * see Knn.scala). */
  def scale(v: Column, s: Column): Column =
    transform(asDouble(v), x => x / s)

  /** Dimension check — the engine-level enforcement of the collection's
    * fixed vector size (`qdrant_embedder.py:94-102`). */
  def hasDim(v: Column, dim: Int): Column = size(v) === dim

  /** Scalar quantization (the public Qdrant int8 scheme): per-vector
    * min-max affine map to [0, 255] — `code_i = floor((x_i - min) /
    * (max - min) * 255 + 0.5)`, constant vectors map to all-zero codes.
    * 4× memory reduction at 100 TB with the codes scoring via the same
    * affine inverse ([[sqDequantize]]); exact integer codes from IEEE
    * double ops, so the DuckDB oracle replays them bit-for-bit. All
    * in-row HOFs — narrow, codegen-friendly, no shuffle. */
  def sqQuantize(v: Column): Column = {
    val d = asDouble(v)
    val mn = array_min(d); val mx = array_max(d)
    when(mx === mn, transform(d, _ => lit(0)))
      .otherwise(transform(d,
        x => floor((x - mn) / (mx - mn) * 255 + lit(0.5)).cast("int")))
  }

  /** Per-vector quantization range (min, max) — stored beside the codes
    * (the Qdrant quantile-less form). */
  def sqRange(v: Column): Column = {
    val d = asDouble(v)
    struct(array_min(d).as("mn"), array_max(d).as("mx"))
  }

  /** Inverse of [[sqQuantize]]: code → min + code/255 · (max−min). */
  def sqDequantize(codes: Column, range: Column): Column =
    transform(codes, c =>
      range.getField("mn") +
        c.cast("double") / 255 *
          (range.getField("mx") - range.getField("mn")))

  /** Fused one-pass form of `struct(sqRange, sqQuantize, Σcodes)` —
    * struct(mn, mx, codes, code_sum). The HOF composition re-scans the
    * array per element (`array_min`/`array_max` inside the transform
    * lambda → O(d²) per row); this is the declared-query path, the HOF
    * forms remain the bit-equality twins. */
  def sqCodes(v: Column): Column =
    GraftSqlBridge.column(SqCodesExpr(GraftSqlBridge.expression(v)))

  /** Fused quantized-cosine prefilter:
    * `cosine(sqDequantize(sqQuantize(v), sqRange(v)), q)` in one pass. */
  def sqScore(v: Column, q: Seq[Double]): Column =
    GraftSqlBridge.column(SqScoreExpr(GraftSqlBridge.expression(v), q))

  /** [[sqScore]] from MATERIALIZED codes + range — bit-identical to
    * scoring the full vector, but the supplying scan reads only the
    * int8 codes sidecar ([[graft.sources.QuantIndex]]), never the
    * embedding column: the 4× stage-IO reduction quantized serving
    * exists for. */
  def sqScoreFromCodes(codes: Column, mn: Column, mx: Column,
                       q: Seq[Double]): Column =
    GraftSqlBridge.column(SqCodesScoreExpr(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(mn),
      GraftSqlBridge.expression(mx), q))

  /** Binary quantization (the public Qdrant 1-bit scheme): the sign bit
    * of each element (`x > 0`), packed 32 per BIGINT word — 32× memory
    * reduction; at 100 TB the packed collection is the only thing a BQ
    * prefilter ever scans. Packing is a weighted sum of indicator bits
    * with power-of-two weights (distinct powers ≤ 2³² sum exactly in a
    * double in ANY order), so the integer words are engine-independent
    * and the DuckDB oracle replays them bit-for-bit. */
  def bqPack(v: Column, dim: Int, wordBits: Int = 32): Column = {
    val words = (dim + wordBits - 1) / wordBits
    val d = asDouble(v)
    val powers = typedLit((0 until wordBits).map(j => math.pow(2.0, j)))
    transform(sequence(lit(0), lit(words - 1)), w =>
      aggregate(
        // a short final word zip-pads x with null → condition false → 0
        zip_with(slice(d, w * wordBits + 1, lit(wordBits)), powers,
          (x, p) => when(x > 0, p).otherwise(lit(0.0))),
        lit(0.0), (acc, x) => acc + x).cast("long"))
  }

  /** Hamming distance between two packed bit arrays ([[bqPack]]):
    * Σ popcount(aᵢ xor bᵢ). BQ similarity = dim − hamming. */
  def bqHamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)
}
