package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns.
  *
  * The reference pins cosine as the collection metric
  * (`bob_vector_db/qdrant_embedder.py:98,101`); L2 and dot are the Chroma /
  * fastembed variants (SURVEY.md §2.2 V1/V4). Built on Spark higher-order
  * functions (`zip_with` + `aggregate`), which stay inside whole-stage
  * codegen — no UDF, no boxing of the whole array into Scala collections.
  *
  * All math is done in DOUBLE: fixture vectors are `float`, the DuckDB
  * oracle computes in double, and float→double widening is exact, so both
  * engines see bit-identical inputs and a deterministic left-to-right
  * summation order.
  */
object VectorOps {

  /** Exact widening cast `ARRAY<FLOAT>` → `ARRAY<DOUBLE>`. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ — sequential (deterministic) per-row reduction. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column = dot(a, a)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** cosine(a,b) = dot/(‖a‖‖b‖) — the reference's collection metric. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean distance (Chroma's default space). */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** v / s — scale a vector by a scalar column. Combine with [[norm]]
    * computed ONCE in a prior `withColumn` to L2-normalize: pre-normalizing
    * at ingest lets kNN use a plain dot product (one multiply-add per
    * element instead of three reductions per comparison — the 100 TB path;
    * see Knn.scala). Deliberately not a one-arg `normalize(v)`: embedding
    * the norm aggregate inside a `transform` lambda would re-reduce the
    * array per element (O(dim²)). */
  def scale(v: Column, s: Column): Column =
    transform(asDouble(v), x => x / s)

  /** Dimension check — the engine-level enforcement of the collection's
    * fixed vector size (`qdrant_embedder.py:94-102`). */
  def hasDim(v: Column, dim: Int): Column = size(v) === dim
}
