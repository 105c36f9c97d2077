package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HDR-histogram quantile sketch — the high-dynamic-range histogram
  * construction (Gil Tene's public HdrHistogram design): bucket a
  * non-negative integer by its power-of-two magnitude plus [[SubBits]]
  * linear sub-bucket bits, count per bucket, and answer quantiles by
  * cumulative-count rank walk. Relative error ≤ 2^-[[SubBits]] (< 1%)
  * by construction: a bucket at magnitude 2^e is 2^(e-SubBits) wide.
  *
  * Why THIS sketch and not KLL/t-digest/MRL: their compactions depend on
  * merge ORDER, so a shuffle re-plan changes the sketch — unreplayable
  * by an independent engine and nondeterministic across runs. The HDR
  * bucket is a PURE FUNCTION of the value in integer arithmetic
  * (binary-string length = floor(log2) + 1 — no transcendentals, exact
  * in any engine), and the sketch is bucket→count, so merging is
  * bucket-wise addition: commutative, associative, deterministic,
  * oracle-replayable bit-for-bit at ANY corpus size — not just in an
  * exact small-n regime.
  *
  * Scale shape: the per-group state is bounded by the bucket space
  * (≤ (63−SubBits+1)·2^SubBits + 2^SubBits ≈ 7.3k buckets for the full
  * long range; real corpora occupy far fewer), so the partial aggregate
  * absorbs any number of rows map-side and only ≤7.3k (bucket, count)
  * pairs per partition cross the shuffle — percentiles of a 100 TB
  * column cost one bounded-state pass, where `q_percentile`'s exact
  * order statistics shuffle ∝ distinct values. Per-shard sketches
  * stored as (bucket, count) tables merge by a plain sum.
  */
object Hdr {

  /** Linear sub-bucket bits: 7 → 128 sub-buckets per magnitude,
    * relative error ≤ 1/128 < 1%. */
  val SubBits = 7
  private val Sub = 1L << SubBits

  /** Bucket index of a non-negative integral value. Values below
    * [[Sub]] are their own bucket (EXACT); above, the bucket is the top
    * SubBits+1 mantissa bits: idx = (h+1)·Sub + (v >> h) − Sub where
    * h = floor(log2 v) − SubBits. floor(log2 v) = binary-digit count −
    * 1 (`bin()` here, `printf('%b')` in DuckDB) — pure integer
    * semantics, identical in any engine. */
  def bucket(v: Column): Column = {
    val vl = v.cast("long")
    val h = (length(bin(vl)) - 1 - lit(SubBits)).cast("int")
    val m = call_function("div", vl,
      call_function("shiftleft", lit(1L), h))
    when(vl < lit(Sub), vl)
      .otherwise((h.cast("long") + 1) * lit(Sub) + m - lit(Sub))
  }

  /** The highest bucket a long can land in (h = 55, m = 255): its
    * nominal upper bound (m+1)·2^h = 2^63 overflows, so [[upper]] clamps
    * it to Long.MaxValue explicitly — the JVM would wrap to the right
    * answer by accident, but the DuckDB oracle's BIGINT multiply raises
    * instead of wrapping. */
  val TopBucket: Long = (63L - SubBits + 1) * Sub - 1

  /** The UPPER bound of bucket `idx` — the sketch's representative
    * value (a quantile answer is the largest value its bucket could
    * hold, so estimates never under-report and sit within 2^-SubBits
    * relative of the true order statistic). */
  def upper(idx: Column): Column = {
    val h = (call_function("div", idx, lit(Sub)) - 1).cast("int")
    val m = pmod(idx, lit(Sub)) + lit(Sub)
    when(idx < lit(Sub), idx)
      .when(idx >= lit(TopBucket), lit(Long.MaxValue))
      .otherwise((m + 1) * call_function("shiftleft", lit(1L), h) - 1)
  }
}
