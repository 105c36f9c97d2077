package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Hdr

/** Artifact-drift maintenance for the trained serving layouts (r12
  * verdict worklist #5). Every materialized vector layout PINS its
  * trained artifacts forever — centroids, codebooks, entry seeds —
  * and [[Collections.stagedBucketRefresh]]-based refresh deliberately
  * re-uses them so refresh == rebuild bit-exactly. That is the right
  * maintenance contract, but it leaves a gap a real serving system
  * closes with a planner statistic: when the COLLECTION's distribution
  * drifts away from what the artifacts were trained on, the pinned
  * layout silently degrades (IVF cells stop matching neighborhoods, PQ
  * codebooks stop covering the value range) and nothing measures it.
  *
  * Two pieces close the gap:
  *
  *  - **Drift signal** ([[snapshotAssignment]] / [[assignmentRatio]]):
  *    the HDR sketch ([[graft.operators.Hdr]] — deterministic, bounded,
  *    mergeable) of each point's micro-quantized L2 distance to its
  *    assigned pinned centroid, persisted at build time as a `_drift/`
  *    sidecar (underscore — invisible to layout reads). The signal is
  *    the ratio of the CURRENT collection's assignment-distance
  *    quantile (same pinned centroids) to the pinned build-time
  *    quantile: ≈ 1 while the distribution holds, rising as points land
  *    ever farther from every trained cell. Cost: one bounded-state
  *    aggregation pass (≤ 7.3k buckets cross the shuffle), no index
  *    mutation, no training.
  *  - **Staged retrain** ([[stagedRebuild]] + the per-layout `retrain`
  *    verbs): train FRESH artifacts from the current collection with
  *    the caller's trainer (the same function the original build used)
  *    and rebuild the whole layout into a `_retrain_staging` dir, then
  *    swap — the live layout serves unchanged until the swap's renames,
  *    and a crash during the expensive build leaves it fully intact
  *    (the [[IvfIndex]] staged-refresh discipline applied to the whole
  *    layout). Retrain returns the fresh manifest cursor, so the
  *    pinned-artifact refresh contract continues from the new build.
  *
  * Retrain is an OPERATOR the deployment invokes when the signal
  * crosses its threshold — never something a refresh does implicitly
  * (that would break refresh == rebuild), and never part of a declared
  * query (gates stay row-unchanged by construction; CollectionsSpec
  * proves shift → signal fires → retrained recall > pinned recall with
  * both refresh contracts intact).
  */
object Drift {

  /** Per-point micro-quantized L2 distance to the nearest pinned
    * centroid, HDR-bucketed and counted — the bounded drift
    * fingerprint. One broadcast pass; ≤ 7.3k rows out.
    *
    * PER-ROW contract: every input row counts once — a duplicate id
    * contributes once per occurrence. Callers that need per-id
    * semantics pre-distinct their points (as
    * [[SemanticDedupIndex]].storedPoints does); the sketch itself stays
    * a single bounded-state pass with no corpus-sized distinct. */
  def assignmentSketch(points: DataFrame, vecCol: String,
                       centroids: DataFrame,
                       cvCol: String): DataFrame = {
    // fused nearest-centroid distance (the argminAssign discipline —
    // the crossjoin + per-id min re-aggregation this replaces blew
    // every point into k rows; the centroid collect is not a new bound,
    // the broadcast materialized the same table)
    val local = centroids
      .select(col(cvCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    points
      .select(org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.MinCellDistExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(
            col(vecCol).cast("array<double>")),
          local.toSeq)).as("__d"))
      .filter(col("__d").isNotNull)
      .select(Hdr.bucket(floor(col("__d") * 1e6 + lit(0.5)).cast("long"))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Driver-side twin of [[Hdr.upper]] — the bucket's upper bound. */
  private def upperOf(idx: Long): Long = {
    val sub = 1L << Hdr.SubBits
    if (idx < sub) idx
    else if (idx >= Hdr.TopBucket) Long.MaxValue
    else {
      val h = (idx / sub - 1).toInt
      val m = idx % sub + sub
      (m + 1) * (1L << h) - 1
    }
  }

  /** The `q`-quantile upper bound of a (bucket, cnt) sketch — the HDR
    * cumulative rank walk, driver-side (the sketch is ≤ 7.3k rows by
    * construction). */
  def quantileUpper(sketch: DataFrame, q: Double): Long = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1]: $q")
    val rows = sketch
      .select(col("bucket").cast("long"), col("cnt").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = rows.map(_._2).sum
    require(total > 0, "drift sketch is empty")
    val target = math.max(1L, math.ceil(q * total).toLong)
    var acc = 0L
    rows.foreach { case (b, c) =>
      acc += c
      if (acc >= target) return upperOf(b)
    }
    upperOf(rows.last._1)
  }

  /** Persist the build-time assignment sketch beside a layout (the
    * `_drift/` sidecar [[assignmentRatio]] compares against). Call it
    * right after a build/retrain with the SAME points and the layout's
    * pinned centroids ([[assignmentSketch]]'s per-row contract). */
  def snapshotAssignment(indexDir: String, points: DataFrame,
                         vecCol: String, centroids: DataFrame,
                         cvCol: String = "cv"): Unit = {
    assignmentSketch(points, vecCol, centroids, cvCol)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/_drift")
    ()
  }

  /** The drift signal: current-collection `q`-quantile assignment
    * distance under the PINNED centroids, divided by the pinned
    * build-time quantile. ≈ 1.0 while the distribution the artifacts
    * were trained on holds; rises as the collection drifts. Requires a
    * [[snapshotAssignment]] sidecar. */
  def assignmentRatio(spark: SparkSession, indexDir: String,
                      points: DataFrame, vecCol: String,
                      centroids: DataFrame, cvCol: String = "cv",
                      q: Double = 0.9): Double = {
    require(Files.isDirectory(Paths.get(indexDir, "_drift")),
      s"no drift snapshot at $indexDir/_drift — call snapshotAssignment " +
        "at build time")
    val now = quantileUpper(
      assignmentSketch(points, vecCol, centroids, cvCol), q)
    val pinned = quantileUpper(
      spark.read.parquet(s"$indexDir/_drift"), q)
    if (pinned == 0L) (if (now == 0L) 1.0 else Double.PositiveInfinity)
    else now.toDouble / pinned.toDouble
  }

  /** Default maintenance threshold for [[maintain]]: the signal is
    * EXACTLY 1.0 on unchanged data (same points, same pinned artifacts,
    * deterministic sketch — spec-pinned) and the scaled-permutation
    * distribution shift (a re-embedding: dims rolled, 2.5× scale) fires
    * well above 1.1 in every gated walk (CollectionsSpec /
    * SemanticDedupIndexSpec), so 1.1 separates "noise-free identical"
    * from "the artifacts no longer describe the data" with margin on
    * both sides. Deployments tracking gradual drift can lower it;
    * anything ≤ 1.0 retrains on every call by construction. */
  val DefaultThreshold: Double = 1.1

  /** One [[maintain]] outcome: the measured signal and whether the
    * retrain ran. */
  final case class MaintainResult(ratio: Double, retrained: Boolean)

  /** ONE-CALL drift maintenance — the composition the r13 machinery
    * left to the deployment: evaluate the signal, retrain past the
    * threshold, no-op otherwise. `ratio` and `retrain` are by-name so a
    * no-op call costs exactly one signal pass and the layout's bytes
    * are untouched (spec-asserted). The per-layout `maintain` verbs
    * ([[IvfIndex]], [[IvfPqIndex]], [[PqIndex]], [[GraphIndex]],
    * [[SemanticDedupIndex]]) delegate here with their own signal and
    * retrain wiring, so the threshold policy lives in one place. */
  def maintain(threshold: Double)(ratio: => Double)(retrain: => Unit)
      : MaintainResult = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val r = ratio
    if (r > threshold) { retrain; MaintainResult(r, retrained = true) }
    else MaintainResult(r, retrained = false)
  }

  private def rmTree(p: java.io.File): Unit = {
    Option(p.listFiles()).foreach(_.foreach(rmTree)); p.delete(); ()
  }

  /** Staged WHOLE-LAYOUT rebuild: `build` writes a complete fresh
    * layout into a staging dir; only after it succeeds does the swap
    * run (live → trash, staging → live, trash deleted — renames only).
    * A crash during the build leaves the live layout intact and
    * serving; leftover staging/trash dirs are cleared on the next
    * call. The per-layout `retrain` verbs delegate here. */
  def stagedRebuild[A](indexDir: String)(build: String => A): A = {
    val staging = s"${indexDir}_retrain_staging"
    val trash = s"${indexDir}_retrain_trash"
    rmTree(new java.io.File(staging))
    rmTree(new java.io.File(trash))
    val a = build(staging)
    ServedReads.evict(indexDir) // memoized reads predate the swap
    if (Files.exists(Paths.get(indexDir)))
      Files.move(Paths.get(indexDir), Paths.get(trash))
    Files.move(Paths.get(staging), Paths.get(indexDir))
    rmTree(new java.io.File(trash))
    ServedReads.evict(indexDir) // and one re-memoized mid-swap is stale
    a
  }
}
