package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Incrementally-maintained IVF index over a collection — the composition
  * of the collection change feed ([[Collections.changedSince]]) with the
  * IVF assignment build (Ann.buildIvfIndex): after an upsert /
  * deleteWhere / setVectorWhere sequence touches a handful of collection
  * buckets, [[refresh]] re-assigns and re-partitions ONLY those buckets'
  * points instead of rebuilding the index from the whole collection.
  *
  * Layout: parquet partitioned by (src_bucket, cluster) — `src_bucket` is
  * the collection's id-hash bucket, so the index rows derived from one
  * collection bucket live under one directory and refresh is a directory
  * swap per touched bucket; `cluster` is the IVF cell, and partition
  * pruning on it (the probe path, Ann.ivfSearchIndexed) works the same as
  * the flat `cluster=` layout — Spark prunes on ANY partition column, not
  * just the outermost.
  *
  * The index is DERIVED data without a manifest commit, but refresh is
  * STAGED: replacement rows are written into an `_staging` dir first
  * (underscore prefix — invisible to Spark's file listing), and only
  * after that job succeeds are stale `src_bucket=` dirs deleted and the
  * staged dirs moved into place. A crash or job failure during the
  * expensive write leaves the live index fully intact; the vulnerable
  * window is the few directory renames of the swap itself (a reader
  * racing exactly that swap can see a partial index — run refresh from
  * the single writer, as with every mutation verb; re-running refresh,
  * which clears leftover staging, or a full [[build]] repairs a crash).
  *
  * Scale: cost is O(points in touched buckets) per refresh — the 100 TB
  * contract. The centroid table is the caller's (trained once, k·dim
  * doubles); reassignment is the same broadcast-argmin the full build
  * uses.
  */
object IvfIndex {

  /** Assign clusters + tag the source bucket; the written row set. */
  private def assigned(points: DataFrame, idCol: String, vecCol: String,
                       centroids: DataFrame, cidCol: String, cvCol: String,
                       numBuckets: Int): DataFrame =
    points
      .join(Ann.argminAssign(points, idCol, vecCol, centroids, cidCol,
        cvCol), idCol)
      .withColumn("src_bucket", Collections.bucketOf(idCol, numBuckets))

  /** Full build: the whole collection, one overwrite. Returns the
    * manifest view the index now reflects — the cursor for [[refresh]]. */
  def build(spark: SparkSession, collDir: String, indexDir: String,
            idCol: String, vecCol: String, centroids: DataFrame,
            cidCol: String, cvCol: String): Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    assigned(Collections.read(spark, collDir), idCol, vecCol, centroids,
      cidCol, cvCol, Collections.numBuckets(collDir))
      .write.mode("overwrite")
      .partitionBy("src_bucket", "cluster")
      .parquet(indexDir)
    ServedReads.evict(indexDir)
    cur
  }

  /** Incremental refresh from the change feed: buckets the collection
    * rewrote (or dropped) since `prev` get their index directories
    * deleted and — for live buckets — re-assigned and re-appended.
    * Untouched buckets' index files are not read, not rewritten, not
    * moved. Returns the new cursor. */
  def refresh(spark: SparkSession, collDir: String, indexDir: String,
              idCol: String, vecCol: String, centroids: DataFrame,
              cidCol: String, cvCol: String,
              prev: Collections.ManifestView): Collections.ManifestView =
    Collections.stagedBucketRefresh(spark, collDir, indexDir, prev,
      Seq("src_bucket", "cluster"))(
      assigned(_, idCol, vecCol, centroids, cidCol, cvCol,
        Collections.numBuckets(collDir)))

  /** Staged RETRAIN (the [[Drift]] maintenance verb): train FRESH
    * centroids from the current collection with the caller's trainer
    * (the same function the original build used — e.g.
    * `Ann.kmeansFit(_, id, vec, k, iters)`), rebuild the whole layout
    * into staging, swap, and snapshot the new build-time drift sketch.
    * Returns (new cursor, the trained centroids) — the caller holds the
    * centroids for serving and for every later [[refresh]], exactly as
    * after [[build]]. Refresh from the returned cursor preserves the
    * pinned-artifact contract against the NEW artifacts. */
  def retrain(spark: SparkSession, collDir: String, indexDir: String,
              idCol: String, vecCol: String,
              trainCentroids: DataFrame => DataFrame,
              cidCol: String = "cid", cvCol: String = "cv")
      : (Collections.ManifestView, DataFrame) = {
    val cur = Collections.manifestView(collDir)
    val pts = Collections.read(spark, collDir)
    val cents = trainCentroids(pts)
    Drift.stagedRebuild(indexDir) { staging =>
      assigned(pts, idCol, vecCol, cents, cidCol, cvCol,
          Collections.numBuckets(collDir))
        .write.mode("overwrite")
        .partitionBy("src_bucket", "cluster")
        .parquet(staging)
      Drift.snapshotAssignment(staging, pts, vecCol, cents, cvCol)
    }
    (cur, cents)
  }

  /** ONE-CALL maintenance ([[Drift.maintain]]): evaluate the drift
    * signal of the CURRENT collection under the caller-held serving
    * centroids (the layout's pinned artifacts), [[retrain]] past
    * `threshold` (default [[Drift.DefaultThreshold]] — the measured
    * fire point), no-op otherwise with the layout bytes untouched.
    * Returns the signal and, iff it fired, retrain's
    * (cursor, fresh centroids) — the caller swaps its serving
    * centroids exactly as after a manual retrain. Requires the
    * build-time [[Drift.snapshotAssignment]] baseline. */
  def maintain(spark: SparkSession, collDir: String, indexDir: String,
               idCol: String, vecCol: String, centroids: DataFrame,
               trainCentroids: DataFrame => DataFrame,
               cidCol: String = "cid", cvCol: String = "cv",
               threshold: Double = Drift.DefaultThreshold)
      : (Drift.MaintainResult,
         Option[(Collections.ManifestView, DataFrame)]) = {
    var out: Option[(Collections.ManifestView, DataFrame)] = None
    val res = Drift.maintain(threshold)(
      Drift.assignmentRatio(spark, indexDir,
        Collections.read(spark, collDir), vecCol, centroids, cvCol)) {
      out = Some(retrain(spark, collDir, indexDir, idCol, vecCol,
        trainCentroids, cidCol, cvCol))
    }
    (res, out)
  }
}
