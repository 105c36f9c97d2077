package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tenant / shard-key multitenancy analog (Qdrant collections accept a
  * shard key — commonly a tenant payload field — and a search with a
  * `shard_key_selector` touches only that tenant's shards). The engine's
  * serving-layout analog: a materialization partitioned by the DECLARED
  * tenant column first and the id-hash bucket second, so
  *
  *  - a tenant-scoped query carries a LITERAL tenant predicate that
  *    resolves to static partition pruning — the scan lists only
  *    `tenant=X/` directories (`PartitionFilters: [tenant = X]` in the
  *    plan audit; OperatorSpec asserts it), never other tenants' files —
  *    the isolation AND the performance contract of shard routing;
  *  - within a tenant, the id-hash bucket sublayout keeps per-tenant
  *    writes/compaction parallel (same contract as the collection
  *    layout's bucket count).
  *
  * At 100 TB this is the difference between per-tenant serving cost
  * O(tenant's data) and O(corpus): the predicate never reaches row
  * filtering — pruning happens at file-listing time on the driver.
  */
object Tenancy {

  /** Materialize the tenant-routed serving layout. The tenant column must
    * be low-cardinality relative to data volume (it becomes a directory
    * level — the same constraint Qdrant places on shard-key values). */
  def build(points: DataFrame, tenantCol: String, idCol: String,
            dir: String, buckets: Int = 16): Unit = {
    // `bucket` is the layout's reserved routing column (same contract as
    // the collection layout) — a payload column of that name would be
    // silently overwritten here and dropped by forTenant
    require(!points.columns.contains("bucket"),
      "points carry a column named 'bucket' — reserved for the layout")
    points
      .withColumn("bucket", Collections.bucketOf(idCol, buckets))
      .write.mode("overwrite")
      .partitionBy(tenantCol, "bucket")
      .parquet(dir)
    ServedReads.evict(dir)
  }

  /** Tenant-scoped view: a LITERAL equality on the tenant partition
    * column — static pruning, no other tenant's files are listed. */
  def forTenant(spark: SparkSession, dir: String, tenantCol: String,
                tenant: Any): DataFrame =
    ServedReads.of(spark, dir).filter(col(tenantCol) === lit(tenant))
      .drop("bucket")

  /** Materialize the tenant layout FROM a collection (shard key = a
    * payload column) and return the manifest cursor for [[refresh]]. */
  def buildFromCollection(spark: SparkSession, collDir: String,
                          layoutDir: String, tenantCol: String,
                          idCol: String): Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    build(Collections.read(spark, collDir), tenantCol, idCol, layoutDir,
      Collections.numBuckets(collDir))
    cur
  }

  /** Incremental refresh from the collection change feed (the
    * [[IvfIndex.refresh]] discipline): a collection bucket the feed
    * reports changed/dropped has its `bucket=b` leaf deleted under EVERY
    * tenant directory (a bucket's rows can span tenants), then the
    * staged replacements move in. Untouched buckets' files are not read,
    * not rewritten, not moved — refresh cost is O(points in touched
    * buckets). STAGED like [[IvfIndex.refresh]]: the replacement job
    * writes into `_staging` first, so a crash during the expensive write
    * leaves the live layout intact; only the rename window of the final
    * swap is inconsistent (single writer; re-run or full
    * [[buildFromCollection]] repairs a crash). */
  def refresh(spark: SparkSession, collDir: String, layoutDir: String,
              tenantCol: String, idCol: String,
              prev: Collections.ManifestView): Collections.ManifestView = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val (cur, changedDf, dropped) =
      Collections.changedSince(spark, collDir, prev)
    val changedBuckets = Collections.changedBuckets(prev, cur)
    val stale = changedBuckets ++ dropped
    def subdirs(p: Path, prefix: String): Seq[Path] =
      if (!Files.isDirectory(p)) Seq.empty
      else {
        val s = Files.list(p)
        try s.iterator().asScala.filter(d => Files.isDirectory(d) &&
          d.getFileName.toString.startsWith(prefix)).toSeq
        finally s.close()
      }
    // 1. STAGE the replacement rows (live layout untouched on failure)
    val staging = Paths.get(layoutDir, "_staging_refresh")
    if (Files.exists(staging)) Collections.deleteRecursively(staging)
    if (changedBuckets.nonEmpty)
      changedDf
        .withColumn("bucket",
          Collections.bucketOf(idCol, Collections.numBuckets(collDir)))
        .write.mode("overwrite")
        .partitionBy(tenantCol, "bucket")
        .parquet(staging.toString)
    // 2. SWAP: drop stale leaves under every live tenant dir, then move
    //    each staged tenant's bucket leaves into place (renames only).
    //    Serving memo: evict before AND after the swap window
    ServedReads.evict(layoutDir)
    val root = Paths.get(layoutDir)
    subdirs(root, s"$tenantCol=").foreach { td =>
      stale.foreach { b =>
        val leaf = td.resolve(s"bucket=$b")
        if (Files.exists(leaf)) Collections.deleteRecursively(leaf)
      }
    }
    subdirs(staging, s"$tenantCol=").foreach { std =>
      val liveTenant = root.resolve(std.getFileName.toString)
      Files.createDirectories(liveTenant)
      subdirs(std, "bucket=").foreach(leaf =>
        Files.move(leaf, liveTenant.resolve(leaf.getFileName.toString)))
    }
    if (Files.exists(staging)) Collections.deleteRecursively(staging)
    ServedReads.evict(layoutDir)
    cur
  }
}
