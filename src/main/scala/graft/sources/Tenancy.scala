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
  }

  /** Tenant-scoped view: a LITERAL equality on the tenant partition
    * column — static pruning, no other tenant's files are listed. */
  def forTenant(spark: SparkSession, dir: String, tenantCol: String,
                tenant: Any): DataFrame =
    spark.read.parquet(dir).filter(col(tenantCol) === lit(tenant))
      .drop("bucket")
}
