package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-heavy narrow stages.
  *
  * A single small parquet file is one input split, so a pipeline whose
  * cost is per-row compute (embedding inference, signature hashing) runs
  * on ONE core regardless of `local[32]` — measured as the dominant wall
  * time of the embed/dedup queries and the source of their busy-box
  * variance. [[spread]] round-robin-repartitions the input up to the
  * session's default parallelism, but ONLY when the source has fewer
  * partitions: on a real cluster a 100 TB scan already carries orders of
  * magnitude more splits than cores and the call is a no-op decision —
  * it never REDUCES partitioning, so it cannot become the bottleneck it
  * fixes. The shuffle it inserts moves the raw input rows once; every
  * caller sits in front of per-row work that costs far more than one
  * row-sized exchange.
  *
  * Correctness: callers are row-independent transforms or
  * order-insensitive integer aggregations (bucket sums, min-hash folds),
  * so a round-robin reshuffle cannot change any declared-query result.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the RDD lineage but runs no job
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
