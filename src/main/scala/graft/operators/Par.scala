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
    // a streaming Dataset cannot be batch-planned for inspection (and
    // micro-batch parallelism is the source's concern) — pass through
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Decide from PLAN-TIME metadata only. (`df.rdd.getNumPartitions`
    // looks tempting, but under AQE building the final RDD submits and
    // awaits every upstream shuffle job — construction would silently
    // execute the pipeline once and throw the result away.)
    //  - an upstream shuffle means parallelism was already established
    //    (repartition/agg/join) — adding another exchange only costs;
    //  - otherwise the stage count equals the scan split count, which
    //    file-listing metadata bounds: fewer files than cores → narrow
    //    compute underuses the machine (splits ≥ files; a row-group-less
    //    small file is exactly one split).
    val hasShuffle = df.queryExecution.sparkPlan.find {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }.isDefined
    if (hasShuffle || df.inputFiles.length >= target) df
    else df.repartition(target)
  }
}
