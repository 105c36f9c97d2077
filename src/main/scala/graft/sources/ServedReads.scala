package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dir) memo of serving-layout parquet reads — the "hold
  * the index open" discipline of a serving system, shared by EVERY
  * materialized layout (payload/geo/text indexes, quantized-codes and
  * PQ sidecars, IVF/IVF-PQ cells, graph adjacency/seeds, tenant
  * layouts).
  *
  * Why it exists: a fresh `spark.read.parquet(dir)` re-LISTS the layout
  * and re-parses every partition path on each call — Spark's shared
  * file-status cache is keyed per FileIndex INSTANCE, so new reads
  * never hit it. On a wide partitioned layout that fixed per-query cost
  * dominates serving: measured (r13 `Dev georouteprobe`) ~45 s PER
  * QUERY on a 17.6k-dir geo grid, ~0.8 s on 4.6k dirs. A real vector
  * server opens its index once and serves from it; at 100 TB an IVF
  * layout has thousands of `cluster=` dirs and per-query relisting is
  * exactly the geo cliff. The memoized frame is a resolved relation
  * whose file listing is frozen at first use; PartitionFilters still
  * prune per query — only the listing is shared.
  *
  * Soundness: layouts are DERIVED data that mutate only through their
  * own verbs (build / refresh / retrain / staged swaps), and every such
  * verb EVICTS the layout root before AND after the mutation (a reader
  * re-memoizing mid-write sees a listing the post-mutation evict
  * clears). Eviction is by PATH PREFIX, because some layouts are read
  * through subdirectories (graph `_seeds/`, round tables) whose memo
  * keys differ from the root. External mutation of a layout dir is
  * outside the contract — rebuild instead. */
object ServedReads {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** The memoized read of `dir` for this session (racing builders both
    * produce equivalent relations; first wins). */
  def of(spark: SparkSession, dir: String): DataFrame = {
    val k = (spark, dir)
    Option(cache.get(k)).getOrElse {
      val df = spark.read.parquet(dir)
      Option(cache.putIfAbsent(k, df)).getOrElse(df)
    }
  }

  /** Drop every session's memoized reads of `dir` and everything under
    * it. Called by every verb that mutates the layout, before and after
    * the mutation. */
  def evict(dir: String): Unit = {
    cache.keySet.removeIf { case (_, d) =>
      d == dir || d.startsWith(dir + "/")
    }
    ()
  }
}
