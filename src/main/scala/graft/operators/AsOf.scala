package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF JOIN — the time-series operator Spark lacks
  * natively (SURVEY.md §4 custom-operator ladder, rung (a): composed
  * from built-ins, no Catalyst extension needed): for each probe row,
  * the latest quote timestamp at or before it within the same key.
  *
  * Implementation is the union + running-window form, NOT a range join:
  * tag both sides, union, ONE shuffle on the key, one sort by
  * (ts, side-tag), and a running MAX over the quote timestamps. Cost is
  * shuffle+sort of |probe|+|quote| — the canonical 100 TB form (a
  * non-equi range join degrades to per-key quadratic work; a windowed
  * union never does). The side tag orders quotes BEFORE probes at equal
  * timestamps, so `quote.ts <= probe.ts` holds exactly at ties.
  */
object AsOf {

  /** Attach `asofCol` = max quote `tsCol` <= the probe row's `tsCol`
    * (same `keyCol`; null when no quote precedes). Probe columns pass
    * through unchanged. `tsCol` must be an integral epoch column (ns/µs
    * BIGINT — exact; no timestamp truncation). */
  def asofJoin(probe: DataFrame, quote: DataFrame, keyCol: String,
               tsCol: String, asofCol: String = "asof_ts"): DataFrame = {
    val pCols = probe.columns
    val pu = probe
      .withColumn("__side", lit(1))
      .withColumn("__qts", lit(null).cast("long"))
    // join semantics: NULL keys never match (Window.partitionBy would
    // group NULL with NULL) — null-key quotes are dropped, so null-key
    // probe rows pass through with a null asof column
    val qu = quote
      .filter(col(keyCol).isNotNull)
      .select(pCols.map { c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)
      }: _*)
      .withColumn("__side", lit(0))
      .withColumn("__qts", col(tsCol).cast("long"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pu.unionByName(qu)
      .withColumn(asofCol, max(col("__qts")).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__qts")
  }

  /** FORWARD as-of: min quote `tsCol` STRICTLY AFTER the probe row's
    * `tsCol` (same key; null when none follows) — the complement
    * direction (ClickHouse ASOF ... `>` / pandas merge_asof
    * direction='forward'): "the next event after this one", the lookup
    * an attribution window or a sensor-alignment backfill reads. Same
    * union + running-window shape, mirrored: quotes keep side 0 so they
    * sort BEFORE probes at equal timestamps — a same-ts quote falls
    * OUTSIDE the probe's strictly-following frame, which is exactly the
    * strict `>`; the running MIN runs over rows (current+1,
    * unboundedFollowing), where intervening probe rows carry null __qts
    * and cannot win the min. */
  def asofJoinForward(probe: DataFrame, quote: DataFrame, keyCol: String,
                      tsCol: String,
                      asofCol: String = "asof_ts"): DataFrame = {
    val pCols = probe.columns
    val pu = probe
      .withColumn("__side", lit(1))
      .withColumn("__qts", lit(null).cast("long"))
    val qu = quote
      .filter(col(keyCol).isNotNull)
      .select(pCols.map { c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)
      }: _*)
      .withColumn("__side", lit(0))
      .withColumn("__qts", col(tsCol).cast("long"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(1, Window.unboundedFollowing)
    pu.unionByName(qu)
      .withColumn(asofCol, min(col("__qts")).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__qts")
  }
}
