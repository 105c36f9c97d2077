package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md scale list: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join handling covers joins automatically; aggregation skew
  * (one giant group) still serializes on a single reducer because a hash
  * aggregate sends every (key) partial to one task. [[saltedAgg]] is the
  * standard fix: shard each key into `buckets` salted sub-keys, partially
  * aggregate per (key, salt) — spreading one hot key over `buckets`
  * reducers — then combine the partials per key. Works for any
  * algebraically decomposable aggregate (sum/count/min/max, and avg as
  * sum+count).
  */
object Skew {

  /** Deterministic salt in [0, buckets): hashes a row-identity column so
    * re-runs shard identically (rand() would break retry idempotence
    * inside a stage at scale). */
  def salt(rowId: Column, buckets: Int): Column =
    pmod(hash(rowId), lit(buckets))

  /** Two-phase salted aggregation: sum/count of `valueCol` per `keys`,
    * with the heavy first shuffle spread over `buckets` sub-keys.
    * Result is identical to the direct groupBy (addition is associative;
    * decimal sums keep it exact). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     rowId: String, buckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(col(rowId), buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(20,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__psum").cast("decimal(20,2)").as("__sum"),
        sum("__pcnt").as("n"))
      .withColumn("sum_value", col("__sum").cast("double"))
      .drop("__sum")
  }
}
