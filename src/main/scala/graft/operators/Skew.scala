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

  /** SALTED EQUI-JOIN for skewed fact keys — the manual form of the
    * skew-join rewrite for when AQE's runtime splitting isn't available
    * (streaming micro-batches, pre-AQE engines) or the skew is known
    * ahead of time: the fact side gets a deterministic salt in
    * [0, buckets) and the dim side is REPLICATED `buckets`× with every
    * salt value, so one hot key's rows spread over `buckets` reducers
    * instead of serializing on one. Correct for any 1-row-per-key dim
    * (each fact row meets exactly one replica of its key's dim row).
    * Cost: dim shuffles ×`buckets` — cheap by the skew premise
    * (dim ≪ fact). The dim's key column comes back under the fact's key
    * name. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, rowId: String,
                 buckets: Int = 16): DataFrame = {
    // a pre-existing __salt would be silently overwritten (fact) or
    // duplicated into the join key (dim); a non-key dim column already
    // named factKey would collide with the renamed key — both change the
    // join's result obscurely, so fail fast instead
    require(!fact.columns.contains("__salt"),
      "saltedJoin: fact input already has a __salt column")
    require(!dim.columns.contains("__salt"),
      "saltedJoin: dim input already has a __salt column")
    require(dimKey == factKey || !dim.columns.contains(factKey),
      s"saltedJoin: dim column '$factKey' collides with the renamed key")
    val salted = fact.withColumn("__salt", salt(col(rowId), buckets))
    val repl = dim.withColumnRenamed(dimKey, factKey)
      .withColumn("__salt",
        explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(repl, Seq(factKey, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: sum/count of `valueCol` per `keys`,
    * with the heavy first shuffle spread over `buckets` sub-keys.
    * Result is identical to the direct groupBy (addition is associative;
    * decimal sums keep it exact). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     rowId: String, buckets: Int = 16): DataFrame = {
    require(!df.columns.contains("__salt"),
      "saltedSumCount: input already has a __salt column")
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
