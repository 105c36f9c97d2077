package graft

import org.apache.spark.sql.functions._

/** Relational analytics over the star schema (SURVEY.md §2.3 audit: the
  * reference has no joins/aggs/windows — these are the engine-native
  * operators every real analytics workload over the ingested collections
  * needs, exercised on the TESTDATA.md fixture tables).
  *
  * Oracle-parity rules (SURVEY.md §7 risks):
  *  - money/qty sums go through DECIMAL so the result is order-independent
  *    and hash-comparable with DuckDB; final output cast to DOUBLE (the
  *    decimal→double conversion is correctly rounded in both engines).
  *  - averages are derived as decimal-sum / count in DOUBLE, never engine
  *    `avg` (engines disagree on decimal avg typing).
  *  - every computed column is aliased identically here and in the SQL.
  */
object Relational {

  /** Q1-style pricing summary: full-scan aggregation with map-side partial
    * aggregation; at 100 TB this is a scan + one small shuffle of
    * (flag,status) partials — optimal. Filter + 7-column projection are
    * pushed to the parquet scan. */
  val q1Pricing = Q("q1_pricing",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(20,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(20,4)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(20,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  def queries: Seq[Q] = Seq(q1Pricing)
}
