package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader. One parquet file per table (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — Spark has no ns timestamp
      // type (PARQUET_TYPE_ILLEGAL without this), so read it as a BIGINT of
      // epoch nanoseconds and derive µs timestamps / buckets explicitly.
      // DuckDB side: epoch_ns(ts) yields the identical BIGINT.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
