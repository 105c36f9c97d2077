package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ingest
import graft.streaming.Stream

/** Structured Streaming wiring tests: bounded streams (AvailableNow) must
  * agree exactly with their batch twins. */
class StreamSpec extends AnyFunSuite with SparkSpec {

  test("file-stream ingest (normalize→points→upsert) matches batch run") {
    val tmp = Files.createTempDirectory("graft-stream")
    val in = tmp.resolve("in"); Files.createDirectories(in)
    Files.write(in.resolve("batch1.txt"),
      IngestQueries.fixtures.map(_._2).asJava)

    val pts = Stream.pointsStream(spark, in.toString)
    assert(pts.isStreaming)
    var streamedRows = 0L
    val sink = Stream.upsertSink(pts, tmp.resolve("ckpt").toString) {
      (batch, _) => streamedRows += batch.count()
    }
    Stream.runAvailableNow(sink)

    val batchPts = Ingest.toPoints(Ingest.normalize(
      spark.read.text(in.toString).withColumnRenamed("value", "raw"), "raw"))
    assert(streamedRows == batchPts.dropDuplicates("id").count())
    assert(streamedRows > 0)
  }

  test("flatMapGroupsWithState sessionization matches the batch twin") {
    val dir = Files.createTempDirectory("graft-sess")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    val gapUs = 1800000000L
    val stream = Stream.sessionizeStream(
      spark.readStream.schema(schema).parquet(dir.toString), gapUs)
    val q = stream.writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sess")
      .select("userId", "startUs", "endUs", "nEvents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // batch twin (q_sessionize logic), minus each user's LAST session —
    // on a bounded stream that session never times out before stream end
    val batch = StreamingQueries.qSessionize.fn(spark, sf)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val closedBatch = batch
      .withColumn("last_idx", max("session_idx").over(w))
      .filter(col("session_idx") < col("last_idx"))
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    assert(closedBatch.subsetOf(streamed),
      s"missing ${closedBatch.diff(streamed).take(3)}")
    // nothing extra beyond batch sessions (open or closed)
    val allBatch = batch.select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed.subsetOf(allBatch), s"extra ${streamed.diff(allBatch).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streaming hourly event rollup totals match the batch table") {
    // stream from a drop-directory (the realistic shape): copy the fixture in
    val dir = Files.createTempDirectory("graft-events")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = Stream.eventsHourlyStream(spark, dir.toString)
      .writeStream.format("memory").queryName("evh")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamedTotal = spark.table("evh").agg(sum("n")).head().getLong(0)
    val batchTotal = Tables.load(spark, sf, "events").count()
    assert(streamedTotal == batchTotal)
    // bucket count matches the declared batch query's distinct hour buckets
    val streamedBuckets = spark.table("evh").count()
    val batchBuckets = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        floor(col("ts") / lit(3600000000000L)).as("hb"))
      .count().count()
    assert(streamedBuckets == batchBuckets)
  }
}
