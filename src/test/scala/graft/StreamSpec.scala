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
