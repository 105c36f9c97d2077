package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Collections
import graft.sources.Collections.VectorConfig

/** Collection DDL + upsert-sink semantics (reference O12/O14/O17/O20). */
class CollectionsSpec extends AnyFunSuite with SparkSpec {

  test("create-iff-absent records config; second create is a no-op") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/c1"
    assert(!Collections.exists(dir))
    Collections.create(dir, VectorConfig(64))
    assert(Collections.exists(dir))
    assert(Collections.config(dir) == VectorConfig(64, "cosine"))
    Collections.create(dir, VectorConfig(128, "l2")) // must NOT overwrite
    assert(Collections.config(dir) == VectorConfig(64, "cosine"))
  }

  test("crash recovery: interrupted swap restores from the .old backup") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/c3"
    val sink = new Collections.ParquetCollectionSink(spark, dir,
      VectorConfig(64), "embedding", "vec_id", "seq")
    sink.write(Tables.load(spark, sf, "embeddings").limit(20)
      .withColumn("seq", lit(0)))
    // simulate a crash between the two moves: data gone, .old holds it
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$dir/data"),
      java.nio.file.Paths.get(s"$dir/.old"))
    assert(Collections.read(spark, dir).count() == 20) // read recovers
  }

  test("upsert: same id overwrites (keep-last by sequence), dims enforced") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/c2"
    val sink = new Collections.ParquetCollectionSink(spark, dir,
      VectorConfig(64), "embedding", "vec_id", "seq")
    val emb = Tables.load(spark, sf, "embeddings").limit(50)

    sink.write(emb.withColumn("seq", lit(0)))
    assert(Collections.read(spark, dir).count() == 50)

    // second batch: 10 overwrites with label bumped +100, 5 new ids,
    // 3 invalid rows (wrong dim) that must be rejected
    val overwrite = emb.filter(col("vec_id") < 10)
      .withColumn("label", col("label") + 100).withColumn("seq", lit(1))
    val fresh = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 10000).withColumn("seq", lit(1))
    val bad = emb.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 20000)
      .withColumn("embedding", slice(col("embedding"), 1, 8))
      .withColumn("seq", lit(1))
    sink.write(overwrite.unionByName(fresh).unionByName(bad))

    val now = Collections.read(spark, dir)
    assert(now.count() == 55) // 50 + 5 new, bad rejected
    assert(now.filter(col("vec_id") < 10 && col("label") >= 100).count() == 10)
    assert(now.filter(col("vec_id") >= 20000).count() == 0)
    // every stored vector satisfies the declared dim
    assert(now.filter(size(col("embedding")) =!= 64).count() == 0)
  }
}
