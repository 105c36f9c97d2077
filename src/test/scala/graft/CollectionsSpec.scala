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

  test("search: metric dispatch (cosine vs l2), info, DSL filter") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/c4"
    val emb = Tables.load(spark, sf, "embeddings").withColumn("seq", lit(0))
    new Collections.ParquetCollectionSink(spark, dir, VectorConfig(64),
      "embedding", "vec_id", "seq").write(emb)

    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

    val inf = Collections.info(spark, dir)
    assert(inf.config == VectorConfig(64, "cosine") && inf.numPoints == 500)

    // cosine collection: the query vector is its own best match
    val hits = Collections.search(spark, dir, "embedding", "vec_id", q, 5)
    assert(hits.count() == 5)
    assert(hits.head().getLong(hits.head().fieldIndex("vec_id")) == 0L)

    // filtered search via the Qdrant DSL
    val filtered = Collections.search(spark, dir, "embedding", "vec_id", q, 5,
      Some(graft.operators.PayloadFilter.fromJson(
        """{"key": "label", "match": {"value": 3}}""")))
    assert(filtered.collect().forall(r => r.getInt(r.fieldIndex("label")) == 3))

    // an l2 collection orders ascending: self-match first with distance 0
    val dirL2 = Files.createTempDirectory("graft-coll").toString + "/c5"
    new Collections.ParquetCollectionSink(spark, dirL2,
      VectorConfig(64, "l2"), "embedding", "vec_id", "seq").write(emb)
    val l2hits = Collections.search(spark, dirL2, "embedding", "vec_id", q, 3)
      .collect()
    assert(l2hits.head.getLong(0) == 0L)
    assert(l2hits.head.getDouble(l2hits.head.fieldIndex("score")) == 0.0)

    // dim mismatch is rejected up front
    intercept[IllegalArgumentException] {
      Collections.search(spark, dir, "embedding", "vec_id", Seq(1.0, 2.0), 3)
    }
  }

  test("crash recovery: interrupted swap restores from the .old backup") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/c3"
    val sink = new Collections.ParquetCollectionSink(spark, dir,
      VectorConfig(64), "embedding", "vec_id", "seq")
    sink.write(Tables.load(spark, sf, "embeddings").limit(20)
      .withColumn("seq", lit(0)))
    // simulate a crash between the two moves of every bucket's swap:
    // data/bucket=k gone, .old/bucket=k holds the backup
    val old = java.nio.file.Paths.get(s"$dir/.old")
    java.nio.file.Files.createDirectories(old)
    new java.io.File(s"$dir/data").listFiles().filter(_.isDirectory)
      .foreach(b => java.nio.file.Files.move(b.toPath,
        old.resolve(b.getName)))
    assert(Collections.read(spark, dir).count() == 20) // read recovers
    // and the next write's recovery restores + applies the batch on top
    sink.write(Tables.load(spark, sf, "embeddings").limit(25)
      .withColumn("seq", lit(1)))
    assert(Collections.read(spark, dir).count() == 25)
  }

  /** Recursive (path → lastModified) snapshot of every FILE under p. */
  private def fileSnapshot(p: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(p)
    if (!Files.exists(root)) Map.empty
    else {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(Files.isRegularFile(_))
          .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
          .toMap
      } finally walk.close()
    }
  }

  test("incremental upsert: a one-bucket batch leaves every other " +
       "bucket's files untouched") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/c6"
    val sink = new Collections.ParquetCollectionSink(spark, dir,
      VectorConfig(64), "embedding", "vec_id", "seq")
    val emb = Tables.load(spark, sf, "embeddings").limit(200)
    sink.write(emb.withColumn("seq", lit(0)))

    val bucketDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(bucketDirs.size > 1, s"expected several buckets, got $bucketDirs")

    // second batch: ONE id → exactly one touched bucket
    val one = emb.filter(col("vec_id") === 7)
      .withColumn("label", col("label") + 100).withColumn("seq", lit(1))
    val touchedBucket = one
      .select(pmod(hash(col("vec_id")), lit(Collections.numBuckets(dir))))
      .head().getInt(0)
    val before = fileSnapshot(s"$dir/data")
    sink.write(one)
    val after = fileSnapshot(s"$dir/data")

    val untouchedPrefixes = (bucketDirs - s"bucket=$touchedBucket")
      .map(b => s"$dir/data/$b/")
    def partOf(m: Map[String, Long]) =
      m.filter { case (f, _) => untouchedPrefixes.exists(f.startsWith) }
    assert(partOf(before) == partOf(after),
      "files in untouched buckets were rewritten")
    // the touched bucket DID change (rewritten part files get new names)
    assert(before.keySet.filter(_.contains(s"bucket=$touchedBucket/")) !=
           after.keySet.filter(_.contains(s"bucket=$touchedBucket/")))
    // … and the merge semantics held: same count, updated label
    val now = Collections.read(spark, dir)
    assert(now.count() == 200)
    assert(now.filter(col("vec_id") === 7).head()
      .getAs[Int]("label") >= 100)
  }

  test("legacy flat-layout collection migrates losslessly on first " +
       "bucketed upsert") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/c7"
    Collections.create(dir, VectorConfig(64))
    val emb = Tables.load(spark, sf, "embeddings").limit(40)
      .withColumn("seq", lit(0))
    // simulate the pre-bucket layout: plain parquet directly under data/
    emb.write.parquet(s"$dir/data")
    assert(Collections.read(spark, dir).count() == 40)

    val sink = new Collections.ParquetCollectionSink(spark, dir,
      VectorConfig(64), "embedding", "vec_id", "seq")
    sink.write(emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", col("vec_id") + 50000)
      .withColumn("seq", lit(1)))

    val now = Collections.read(spark, dir)
    assert(now.count() == 41, "legacy rows lost in migration")
    assert(now.filter(col("vec_id") === 50000).count() == 1)
    def looseNow = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isFile).map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    // grace period: loose files still on disk for readers bound to them,
    // but logically retired by the marker (read() must not double-count)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/data/_migrated")))
    assert(looseNow.nonEmpty)
    // the NEXT write retires them physically
    sink.write(emb.filter(col("vec_id") === 1)
      .withColumn("vec_id", col("vec_id") + 60000)
      .withColumn("seq", lit(2)))
    assert(looseNow.isEmpty, s"legacy files survived: ${looseNow.toSeq}")
    assert(Collections.read(spark, dir).count() == 42)
  }

  test("management surface: list / scroll / delete") {
    val root = Files.createTempDirectory("graft-mgmt").toString
    val emb = Tables.load(spark, sf, "embeddings").withColumn("seq", lit(0))
    Seq("alpha", "beta").foreach { name =>
      new Collections.ParquetCollectionSink(spark, s"$root/$name",
        VectorConfig(64), "embedding", "vec_id", "seq").write(emb.limit(30))
    }
    Files.createDirectories(java.nio.file.Paths.get(s"$root/not_a_coll"))
    assert(Collections.list(root) == Seq("alpha", "beta"))

    // scroll: pages are disjoint, ordered, and cover the collection
    val (p1, o1) = Collections.scroll(spark, s"$root/alpha", "vec_id",
      None, 12)
    val (p2, o2) = Collections.scroll(spark, s"$root/alpha", "vec_id",
      o1, 12)
    val (p3, o3) = Collections.scroll(spark, s"$root/alpha", "vec_id",
      o2, 12)
    val ids = Seq(p1, p2, p3).flatMap(_.select("vec_id").collect()
      .map(_.getLong(0)))
    assert(ids == ids.sorted && ids.distinct.size == 30)
    assert(o3.isEmpty, "last page must end the scroll")
    // filtered scroll composes with the DSL
    val (pf, _) = Collections.scroll(spark, s"$root/alpha", "vec_id",
      None, 100, Some(graft.operators.PayloadFilter.fromJson(
        """{"key": "label", "match": {"value": 3}}""")))
    assert(pf.collect().forall(_.getAs[Int]("label") == 3))

    Collections.delete(s"$root/beta")
    assert(Collections.list(root) == Seq("alpha"))
    assert(!Collections.exists(s"$root/beta"))

    // the scroll offset predicate pushes to the parquet scan
    val plan = Collections.read(spark, s"$root/alpha")
      .filter(col("vec_id") > lit(11L)).orderBy(col("vec_id")).limit(12)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"scroll offset not pushed down:\n$plan")
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
