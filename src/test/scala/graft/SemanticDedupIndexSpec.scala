package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.operators.Ann
import graft.sources.SemanticDedupIndex

/** The persisted SemDeDup cell index (semantic dedup's serving layout):
  * probe-twin bit-equality, literal-cell pruning, delivery serving equal
  * to recompute-from-scratch, pinned-artifact append maintenance through
  * the ServedReads memo, the broadcast downgrade, and the loud-failure
  * contracts — the [[DedupIndexSpec]] discipline on the semantic twin. */
class SemanticDedupIndexSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_spec_$tag").toString

  private def corpus: DataFrame = Tables.load(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  private def cents: DataFrame = AnnQueries.trainedCentroids(spark, sf, 8, 2)

  private def builtDir(tag: String): String = {
    val dir = tmp(tag)
    SemanticDedupIndex.build(spark, corpus, "vec_id", "embedding", dir,
      cents)
    dir
  }

  private def vecOf(id: Long): Seq[Double] =
    corpus.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  test("probeCell is bit-identical to the distributed argmin assignment " +
       "on fixture vectors and their perturbations (the zero-job probe " +
       "twin's contract)") {
    val dir = builtDir("semtwin")
    val pts = corpus.orderBy("vec_id").limit(40)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val distributed = pts
      .join(Ann.argminAssign(pts, "vec_id", "v", cents, "cid", "cv"),
        "vec_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getSeq[Double](1))).toMap
    distributed.foreach { case (id, (cluster, v)) =>
      assert(SemanticDedupIndex.probeCell(spark, dir, v) == cluster,
        s"vec $id: local cell != distributed assignment $cluster")
      val perturbed = (v.head + 0.25) +: v.tail
      import spark.implicits._
      val viaSpark = Ann.argminAssign(
        Seq((0L, perturbed)).toDF("vec_id", "v"),
        "vec_id", "v", cents, "cid", "cv")
        .head().getLong(1)
      assert(SemanticDedupIndex.probeCell(spark, dir, perturbed) == viaSpark,
        s"perturbed vec $id: local cell != distributed $viaSpark")
    }
  }

  test("build → lookup: exact copy scores 1000000, near copy ≥ 900000, " +
       "a novel (negated) vector matches nothing") {
    val dir = builtDir("semlookup")
    val v1 = vecOf(1L)
    val exact = SemanticDedupIndex.lookup(spark, dir, v1, 900000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.get(1L).contains(1000000L), s"exact probe got $exact")
    val near = SemanticDedupIndex.lookup(spark, dir,
      (v1.head + 0.25) +: v1.tail, 900000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(near.contains(1L) && near(1L) >= 900000L && near(1L) < 1000000L,
      s"near probe got $near")
    assert(SemanticDedupIndex.lookup(spark, dir, v1.map(-_), 900000L)
      .isEmpty, "negated probe matched the corpus")
  }

  test("lookup is served with a literal cluster PartitionFilter — one " +
       "cell dir read out of k") {
    val dir = builtDir("semprune")
    val probe = vecOf(1L)
    val read = SemanticDedupIndex.lookup(spark, dir, probe, 900000L)
    val plan = read.queryExecution.executedPlan.toString
    val pf = plan.split("PartitionFilters: ").lift(1)
      .map(_.takeWhile(_ != '\n'))
      .getOrElse(fail("no PartitionFilters in lookup plan"))
    assert(pf.contains("cluster"), s"probe cell not in PartitionFilters: $pf")
    read.queryExecution.toRdd.foreach(_ => ())
    val numFiles = read.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    // the build repartitions on the partition key → one file per cell;
    // the probe touches exactly one cell
    assert(numFiles == 1,
      s"probe read $numFiles files — pruning to the probe cell failed")
  }

  test("pairsAgainst equals recompute-from-scratch assignment on both " +
       "sides (the index changes WHERE cells come from, never WHICH), " +
       "is a broadcast join building the delivery, and prunes the index " +
       "read to the delivery's cells") {
    val dir = builtDir("sempairs")
    val delivery = DedupQueries.semanticDelivery(spark, sf)
    val pairs = SemanticDedupIndex.pairsAgainst(spark, dir, delivery,
      "vec_id", "v", 900000L)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildRight"),
      "delivery-vs-index join is not a broadcast hash join building the " +
        "delivery")
    val pf = plan.split("PartitionFilters: ").lift(1)
      .map(_.takeWhile(_ != '\n')).getOrElse("")
    assert(pf.contains("cluster"),
      s"index read not pruned by the delivery's cells: $pf")
    val viaIndex = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // scratch: assign corpus and delivery independently with the same
    // centroids, join on the cell, score, threshold
    val c = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val casg = c.join(Ann.argminAssign(c, "vec_id", "v", cents,
      "cid", "cv"), "vec_id")
    val dasg = delivery.join(Ann.argminAssign(delivery, "vec_id", "v",
      cents, "cid", "cv"), "vec_id")
    val scratch = dasg.select(col("cluster"), col("vec_id").as("d"),
        col("v").as("dv"))
      .join(casg.select(col("cluster"), col("vec_id").as("c"),
        col("v").as("cv2")), Seq("cluster"))
      .withColumn("score_micro",
        floor(VectorOps.cosine(col("cv2"), col("dv")) * 1e6 + lit(0.5))
          .cast("long"))
      .filter(col("score_micro") >= 900000L)
      .select(col("d"), col("c"), col("score_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex == scratch)
    assert(viaIndex.nonEmpty)
  }

  test("oversized delivery: past the broadcast bound pairsAgainst " +
       "downgrades to a shuffle join with identical rows") {
    val dir = builtDir("semoversz")
    val delivery = DedupQueries.semanticDelivery(spark, sf)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val small = SemanticDedupIndex.pairsAgainst(spark, dir, delivery,
        "vec_id", "v", 900000L)
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "in-bound delivery lost its deterministic broadcast hint")
      val smallRows = small.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.conf.set("graft.dedup.semanticBroadcastMaxRows", "0")
      try {
        val big = SemanticDedupIndex.pairsAgainst(spark, dir, delivery,
          "vec_id", "v", 900000L)
        assert(!big.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "row bound did not downgrade the broadcast")
        assert(big.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          == smallRows)
      } finally spark.conf.unset("graft.dedup.semanticBroadcastMaxRows")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("append assigns only the new points under the PINNED centroids " +
       "and the memoized serving read sees them (eviction contract); " +
       "the appended layout equals a from-scratch build over the union") {
    val dir = tmp("semappend")
    val first = corpus.filter(col("vec_id") % 2 === 0)
    val second = corpus.filter(col("vec_id") % 2 === 1)
    SemanticDedupIndex.build(spark, first, "vec_id", "embedding", dir, cents)
    val probeId = second.agg(min("vec_id")).head().getLong(0)
    val probe = vecOf(probeId)
    // warm the memo BEFORE the append — this lookup must miss
    assert(SemanticDedupIndex.lookup(spark, dir, probe, 999999L).isEmpty)
    SemanticDedupIndex.append(spark, second, "embedding", dir)
    val got = SemanticDedupIndex.lookup(spark, dir, probe, 999999L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.get(probeId).contains(1000000L), s"append+lookup got $got")
    // layout equality: append under pinned artifacts == one full build
    val full = tmp("semappend_full")
    SemanticDedupIndex.build(spark, corpus, "vec_id", "embedding", full,
      cents)
    def rows(d: String): Set[(Long, Long)] = spark.read.parquet(d)
      .select(col("vec_id"), col("cluster").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(dir) == rows(full),
      "appended layout diverged from the from-scratch build")
    assert(SemanticDedupIndex.geometry(dir) ==
      SemanticDedupIndex.geometry(full))
  }

  test("loud failures: reserved column, missing pinned id column on " +
       "append, probe dimension mismatch") {
    val dir = builtDir("semloud")
    intercept[IllegalArgumentException] {
      SemanticDedupIndex.build(spark,
        corpus.withColumn("cluster", lit(1)), "vec_id", "embedding",
        tmp("semloud2"), cents)
    }
    intercept[IllegalArgumentException] {
      SemanticDedupIndex.append(spark,
        corpus.withColumnRenamed("vec_id", "other_id"), "embedding", dir)
    }
    intercept[IllegalArgumentException] {
      SemanticDedupIndex.lookup(spark, dir, Seq(1.0, 2.0), 900000L)
    }
  }
}
