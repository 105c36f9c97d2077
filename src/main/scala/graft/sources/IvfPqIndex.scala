package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Pq}

/** Materialized IVF+PQ layout — the composed production ANN index (the
  * published FAISS IVFADC construction as a STORAGE layout, which
  * `ann_ivfpq` runs in-plan): PQ codes partitioned by the IVF cell, so a
  * query's nprobe-cluster probe becomes PARTITION PRUNING at file listing
  * and the integer ADC pass scans only the probed cells' `(id, codes)`
  * files — never the vector column (ReadSchema spec-asserted), never the
  * unprobed ~1−nprobe/k of the corpus. At 100 TB this is the serving
  * shape's whole point: stage-1 bytes ≈ (nprobe/k) · (m small ints per
  * row), vs the full float column for the in-plan form.
  *
  * Both trained artifacts are PINNED inside the layout (the
  * [[PqIndex]]/[[GraphIndex.Params]] discipline): `_centroids/` (the IVF
  * coarse quantizer) and `_codebooks/` (the PQ subspace codebooks —
  * [[PqIndex]]'s exact format, shared reader/writer). [[refresh]]
  * re-assigns and re-encodes changed rows with the pinned artifacts,
  * never retrains; refresh == rebuild-with-same-artifacts holds bit-
  * exactly (spec-gated). Re-training either artifact is a NEW index
  * build, the same contract as re-clustering an IVF layout.
  *
  * {{{
  * dir/
  *   _ivfpq_index.json            {"id_col","vec_col","m","sub_dim","k"}
  *   _centroids/part-….parquet    (cid BIGINT, cv ARRAY<DOUBLE>)
  *   _codebooks/part-….parquet    (sub, cid, i, c_micro)
  *   src_bucket=b/cluster=c/….parquet  (id, codes ARRAY<INT>)
  * }}}
  *
  * `src_bucket` outermost keeps the refresh/swap unit the collection's
  * id-hash bucket ([[IvfIndex]]'s layout exactly — Spark prunes on ANY
  * partition column, not just the outermost, so `cluster=` pruning works
  * unchanged); a vector whose re-assignment MOVES it between clusters is
  * handled for free, because the whole touched src_bucket dir is swapped.
  *
  * Serving ([[adcTopN]]): probe the nprobe nearest pinned centroids
  * (driver-side — k·dim doubles), list only those `cluster=` partitions,
  * ADC-score the stored codes against the query's m×k integer LUT (a
  * plan literal — no join), bounded top-n heap. The exact rescore stage
  * is the caller's literal-id probe ([[QuantIndex]]'s serving shape).
  */
object IvfPqIndex {

  private def metaPath(dir: String) = Paths.get(dir, "_ivfpq_index.json")

  final case class Meta(idCol: String, vecCol: String, m: Int,
                        subDim: Int, k: Int)

  private def writeMeta(dir: String, mt: Meta): Unit = {
    require(!mt.idCol.contains("\"") && !mt.vecCol.contains("\""),
      "column names must not contain quotes")
    Files.createDirectories(Paths.get(dir))
    Files.write(metaPath(dir),
      (s"""{"id_col": "${mt.idCol}", "vec_col": "${mt.vecCol}", """ +
        s""""m": ${mt.m}, "sub_dim": ${mt.subDim}, "k": ${mt.k}}""")
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  def metaOf(dir: String): Meta = {
    val txt = new String(Files.readAllBytes(metaPath(dir)),
      StandardCharsets.UTF_8)
    def str(kk: String): String =
      (""""""" + kk + """":\s*"([^"]+)"""").r.findFirstMatchIn(txt)
        .get.group(1)
    def int(kk: String): Int =
      (""""""" + kk + """":\s*(\d+)""").r.findFirstMatchIn(txt)
        .get.group(1).toInt
    Meta(str("id_col"), str("vec_col"), int("m"), int("sub_dim"),
      int("k"))
  }

  /** The pinned IVF coarse centroids, in [[Ann.probeClusters]]'s input
    * shape (cid, cv). */
  def centroidsOf(spark: SparkSession, dir: String): DataFrame =
    ServedReads.of(spark, s"$dir/_centroids").select("cid", "cv")

  /** The pinned PQ codebooks ([[PqIndex.codebooksOf]]'s shape). */
  def codebooksOf(spark: SparkSession, dir: String)
      : Array[Array[(Long, Array[Long])]] =
    PqIndex.readCodebooks(spark, dir, metaOf(dir).m)

  /** The written row set — ONE definition shared by build and refresh:
    * cluster from the pinned-centroid argmin (identical L2/tie contract
    * as the in-plan `ann_ivfpq` assignment), codes from the pinned
    * codebooks (identical integer argmin as [[Pq.codeCol]]). */
  private def rowsOf(points: DataFrame, mt: Meta, centroids: DataFrame,
                     cbs: Array[Array[(Long, Array[Long])]],
                     numBuckets: Int): DataFrame = {
    val vm = Pq.vmicro(col(mt.vecCol))
    val codeCols = (0 until mt.m).map(sub =>
      Pq.codeCol(vm, cbs(sub), sub, mt.subDim).cast("int"))
    points
      .join(Ann.argminAssign(points, mt.idCol, mt.vecCol, centroids,
        "cid", "cv"), mt.idCol)
      .select(col(mt.idCol), array(codeCols: _*).as("codes"),
        col("cluster"),
        Collections.bucketOf(mt.idCol, numBuckets).as("src_bucket"))
  }

  /** Materialize the layout from a points frame, pinning the trained
    * centroids and codebooks beside the codes. */
  def build(points: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame,
            cbs: Array[Array[(Long, Array[Long])]], subDim: Int,
            dir: String,
            idBuckets: Int = Collections.DefaultBuckets): Unit = {
    val spark = points.sparkSession
    val mt = Meta(idCol, vecCol, cbs.length, subDim,
      cbs.headOption.map(_.length).getOrElse(0))
    rowsOf(points, mt, centroids, cbs, idBuckets)
      .write.mode("overwrite").partitionBy("src_bucket", "cluster")
      .parquet(dir)
    centroids.select(col("cid").cast("long").as("cid"),
        col("cv").cast("array<double>").as("cv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_centroids")
    PqIndex.writeCodebooks(spark, dir, cbs)
    // meta LAST: its presence claims a complete live index
    writeMeta(dir, mt)
    ServedReads.evict(dir)
  }

  /** Materialize FROM a collection; returns the manifest cursor. */
  def buildFromCollection(spark: SparkSession, collDir: String,
                          indexDir: String, idCol: String, vecCol: String,
                          centroids: DataFrame,
                          cbs: Array[Array[(Long, Array[Long])]],
                          subDim: Int): Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    build(Collections.read(spark, collDir), idCol, vecCol, centroids, cbs,
      subDim, indexDir, Collections.numBuckets(collDir))
    cur
  }

  /** Staged RETRAIN (the [[Drift]] maintenance verb — [[IvfIndex
    * .retrain]]'s contract for this layout): fresh centroids AND
    * codebooks trained from the current collection with the caller's
    * trainers (the functions the original build used), whole layout
    * rebuilt into staging, swapped, new drift sketch snapshotted. The
    * retrained layout pins the NEW artifacts beside the codes exactly
    * as [[build]] does, so [[refresh]] continues unchanged from the
    * returned cursor. */
  def retrain(spark: SparkSession, collDir: String, indexDir: String,
              idCol: String, vecCol: String,
              trainCentroids: DataFrame => DataFrame,
              trainCodebooks: DataFrame => Array[Array[(Long, Array[Long])]],
              subDim: Int): Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    val pts = Collections.read(spark, collDir)
    val cents = trainCentroids(pts)
    val cbs = trainCodebooks(pts)
    Drift.stagedRebuild(indexDir) { staging =>
      build(pts, idCol, vecCol, cents, cbs, subDim, staging,
        Collections.numBuckets(collDir))
      Drift.snapshotAssignment(staging, pts, vecCol, cents)
    }
    cur
  }

  /** Persist the build-time drift baseline under the layout's PINNED
    * coarse centroids (call after [[build]] when maintenance is wanted;
    * [[retrain]] refreshes it automatically — the
    * [[SemanticDedupIndex]].snapshotDrift contract). */
  def snapshotDrift(spark: SparkSession, collDir: String,
                    indexDir: String): Unit = {
    val mt = metaOf(indexDir)
    Drift.snapshotAssignment(indexDir, Collections.read(spark, collDir),
      mt.vecCol, centroidsOf(spark, indexDir))
  }

  /** ONE-CALL maintenance ([[Drift.maintain]]): signal of the CURRENT
    * collection under the layout's PINNED coarse centroids (read from
    * `_centroids/` — self-contained, unlike [[IvfIndex]] whose caller
    * holds them), [[retrain]] past `threshold`, no-op otherwise.
    * Returns the signal and, iff it fired, the fresh cursor. */
  def maintain(spark: SparkSession, collDir: String, indexDir: String,
               trainCentroids: DataFrame => DataFrame,
               trainCodebooks: DataFrame => Array[Array[(Long, Array[Long])]],
               threshold: Double = Drift.DefaultThreshold)
      : (Drift.MaintainResult, Option[Collections.ManifestView]) = {
    val mt = metaOf(indexDir)
    var out: Option[Collections.ManifestView] = None
    val res = Drift.maintain(threshold)(
      Drift.assignmentRatio(spark, indexDir,
        Collections.read(spark, collDir), mt.vecCol,
        centroidsOf(spark, indexDir))) {
      out = Some(retrain(spark, collDir, indexDir, mt.idCol, mt.vecCol,
        trainCentroids, trainCodebooks, mt.subDim))
    }
    (res, out)
  }

  /** The layout rows (id, codes, cluster) — the swap-unit column
    * dropped, the IVF cell kept (it is partition metadata — reading it
    * costs nothing and the declared queries surface it). */
  def read(spark: SparkSession, dir: String): DataFrame =
    ServedReads.of(spark, dir).drop("src_bucket")

  /** The query's nprobe nearest pinned centroids, collected driver-side
    * and returned as literal values — deliberately NOT a join, because
    * only literal predicates prune partitions statically at planning
    * time ([[Ann.ivfSearchIndexed]]'s contract). */
  def probe(spark: SparkSession, dir: String, query: Seq[Double],
            nprobe: Int): Seq[Any] =
    Ann.probeClusters(centroidsOf(spark, dir), "cid", "cv", query, nprobe)
      .collect().map(_.get(0)).toSeq

  /** Stage-1 IVFADC pass: prune to the probed `cluster=` partitions
    * (PartitionFilters — file-listing pruning), ADC-score the stored
    * codes against the query's m×k integer LUT (plan literal, m
    * element_at lookups per row), bounded top-`n` heap by
    * (adc ASC, id ASC). The scan's ReadSchema is (id, codes) — never
    * the vector column. */
  def adcTopN(spark: SparkSession, dir: String, query: Seq[Double],
              nprobe: Int, n: Int): DataFrame = {
    val mt = metaOf(dir)
    require(query.length == mt.m * mt.subDim,
      s"query dim ${query.length} != ${mt.m}·${mt.subDim}")
    val qm = query.map(Pq.microQ).toArray
    val cbs = codebooksOf(spark, dir)
    val lut: Array[Array[Long]] = cbs.zipWithIndex.map { case (cb, sub) =>
      cb.map { case (_, cm) =>
        Pq.distInt(qm.slice(sub * mt.subDim, (sub + 1) * mt.subDim), cm)
      }
    }
    val probed = probe(spark, dir, query, nprobe)
    val adc = (0 until mt.m).map { sub =>
      element_at(typedLit(lut(sub).toSeq),
        col("codes")(sub).cast("int") + lit(1))
    }.reduce(_ + _)
    read(spark, dir)
      .filter(col("cluster").isin(probed: _*))
      .withColumn("adc", adc)
      .orderBy(asc("adc"), col(mt.idCol))
      .limit(n)
  }

  /** BATCHED IVFADC stage 1 — N queries with a batch-size-independent
    * job budget: ONE probe job ranks every query's centroids (the
    * identical (L2 ASC, cid ASC) ordering as [[Ann.probeClusters]],
    * partitioned by query), ONE scan lists the UNION of the probed
    * `cluster=` partitions, and the broadcast (query, cluster) pair
    * frame replicates each row to exactly the queries that probed its
    * cell. Each pair ADC-scores through the query's OWN m×k literal LUT
    * (per-query CASE chain — the one-column-per-query rule), and the
    * bounded per-query heap keeps (adc ASC, id ASC), so each query's
    * rows equal its [[adcTopN]] result exactly (spec-gated). The CASE
    * arms and m×k LUT literals grow linearly with the batch (per-query
    * plan constants, not data) — sized for the public API's
    * handful-per-batch shape, CHECKED against
    * [[graft.operators.Knn.MaxBatchQueries]]. Returns
    * (query_id, id, adc). */
  def adcTopNMulti(spark: SparkSession, dir: String,
                   queries: Seq[(Long, Seq[Double])], nprobe: Int,
                   n: Int): DataFrame = {
    val mt = metaOf(dir)
    queries.foreach { case (qid, q) =>
      require(q.length == mt.m * mt.subDim,
        s"query $qid dim ${q.length} != ${mt.m}·${mt.subDim}") }
    // duplicate ids would merge heaps and mis-dispatch the CASE chain
    require(queries.map(_._1).distinct.length == queries.length,
      "adcTopNMulti: duplicate query ids in the batch")
    graft.operators.Knn.requireBatch(queries.length, "adcTopNMulti")
    val cbs = codebooksOf(spark, dir)
    import spark.implicits._
    val qdf = broadcast(queries.toDF("query_id", "__qv"))
    val probes: Map[Long, Seq[Long]] = centroidsOf(spark, dir)
      .crossJoin(qdf)
      .withColumn("__qd", graft.functions.VectorOps.l2(col("cv"),
        col("__qv")))
      .withColumn("__rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("__qd"), col("cid"))))
      .filter(col("__rnk") <= nprobe)
      .select(col("query_id"), col("cid").cast("long"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val luts: Seq[(Long, Array[Array[Long]], Seq[Long])] =
      queries.map { case (qid, q) =>
        val qm = q.map(Pq.microQ).toArray
        val lut = cbs.zipWithIndex.map { case (cb, sub) =>
          cb.map { case (_, cm) =>
            Pq.distInt(qm.slice(sub * mt.subDim, (sub + 1) * mt.subDim),
              cm) }
        }
        (qid, lut, probes.getOrElse(qid, Nil))
      }
    // the batched heap ranks through a Double; the worst-case ADC sum
    // is driver-known from the LUT literals, so exactness past 2^53 is
    // a checkable precondition, not a silent collapse of distinct longs
    // (the single-query adcTopN orders the exact BIGINT and has no
    // such bound)
    val maxAdc = luts.map(_._2.map(l => if (l.isEmpty) 0L else l.max)
      .sum).max
    require(maxAdc < (1L << 53),
      s"adcTopNMulti: worst-case ADC distance $maxAdc exceeds the " +
        "double-exact range — serve these magnitudes per query " +
        "(adcTopN ranks the exact BIGINT)")
    def adcExpr(lut: Array[Array[Long]]) =
      (0 until mt.m).map { sub =>
        element_at(typedLit(lut(sub).toSeq),
          col("codes")(sub).cast("int") + lit(1))
      }.reduce(_ + _)
    val scoreAdc = luts.foldRight(lit(null).cast("long")) {
      case ((qid, lut, _), acc) =>
        when(col("query_id") === qid, adcExpr(lut)).otherwise(acc)
    }
    val allClusters = luts.flatMap(_._3).distinct
    val pairDf = broadcast(
      luts.flatMap { case (qid, _, cl) => cl.map(c => (qid, c)) }
        .toDF("query_id", "__cl"))
    read(spark, dir)
      .filter(col("cluster").isin(allClusters: _*))
      .join(pairDf, col("cluster").cast("long") === col("__cl"))
      .withColumn("adc", scoreAdc)
      .groupBy("query_id")
      .agg(graft.plans.TopKByScore.topK((-col("adc")).cast("double"),
        col(mt.idCol).cast("long"), n).as("__tk"))
      .select(col("query_id"),
        posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e.id").as(mt.idCol),
        (-col("__e.score")).cast("long").as("adc"))
  }

  /** Incremental refresh from the change feed — the staged-swap contract
    * ([[IvfIndex.refresh]]'s partition scheme, [[PqIndex.refresh]]'s
    * pinned-artifact rule): changed buckets re-assigned with the PINNED
    * centroids and re-encoded with the PINNED codebooks. A vector that
    * moved cells lands in its new `cluster=` dir because the whole
    * src_bucket dir is replaced. */
  def refresh(spark: SparkSession, collDir: String, indexDir: String,
              prev: Collections.ManifestView): Collections.ManifestView = {
    val mt = metaOf(indexDir)
    val centroids = centroidsOf(spark, indexDir)
    val cbs = codebooksOf(spark, indexDir)
    Collections.stagedBucketRefresh(spark, collDir, indexDir, prev,
      Seq("src_bucket", "cluster"))(
      rowsOf(_, mt, centroids, cbs, Collections.numBuckets(collDir)))
  }
}
