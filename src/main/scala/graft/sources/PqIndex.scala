package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pq

/** Materialized PRODUCT-QUANTIZATION codes sidecar — [[QuantIndex]]'s
  * sibling for the PQ family (FAISS's IVFADC storage layout: the codes
  * table IS what an ADC pass scans; the public design this engine's
  * `v_pq_search`/`ann_ivfpq` compute in-plan). Without it the ADC stage
  * reads the full vector column to encode per query — the ~m·log₂k bits
  * per vector that make PQ the densest compression in the family never
  * pay off as IO. With it, the collection-wide ADC pass scans ONLY
  * `(id, codes ARRAY<INT>)` — m small ints per row — and the scan's
  * `ReadSchema` is spec-asserted vector-free.
  *
  * Unlike SQ/BQ codes (pure functions of the vector), PQ codes depend
  * on TRAINED codebooks, so the build PINS its codebooks inside the
  * layout (`_codebooks/` parquet + geometry in `_pq_index.json` — the
  * [[GraphIndex.Params]] discipline): [[refresh]] encodes changed rows
  * with the PINNED codebooks, never retrains, and refresh == rebuild
  * holds bit-exactly against a rebuild with the same codebooks
  * (spec-gated). Retraining is a NEW index build — the same contract as
  * re-clustering an IVF layout.
  *
  * {{{
  * pqDir/
  *   _pq_index.json               {"id_col","vec_col","m","sub_dim","k"}
  *   _codebooks/part-….parquet    (sub, cid, i, c_micro)
  *   src_bucket=b/part-….parquet  (id, codes ARRAY<INT>)
  * }}}
  *
  * Serving ([[adcTopN]]): the query's m×k integer LUT is a plan
  * literal; per row the ADC distance is m `element_at` lookups summed —
  * a narrow codegen pass ending in a bounded top-n heap. The exact
  * rescore stage fetches only the survivors' full vectors by literal id
  * probe (the [[QuantIndex]] serving shape).
  */
object PqIndex {

  private def metaPath(dir: String) = Paths.get(dir, "_pq_index.json")

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

  /** The PINNED codebooks, read back in [[Pq.trainCodebooks]]'s shape:
    * per subspace, (cid → micro-centroid) ordered by cid. */
  def codebooksOf(spark: SparkSession, dir: String)
      : Array[Array[(Long, Array[Long])]] =
    readCodebooks(spark, dir, metaOf(dir).m)

  /** Shared `_codebooks/` reader — [[IvfPqIndex]] pins the same layout
    * beside its cluster-partitioned codes. */
  private[sources] def readCodebooks(spark: SparkSession, dir: String,
                                     m: Int)
      : Array[Array[(Long, Array[Long])]] = {
    val rows = ServedReads.of(spark, s"$dir/_codebooks")
      .select("sub", "cid", "i", "c_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    (0 until m).map { sub =>
      rows.filter(_._1 == sub).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (cid, cells) =>
          (cid, cells.sortBy(_._3).map(_._4))
        }.toArray
    }.toArray
  }

  /** Shared `_codebooks/` writer (long format — the [[codebooksOf]]
    * round-trip's exact inverse). */
  private[sources] def writeCodebooks(spark: SparkSession, dir: String,
      cbs: Array[Array[(Long, Array[Long])]]): Unit = {
    import spark.implicits._
    cbs.zipWithIndex.flatMap { case (cb, sub) =>
      cb.flatMap { case (cid, cm) =>
        cm.zipWithIndex.map { case (c, i) =>
          (sub.toLong, cid, i.toLong, c)
        }
      }
    }.toSeq.toDF("sub", "cid", "i", "c_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_codebooks")
  }

  /** The codes projection — ONE definition shared by build and refresh
    * (identical integer argmin per subspace as the in-plan
    * [[Pq.codeCol]], so a sidecar read can never change a row). */
  private def codesOf(points: DataFrame, mt: Meta,
                      cbs: Array[Array[(Long, Array[Long])]]): DataFrame = {
    val vm = Pq.vmicro(col(mt.vecCol))
    val codeCols = (0 until mt.m).map(sub =>
      Pq.codeCol(vm, cbs(sub), sub, mt.subDim).cast("int"))
    points.select(col(mt.idCol), array(codeCols: _*).as("codes"))
  }

  /** Materialize the sidecar from a points frame with the given trained
    * codebooks (pinned into the layout). */
  def build(points: DataFrame, idCol: String, vecCol: String,
            cbs: Array[Array[(Long, Array[Long])]], subDim: Int,
            dir: String,
            idBuckets: Int = Collections.DefaultBuckets): Unit = {
    val spark = points.sparkSession
    val mt = Meta(idCol, vecCol, cbs.length, subDim,
      cbs.headOption.map(_.length).getOrElse(0))
    codesOf(points, mt, cbs)
      .withColumn("src_bucket", Collections.bucketOf(idCol, idBuckets))
      .write.mode("overwrite").partitionBy("src_bucket").parquet(dir)
    writeCodebooks(spark, dir, cbs)
    // meta LAST: its presence claims a complete live index
    writeMeta(dir, mt)
    ServedReads.evict(dir)
  }

  /** Materialize FROM a collection; returns the manifest cursor. */
  def buildFromCollection(spark: SparkSession, collDir: String,
                          indexDir: String, idCol: String, vecCol: String,
                          cbs: Array[Array[(Long, Array[Long])]],
                          subDim: Int): Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    build(Collections.read(spark, collDir), idCol, vecCol, cbs, subDim,
      indexDir, Collections.numBuckets(collDir))
    cur
  }

  /** The sidecar rows (id, codes) — layout columns dropped. */
  def read(spark: SparkSession, dir: String): DataFrame =
    ServedReads.of(spark, dir).drop("src_bucket")

  /** Stage-1 ADC prefilter over the STORED codes: the query's m×k
    * integer distance LUT rides as a plan literal; per row the ADC sum
    * is m element_at lookups — the scan reads (id, codes) only,
    * ending in a bounded top-`n` heap by (adc ASC, id ASC). `queryMicro`
    * is the micro-quantized query vector ([[Pq.microQ]] per element). */
  def adcTopN(spark: SparkSession, dir: String, queryMicro: Array[Long],
              n: Int): DataFrame = {
    val mt = metaOf(dir)
    require(queryMicro.length == mt.m * mt.subDim,
      s"query dim ${queryMicro.length} != ${mt.m}·${mt.subDim}")
    val cbs = codebooksOf(spark, dir)
    val lut: Array[Array[Long]] = cbs.zipWithIndex.map { case (cb, sub) =>
      cb.map { case (_, cm) =>
        Pq.distInt(
          queryMicro.slice(sub * mt.subDim, (sub + 1) * mt.subDim), cm)
      }
    }
    val adc = (0 until mt.m).map { sub =>
      element_at(typedLit(lut(sub).toSeq),
        col("codes")(sub).cast("int") + lit(1))
    }.reduce(_ + _)
    read(spark, dir)
      .withColumn("adc", adc)
      .orderBy(asc("adc"), col(mt.idCol))
      .limit(n)
  }

  /** Incremental refresh from the change feed — the staged-swap
    * contract ([[PayloadIndex.refresh]] verbatim), encoding changed rows
    * with the PINNED codebooks. */
  def refresh(spark: SparkSession, collDir: String, indexDir: String,
              prev: Collections.ManifestView): Collections.ManifestView = {
    val mt = metaOf(indexDir)
    val cbs = codebooksOf(spark, indexDir)
    Collections.stagedBucketRefresh(spark, collDir, indexDir, prev,
      Seq("src_bucket")) { changed =>
      codesOf(changed, mt, cbs).withColumn("src_bucket",
        Collections.bucketOf(mt.idCol, Collections.numBuckets(collDir)))
    }
  }

  /** Staged RETRAIN (the [[Drift]] maintenance verb): fresh codebooks
    * trained from the current collection with the caller's trainer (the
    * function the original build used), whole sidecar re-encoded into
    * staging, swapped. [[refresh]] continues from the returned cursor
    * with the NEW pinned codebooks. */
  def retrain(spark: SparkSession, collDir: String, indexDir: String,
              idCol: String, vecCol: String,
              trainCodebooks: DataFrame => Array[Array[(Long, Array[Long])]],
              subDim: Int): Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    val pts = Collections.read(spark, collDir)
    val cbs = trainCodebooks(pts)
    Drift.stagedRebuild(indexDir) { staging =>
      build(pts, idCol, vecCol, cbs, subDim, staging,
        Collections.numBuckets(collDir))
      snapshotDistortion(staging, pts, metaOf(staging), cbs)
    }
    cur
  }

  /** The PQ-NATIVE drift fingerprint: per point, the SUM over subspaces
    * of the L2 distance (micro space — [[Pq.vmicro]]'s integer lattice,
    * where the codebooks live) from the sub-vector to its nearest
    * pinned codeword — exactly the quantity PQ encoding minimizes, so
    * rising totals mean the codebooks stop covering the data (the
    * coarse-centroid assignment sketch's law, in the layout's own
    * geometry). Same bounded HDR shape as [[Drift.assignmentSketch]]:
    * one fused-kernel pass, ≤ 7.3k rows out, per-row contract. */
  private def distortionSketch(points: DataFrame, mt: Meta,
      cbs: Array[Array[(Long, Array[Long])]]): DataFrame = {
    val vm = Pq.vmicro(col(mt.vecCol)).cast("array<double>")
    val subDists = (0 until mt.m).map { sub =>
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.MinCellDistExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(
            slice(vm, sub * mt.subDim + 1, mt.subDim)),
          cbs(sub).map(_._2.map(_.toDouble).toSeq).toSeq))
    }
    points
      .select(subDists.reduce(_ + _).as("__d"))
      .filter(col("__d").isNotNull)
      .select(graft.operators.Hdr.bucket(
        floor(col("__d") + lit(0.5)).cast("long")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  private def snapshotDistortion(indexDir: String, points: DataFrame,
      mt: Meta, cbs: Array[Array[(Long, Array[Long])]]): Unit = {
    distortionSketch(points, mt, cbs)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/_drift")
    ()
  }

  /** Persist the build-time distortion baseline under the PINNED
    * codebooks (call after [[build]] when maintenance is wanted;
    * [[retrain]] refreshes it automatically). */
  def snapshotDrift(spark: SparkSession, collDir: String,
                    indexDir: String): Unit = {
    val mt = metaOf(indexDir)
    snapshotDistortion(indexDir, Collections.read(spark, collDir), mt,
      codebooksOf(spark, indexDir))
  }

  /** The drift signal: current-collection 0.9-quantile PQ distortion
    * under the PINNED codebooks over the pinned build-time quantile —
    * exactly 1.0 on unchanged data ([[Drift.assignmentRatio]]'s
    * contract in the PQ geometry). */
  def driftRatio(spark: SparkSession, collDir: String, indexDir: String,
                 q: Double = 0.9): Double = {
    require(Files.isDirectory(Paths.get(indexDir, "_drift")),
      s"no drift snapshot at $indexDir/_drift — call snapshotDrift " +
        "after build")
    val mt = metaOf(indexDir)
    val now = Drift.quantileUpper(
      distortionSketch(Collections.read(spark, collDir), mt,
        codebooksOf(spark, indexDir)), q)
    val pinned = Drift.quantileUpper(
      spark.read.parquet(s"$indexDir/_drift"), q)
    if (pinned == 0L) (if (now == 0L) 1.0 else Double.PositiveInfinity)
    else now.toDouble / pinned.toDouble
  }

  /** ONE-CALL maintenance ([[Drift.maintain]]): evaluate [[driftRatio]],
    * [[retrain]] past `threshold`, no-op otherwise (layout bytes
    * untouched). Returns the signal and, iff it fired, the fresh
    * cursor. */
  def maintain(spark: SparkSession, collDir: String, indexDir: String,
               trainCodebooks: DataFrame => Array[Array[(Long, Array[Long])]],
               threshold: Double = Drift.DefaultThreshold)
      : (Drift.MaintainResult, Option[Collections.ManifestView]) = {
    val mt = metaOf(indexDir)
    var out: Option[Collections.ManifestView] = None
    val res = Drift.maintain(threshold)(
      driftRatio(spark, collDir, indexDir)) {
      out = Some(retrain(spark, collDir, indexDir, mt.idCol, mt.vecCol,
        trainCodebooks, mt.subDim))
    }
    (res, out)
  }
}
