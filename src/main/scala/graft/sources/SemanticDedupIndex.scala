package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Ann

/** Persisted SemDeDup cell index over an embedding corpus — the semantic
  * twin of the MinHash [[DedupIndex]]: the 100 TB serving law is the
  * same ("the corpus is processed ONCE and every later delivery reads
  * the stored form"), but the candidate structure is the published
  * SemDeDup one (Abbas et al. 2023) — k-means cells over the embedding
  * space, pair search only within a cell — instead of LSH bands. The
  * reference delegates all vector storage/search to its backing store
  * (`bob_vector_db/qdrant_embedder.py:92-103` creates the collection and
  * lets Qdrant hold the index); this is the engine-native layout that
  * delegation implies for the semantic-dedup serving path.
  *
  * Layout: one row per (id, v) parquet-partitioned by `cluster` (the
  * assigned cell under the PINNED centroids), one exchange on the
  * partition key at build so each cell dir holds one file per write
  * generation (the `Collections.compact` small-files discipline). The
  * trained centroids are pinned INSIDE the layout (`_centroids/` — the
  * PqIndex `_codebooks` discipline): [[append]] assigns new points with
  * the build-time artifacts, never retrains, so an appended row can
  * never disagree with the corpus rows on cell shape (retraining is a
  * rebuild, the [[Drift]] maintenance contract).
  *
  * Serving verbs, both reading through [[ServedReads]]:
  *   - [[pairsAgainst]] (delivery-vs-corpus): the delivery is assigned
  *     in flight (broadcast of the k·dim pinned centroids — the
  *     [[Ann.argminAssign]] shape, no corpus shuffle) and its distinct
  *     cells become a literal `cluster IN (...)` partition filter on the
  *     index read, so a delivery touching c cells reads c dirs of k.
  *     The delivery side is broadcast when small (the
  *     [[DedupIndex.pairsAgainst]] bound discipline, sized down for
  *     64-dim vector rows); an oversized re-delivery downgrades to the
  *     shuffle join it genuinely needs instead of OOMing the driver.
  *   - [[lookup]] (single-vector probe): the probe's cell is computed
  *     DRIVER-SIDE against the memoized pinned centroids (zero jobs —
  *     the `Dedup.minhashLocal` twin discipline; the argmin is the
  *     bit-identical (distance, cid) tie-break of the distributed
  *     assignment), so the one job carries a literal `cluster =`
  *     PartitionFilter — ONE cell dir read out of k — with the cosine
  *     verify fused in-row.
  * Ids present in both the delivery and the corpus pair with themselves
  * like any other cell-mates — the re-delivery case is the point.
  */
object SemanticDedupIndex {

  /** Reserved layout column name — inputs must not carry it. */
  private val Reserved = "cluster"

  /** Past this many delivery rows the delivery is no longer "the small
    * side": vector rows are ~dim·8 bytes each, so the broadcast bound
    * sits far under [[DedupIndex.BroadcastMaxBandRows]] (200k 64-dim
    * rows ≈ 100 MB). Override per session via
    * `graft.dedup.semanticBroadcastMaxRows`. */
  val BroadcastMaxRows = 200000L

  /** Past this many distinct delivery cells the literal IN prune is
    * dropped (the scan is near-full anyway) and the join runs unpruned. */
  val MaxLiteralCells = 256

  private def metaPath(dir: String) =
    Paths.get(dir, "_semantic_index.json")

  final case class Geometry(idCol: String, k: Int, dim: Int)

  def geometry(dir: String): Geometry = {
    val txt = new String(Files.readAllBytes(metaPath(dir)),
      StandardCharsets.UTF_8)
    def num(k: String): Int = (s""""$k":\\s*(\\d+)""").r
      .findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(
        s"semantic index at $dir has no $k in metadata"))
      .group(1).toInt
    val idCol = """"id_col":\s*"([^"]+)"""".r.findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(
        s"semantic index at $dir has no id_col in metadata"))
      .group(1)
    Geometry(idCol, num("k"), num("dim"))
  }

  private def writeMeta(dir: String, g: Geometry): Unit = {
    Files.write(metaPath(dir),
      (s"""{"id_col": "${g.idCol}", "k": ${g.k}, "dim": ${g.dim}}""")
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Driver-side pinned centroids, memoized per layout dir (k·dim
    * doubles — the same driver bound as kmeansFit's own result table).
    * Invalidated by [[build]]; [[append]] never changes artifacts. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, Array[(Long, Seq[Double])]]()

  private def pinnedCentroidsLocal(spark: SparkSession, dir: String)
      : Array[(Long, Seq[Double])] =
    centroidCache.computeIfAbsent(dir, _ =>
      ServedReads.of(spark, dir + "/_centroids")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1))

  /** The pinned centroid table (cid, cv) as a DataFrame. */
  def pinnedCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pinnedCentroidsLocal(spark, dir).toSeq.toDF("cid", "cv")
  }

  /** (id, v, cluster) rows under the pinned artifacts — the one
    * assignment definition build, append and the delivery side of
    * [[pairsAgainst]] all share. */
  private def assigned(points: DataFrame, idCol: String, vecCol: String,
                       centroids: DataFrame): DataFrame = {
    require(!points.columns.contains(Reserved),
      s"input carries a column named '$Reserved' — reserved for the layout")
    val pts = points.select(col(idCol),
      col(vecCol).cast("array<double>").as("v"))
    pts.join(Ann.argminAssign(pts, idCol, "v", centroids, "cid", "cv"),
      idCol)
  }

  /** Materialize the cell index: assign every corpus point to its
    * nearest centroid and write partitioned by cell, with the centroids
    * pinned inside the layout. `centroids` is the caller's trained
    * (cid, cv) table — training stays the caller's (the IvfIndex
    * contract), persistence is ours. */
  def build(spark: SparkSession, points: DataFrame, idCol: String,
            vecCol: String, dir: String, centroids: DataFrame): Unit = {
    ServedReads.evict(dir)
    centroidCache.remove(dir)
    val cents = centroids.select(col("cid").cast("long").as("cid"),
      col("cv").cast("array<double>").as("cv"))
    assigned(points, idCol, vecCol, cents)
      .repartition(col("cluster"))
      .write.mode("overwrite")
      .partitionBy("cluster")
      .parquet(dir)
    // artifacts and metadata land AFTER the data write (overwrite deletes
    // the target first; metadata without data would claim a live index)
    cents.repartition(1).write.mode("overwrite")
      .parquet(dir + "/_centroids")
    val local = pinnedCentroidsLocal(spark, dir)
    writeMeta(dir, Geometry(idCol, local.length, local.head._2.length))
    ServedReads.evict(dir)
  }

  /** Incremental maintenance: assign ONLY the new points under the
    * pinned centroids and append into their cell dirs. The corpus is
    * never re-read or re-assigned. */
  def append(spark: SparkSession, points: DataFrame, vecCol: String,
             dir: String): Unit = {
    val g = geometry(dir)
    require(points.columns.contains(g.idCol),
      s"append input has no '${g.idCol}' column (pinned id_col of $dir)")
    ServedReads.evict(dir)
    assigned(points, g.idCol, vecCol, pinnedCentroids(spark, dir))
      .repartition(col("cluster"))
      .write.mode("append")
      .partitionBy("cluster")
      .parquet(dir)
    ServedReads.evict(dir)
  }

  private def scoreMicro(a: Column, b: Column): Column =
    floor(VectorOps.cosine(a, b) * 1e6 + lit(0.5)).cast("long")

  /** Delivery-vs-corpus near-duplicate pairs: every (delivery id,
    * corpus id) sharing a cell with cosine ≥ tauMicro/1e6. One bounded
    * job assigns the delivery and folds its per-cell counts (≤
    * min(k, |delivery|) rows; collected only up to [[MaxLiteralCells]]
    * — past that the prune is dropped, never an unbounded collect); the
    * cells become a literal IN partition filter and the same counts
    * decide broadcast-vs-shuffle for the join. Output:
    * (delivery_id, corpus_id, score_micro). */
  def pairsAgainst(spark: SparkSession, dir: String, delivery: DataFrame,
                   idCol: String, vecCol: String,
                   tauMicro: Long): DataFrame = {
    val g = geometry(dir)
    val del = assigned(
      delivery.select(col(idCol).as("delivery_id"), col(vecCol)),
      "delivery_id", vecCol, pinnedCentroids(spark, dir))
      .withColumnRenamed("v", "dv")
    val cells = del.groupBy("cluster").count()
      .limit(MaxLiteralCells + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val idx = ServedReads.of(spark, dir)
    val pruned =
      if (cells.length > MaxLiteralCells) idx
      else idx.filter(col("cluster").isin(cells.map(_._1): _*))
    val delRows =
      if (cells.length > MaxLiteralCells) del.count()
      else cells.map(_._2).sum
    val maxBroadcast = spark.conf
      .getOption("graft.dedup.semanticBroadcastMaxRows")
      .map(_.toLong).getOrElse(BroadcastMaxRows)
    val right = if (delRows <= maxBroadcast) broadcast(del) else del
    pruned
      .join(right, Seq("cluster"))
      .withColumn("score_micro", scoreMicro(col("v"), col("dv")))
      .filter(col("score_micro") >= tauMicro)
      .select(col("delivery_id"), col(g.idCol).as("corpus_id"),
        col("score_micro"))
  }

  /** Driver-side cell of one probe vector — the bit-identical local twin
    * of the distributed argmin: same sequential squared-diff sum, same
    * final sqrt, same (distance, cid) tie-break as [[VectorOps.l2]] under
    * [[Ann.argminAssign]] (the `Dedup.minhashLocal` twin discipline —
    * spec pins equality against the distributed assignment). Zero Spark
    * jobs once the centroid memo is warm. */
  def probeCell(spark: SparkSession, dir: String,
                vec: Seq[Double]): Long = {
    val cents = pinnedCentroidsLocal(spark, dir)
    require(cents.nonEmpty, s"semantic index at $dir has no centroids")
    cents.map { case (cid, cv) =>
      var d = 0.0
      var i = 0
      while (i < vec.length) {
        val t = vec(i) - cv(i); d += t * t; i += 1
      }
      (math.sqrt(d), cid)
    }.min._2
  }

  /** Single-vector probe: which corpus points share the probe's cell
    * with cosine ≥ tauMicro/1e6, through ONE literal-cluster
    * PartitionFilter read (one cell dir of k). Output:
    * (id_col, score_micro). */
  def lookup(spark: SparkSession, dir: String, vec: Seq[Double],
             tauMicro: Long): DataFrame = {
    val g = geometry(dir)
    require(vec.length == g.dim,
      s"probe vector has ${vec.length} dims, index pinned ${g.dim}")
    val cell = probeCell(spark, dir, vec)
    ServedReads.of(spark, dir)
      .filter(col("cluster") === cell)
      .withColumn("score_micro",
        scoreMicro(col("v"), lit(vec.toArray)))
      .filter(col("score_micro") >= tauMicro)
      .select(col(g.idCol), col("score_micro"))
  }
}
