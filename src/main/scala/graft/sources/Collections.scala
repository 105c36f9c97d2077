package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Collection storage layer — the engine's form of the reference's
  * collection DDL + sink surface:
  *
  *  - O12 `create_collection` iff absent with a fixed vector config
  *    (`bob_vector_db/qdrant_embedder.py:92-103`): a collection is a
  *    parquet directory plus a `_collection.json` metadata record pinning
  *    {dim, metric} — metric defaults to cosine exactly as the reference
  *    pins `Distance.COSINE` (`qdrant_embedder.py:98,101`).
  *  - O14 upsert (`upload_points`, same-id overwrite): append + keep-last
  *    compaction via the ingest-sequence window.
  *  - O17/O20 the abstract sink interface (`json_embedder.py:3-9`):
  *    [[CollectionSink]] with a single write(df) method.
  *  - Dim validation enforces the declared vector size on every write
  *    (the engine-level form of the collection's fixed vector config).
  *
  * Scale notes: a collection directory is a standard partitionable
  * parquet dataset (split-friendly, predicate-pushdown-friendly);
  * keep-last compaction is one hash shuffle on id; metadata is a tiny
  * sidecar file written once.
  */
object Collections {

  /** Fixed per-collection vector config (SURVEY.md §1.3). */
  final case class VectorConfig(dim: Int, metric: String = "cosine")

  private def metaPath(dir: String) = Paths.get(dir, "_collection.json")

  def exists(dir: String): Boolean = Files.exists(metaPath(dir))

  /** O12: create iff absent — records the vector config; no data yet. */
  def create(dir: String, config: VectorConfig): Unit =
    if (!exists(dir)) {
      Files.createDirectories(Paths.get(dir))
      Files.write(metaPath(dir),
        s"""{"dim": ${config.dim}, "metric": "${config.metric}"}"""
          .getBytes(StandardCharsets.UTF_8))
    }

  def config(dir: String): VectorConfig = {
    val txt = new String(Files.readAllBytes(metaPath(dir)),
      StandardCharsets.UTF_8)
    val dim = """"dim":\s*(\d+)""".r.findFirstMatchIn(txt).get.group(1).toInt
    val metric = """"metric":\s*"([^"]+)"""".r
      .findFirstMatchIn(txt).get.group(1)
    VectorConfig(dim, metric)
  }

  /** Dim-validation gate: rows whose vector violates the collection's
    * declared size are rejected (returned separately — the quarantine
    * analog of the reference's drop-on-error, upgraded to be observable). */
  def validate(points: DataFrame, vecCol: String, cfg: VectorConfig)
      : (DataFrame, DataFrame) = {
    val okCond = VectorOps.hasDim(col(vecCol), cfg.dim)
    (points.filter(okCond), points.filter(!okCond || col(vecCol).isNull))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    finally walk.close()
  }

  /** O14: append a batch, then compact to keep-last per id (Qdrant upsert
    * semantics — same id overwrites). `seqCol` orders versions.
    *
    * Single-writer swap protocol: compact into `.staging`, move `data` →
    * `.old`, move `.staging` → `data`, drop `.old`. A crash between the
    * two moves leaves `.old` as a complete backup, which the next upsert
    * (or read) restores — the collection is never lost, only at most the
    * crashed batch. */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
             idCol: String, seqCol: String): Unit = {
    recoverForWrite(dir)
    val dataDir = s"$dir/data"
    val merged =
      if (Files.exists(Paths.get(dataDir))) {
        val existing = spark.read.parquet(dataDir)
        existing.unionByName(batch)
      } else batch
    val compacted = graft.operators.Ingest.upsert(merged, idCol, seqCol)
    // stage then swap — parquet sources cannot overwrite their own input
    val staging = Paths.get(s"$dir/.staging")
    val old = Paths.get(s"$dir/.old")
    val target = Paths.get(dataDir)
    compacted.write.mode("overwrite").parquet(staging.toString)
    if (Files.exists(target)) Files.move(target, old)
    Files.move(staging, target)
    // `.old` is intentionally KEPT until the next upsert's
    // recoverForWrite: a concurrent reader that bound its (lazy)
    // DataFrame to the backup mid-swap can still complete its action.
  }

  /** WRITER-side crash recovery: restore `data` from the `.old` backup if
    * a swap died between the two moves, drop a stale `.old` left by a
    * crash after the swap (it would wedge the next `Files.move(target,
    * old)` forever), and clear any half-written `.staging`. Only the
    * single writer may call this — destructive repair from the read path
    * would race an in-flight upsert. */
  private def recoverForWrite(dir: String): Unit = {
    val target = Paths.get(s"$dir/data")
    val old = Paths.get(s"$dir/.old")
    if (!Files.exists(target) && Files.exists(old)) Files.move(old, target)
    else if (Files.exists(old)) deleteRecursively(old) // post-swap leftover
    val staging = Paths.get(s"$dir/.staging")
    if (Files.exists(staging)) deleteRecursively(staging)
  }

  /** Read-side recovery is NON-destructive (it must not race the writer):
    * if `data` is missing mid-swap, read the `.old` backup in place. The
    * backup survives until the NEXT upsert starts, so a reader that binds
    * to it mid-swap can finish its action; only a reader racing TWO
    * consecutive upserts can lose the directory (single-writer,
    * read-mostly contract). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val dataDir = Paths.get(s"$dir/data")
    val path =
      if (Files.exists(dataDir)) dataDir
      else {
        val old = Paths.get(s"$dir/.old")
        if (Files.exists(old)) old else dataDir
      }
    spark.read.parquet(path.toString)
  }

  /** Collection info (the Qdrant collection-info shape): declared config
    * plus live point count. */
  final case class CollectionInfo(config: VectorConfig, numPoints: Long)

  def info(spark: SparkSession, dir: String): CollectionInfo =
    CollectionInfo(config(dir), read(spark, dir).count())

  /** "Query the DB and return the results" (`README.md:13`) — one-call
    * top-k search over a stored collection, scoring with the collection's
    * DECLARED metric (cosine/l2/dot — the config pinned at creation,
    * `qdrant_embedder.py:92-103`), with an optional payload filter
    * (the Qdrant filter DSL via operators/PayloadFilter or any Column). */
  def search(spark: SparkSession, dir: String, vecCol: String,
             idCol: String, query: Seq[Double], k: Int,
             filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val cfg = config(dir)
    require(query.length == cfg.dim,
      s"query dim ${query.length} != collection dim ${cfg.dim}")
    val base = filter.foldLeft(read(spark, dir))((df, f) => df.filter(f))
    val (metricFn, ascending) = cfg.metric match {
      case "cosine" => (VectorOps.cosine _, false)
      case "dot" => (VectorOps.dot _, false)
      case "l2" => (VectorOps.l2 _, true) // distance: smaller is better
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }
    // delegate to Knn.knn: one top-k implementation, one determinism
    // contract (round-6 scores, id tie-break, null-score exclusion)
    graft.operators.Knn.knn(base, vecCol, query, k, metricFn, idCol,
      ascending)
  }

  /** O20: the sink interface (`json_embedder.py:3-9`) — one write method,
    * backends differ only in construction (O18's backend dispatch). */
  trait CollectionSink {
    def write(points: DataFrame): Unit
  }

  /** The default parquet-collection sink with upsert semantics. */
  final class ParquetCollectionSink(spark: SparkSession, dir: String,
                                    cfg: VectorConfig, vecCol: String,
                                    idCol: String, seqCol: String)
      extends CollectionSink {
    create(dir, cfg)
    override def write(points: DataFrame): Unit = {
      val (ok, _) = validate(points, vecCol, cfg)
      upsert(spark, dir, ok, idCol, seqCol)
    }
  }
}
