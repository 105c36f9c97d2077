package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
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

  /** Fixed bucket count for the hash-bucketed data layout, pinned at
    * creation (id→bucket must stay stable across the collection's life —
    * rebucketing would split an id's versions across buckets and break
    * keep-last compaction). */
  val DefaultBuckets = 16

  /** O12: create iff absent — records the vector config; no data yet. */
  def create(dir: String, config: VectorConfig,
             buckets: Int = DefaultBuckets): Unit =
    if (!exists(dir)) {
      Files.createDirectories(Paths.get(dir))
      Files.write(metaPath(dir),
        s"""{"dim": ${config.dim}, "metric": "${config.metric}", "buckets": $buckets}"""
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

  /** The collection's pinned bucket count (default for pre-bucket metas). */
  def numBuckets(dir: String): Int =
    if (!exists(dir)) DefaultBuckets
    else """"buckets":\s*(\d+)""".r
      .findFirstMatchIn(new String(Files.readAllBytes(metaPath(dir)),
        StandardCharsets.UTF_8))
      .map(_.group(1).toInt).getOrElse(DefaultBuckets)

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

  private val BucketCol = "bucket"

  /** id → bucket: Murmur3 hash mod the collection's pinned bucket count.
    * Stable per Spark's hash() contract; storage-layout-only (never part
    * of a declared query result). */
  private def bucketOf(idCol: String, buckets: Int) =
    pmod(hash(col(idCol)), lit(buckets))

  private def listBuckets(p: java.nio.file.Path): Map[String, java.nio.file.Path] =
    if (!Files.isDirectory(p)) Map.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(d => Files.isDirectory(d) &&
          d.getFileName.toString.startsWith(s"$BucketCol="))
        .map(d => d.getFileName.toString -> d).toMap
      finally s.close()
    }

  /** Data files sitting DIRECTLY under `data/` — the pre-bucket flat
    * layout. Folded into the next upsert (migration) and unioned by
    * read(), so legacy collections neither lose rows nor need an offline
    * rewrite. */
  private def looseFiles(p: java.nio.file.Path): Seq[String] =
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(f => Files.isRegularFile(f) && {
          val n = f.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        })
        .map(_.toString).toSeq.sorted
      finally s.close()
    }

  /** O14: append a batch, then compact to keep-last per id (Qdrant upsert
    * semantics — same id overwrites). `seqCol` orders versions.
    *
    * INCREMENTAL layout: `data/bucket=k/` subdirectories, id hashed into a
    * bucket count pinned at creation. A batch reads, compacts, and
    * rewrites ONLY the buckets its ids touch — per-batch cost is
    * O(batch + touched-bucket bytes), not O(collection); untouched
    * buckets' files are never opened or rewritten.
    *
    * Single-writer swap protocol, per bucket: compact touched buckets into
    * `.staging/bucket=k`, then for each one move `data/bucket=k` →
    * `.old/bucket=k` and `.staging/bucket=k` → `data/bucket=k`. A crash
    * mid-swap leaves every bucket either fully old (with `.old` holding
    * nothing for it), or backed up in `.old` — the next upsert's
    * recoverForWrite restores any bucket whose swap died between the two
    * moves, so no bucket is ever lost. Atomicity is per BUCKET: a crash
    * can land some buckets on the new batch and some on the old —
    * batch-level atomicity across buckets needs a manifest/log-structured
    * commit (and object stores without atomic rename need it too); that is
    * the documented next step of this layer, not this POSIX-rename form. */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
             idCol: String, seqCol: String): Unit = {
    recoverForWrite(dir)
    val buckets = numBuckets(dir)
    val dataDir = Paths.get(s"$dir/data")
    val bucketed = batch.withColumn(BucketCol, bucketOf(idCol, buckets))
    // pre-bucket flat-layout files migrate on this write: their rows join
    // the merge (spanning whatever buckets they hash to). The files are
    // NOT deleted here — a `_migrated` marker retires them logically and
    // the NEXT upsert's recovery removes them physically, giving a
    // concurrent reader whose lazy plan bound to the loose paths the same
    // grace period bucket swaps get via `.old`. A crash before the marker
    // leaves loose + partial buckets — the next upsert migrates again
    // (keep-last compaction collapses the transient duplicates).
    val loose = looseFiles(dataDir)
    val withLegacy =
      if (loose.isEmpty) bucketed
      else spark.read.parquet(loose: _*)
        .withColumn(BucketCol, bucketOf(idCol, buckets))
        .unionByName(bucketed)
    val touched = withLegacy.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    // files do not store the bucket column (it is the directory name);
    // recompute it on read — same hash, same pinned bucket count
    val existingDirs = touched
      .map(k => dataDir.resolve(s"$BucketCol=$k"))
      .filter(Files.exists(_))
      .map(_.toString)
    val merged =
      if (existingDirs.isEmpty) withLegacy
      else spark.read.parquet(existingDirs: _*)
        .withColumn(BucketCol, bucketOf(idCol, buckets))
        .unionByName(withLegacy)
    val compacted = graft.operators.Ingest.upsert(merged, idCol, seqCol)
    val staging = Paths.get(s"$dir/.staging")
    compacted.write.mode("overwrite")
      .partitionBy(BucketCol).parquet(staging.toString)
    val old = Paths.get(s"$dir/.old")
    Files.createDirectories(old)
    Files.createDirectories(dataDir)
    touched.foreach { k =>
      val t = dataDir.resolve(s"$BucketCol=$k")
      val s = staging.resolve(s"$BucketCol=$k")
      if (Files.exists(t)) Files.move(t, old.resolve(s"$BucketCol=$k"))
      if (Files.exists(s)) Files.move(s, t)
    }
    // retire legacy files LOGICALLY once every swapped bucket holds their
    // rows; physical deletion waits for the next upsert's recovery
    if (loose.nonEmpty) Files.write(migratedMarker(dir), Array.empty[Byte])
    // `.staging` now holds only _SUCCESS markers; `.old` is intentionally
    // KEPT until the next upsert's recoverForWrite so a concurrent reader
    // that bound its (lazy) DataFrame to a backup bucket mid-swap can
    // still complete its action.
    deleteRecursively(staging)
  }

  /** WRITER-side crash recovery, per bucket: restore any `data/bucket=k`
    * from its `.old` backup if a swap died between the two moves, drop
    * backups whose swap completed (they would wedge the next swap's
    * `Files.move` into `.old`), and clear any half-written `.staging`.
    * Only the single writer may call this — destructive repair from the
    * read path would race an in-flight upsert. */
  private def migratedMarker(dir: String) = Paths.get(s"$dir/data/_migrated")

  private def recoverForWrite(dir: String): Unit = {
    val dataDir = Paths.get(s"$dir/data")
    // a completed legacy migration (marker present) retires its loose
    // files now — their grace period ends with this write, like `.old`
    if (Files.exists(migratedMarker(dir))) {
      looseFiles(dataDir).foreach { f =>
        val p = Paths.get(f)
        Files.deleteIfExists(p)
        Files.deleteIfExists(
          p.getParent.resolve("." + p.getFileName.toString + ".crc"))
      }
      Files.deleteIfExists(migratedMarker(dir))
    }
    val old = Paths.get(s"$dir/.old")
    listBuckets(old).foreach { case (name, backup) =>
      val target = dataDir.resolve(name)
      if (!Files.exists(target)) Files.move(backup, target)
      else deleteRecursively(backup) // post-swap leftover
    }
    if (Files.exists(old)) deleteRecursively(old)
    val staging = Paths.get(s"$dir/.staging")
    if (Files.exists(staging)) deleteRecursively(staging)
  }

  /** Read-side recovery is NON-destructive (it must not race the writer):
    * the scan unions `data`'s bucket directories with any `.old` backup
    * bucket not currently present in `data` (i.e. mid-swap). Backups
    * survive until the NEXT upsert starts, so a reader that binds to one
    * mid-swap can finish its action; only a reader racing TWO consecutive
    * upserts of the SAME bucket can lose it (single-writer, read-mostly
    * contract). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val dataDir = Paths.get(s"$dir/data")
    val dataB = listBuckets(dataDir)
    val oldB = listBuckets(Paths.get(s"$dir/.old"))
    // pre-bucket flat-layout files are live data until a migration's
    // `_migrated` marker retires them (marker present = their rows are in
    // the buckets; reading both would double-count). Only a CRASHED
    // migration — loose files, partial buckets, no marker — unions both;
    // that transient duplication is repaired by the next upsert.
    val loose =
      if (Files.exists(migratedMarker(dir))) Seq.empty
      else looseFiles(dataDir)
    val use = (oldB ++ dataB).values.map(_.toString).toSeq.sorted ++ loose
    if (use.isEmpty) spark.read.parquet(s"$dir/data") // empty/missing: same
    else spark.read.parquet(use: _*)                  //   error as before
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

  /** Collection-management surface (the Qdrant client verbs the reference's
    * backends expose beyond create/upsert/search): list / delete / scroll. */

  /** Collections under `rootDir` = subdirectories carrying a
    * `_collection.json` metadata record. */
  def list(rootDir: String): Seq[String] = {
    val root = Paths.get(rootDir)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(d => Files.isDirectory(d) && exists(d.toString))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  /** Drop a collection: metadata, data buckets, backups — everything. */
  def delete(dir: String): Unit =
    if (Files.exists(Paths.get(dir))) deleteRecursively(Paths.get(dir))

  /** One scroll page (Qdrant `scroll`): points ordered by id, strictly
    * after `afterId`, optionally filtered (the filter DSL composes here
    * like in search). Returns (page, nextOffset) — nextOffset is None on
    * the last page. Plans to TakeOrderedAndProject (bounded heap), so a
    * page never global-sorts the collection; the id predicate pushes to
    * the scan. */
  def scroll(spark: SparkSession, dir: String, idCol: String,
             afterId: Option[Any], limit: Int,
             filter: Option[org.apache.spark.sql.Column] = None)
      : (DataFrame, Option[Any]) = {
    val base0 = filter.foldLeft(read(spark, dir))((df, f) => df.filter(f))
    val base = afterId.foldLeft(base0)((df, a) => df.filter(col(idCol) > lit(a)))
    val plan = base.orderBy(col(idCol)).limit(limit)
    // materialize ONCE: the returned page and the offset must come from
    // the same execution, or a concurrent upsert between the two runs
    // could skip/duplicate ids across pages (and each page would pay a
    // double scan). Pages are `limit`-bounded, so localizing is safe.
    val rows = plan.collect()
    val idIdx = plan.schema.fieldIndex(idCol)
    val next = if (rows.length < limit) None else Some(rows.last.get(idIdx))
    (spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), plan.schema), next)
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
