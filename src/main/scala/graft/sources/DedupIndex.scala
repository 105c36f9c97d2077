package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted MinHash/LSH band index over a document corpus — the serving
  * layout incremental deduplication needs at 100 TB, where the corpus is
  * NEVER re-shingled per incoming shard (the reference delegates near-dup
  * detection wholesale to its backing store; this is the engine-native
  * band index the delegation implies, same V6 geometry as the
  * `dedup_minhash` gate: reference `bob_vector_db/qdrant_embedder.py:1` stores
  * points once and every later query reads the stored form).
  *
  * Layout: one row per (id, band, band_sig), written `partitionBy(band,
  * sbucket)` where `sbucket = h32(band_sig) mod sig_buckets`. The
  * partition space is small (bands × sig_buckets dirs) but exactly what
  * the two serving verbs prune on:
  *   - [[lookup]] (single-document probe): the probe's bands are computed
  *     DRIVER-SIDE (bit-identical twin of the fused TokensMinHashExpr
  *     kernel — zero jobs), so the read carries literal
  *     (band, sbucket) partition filters plus the band_sig equality as a
  *     pushed data filter: `bands` dirs touched out of
  *     bands × sig_buckets.
  *   - [[pairsAgainst]] (shard-vs-corpus batch): the shard side is banded
  *     in flight and BROADCAST — the corpus index streams through a
  *     broadcast hash join with no shuffle and no re-hash; one bounded
  *     (≤ bands × sig_buckets rows by construction) per-cell count pass
  *     over the shard both prunes the index read to the partitions the
  *     shard can touch at all AND bounds the broadcast (oversized
  *     deliveries downgrade to a shuffle join instead of OOMing).
  * Both verbs read through [[ServedReads]] (the amortized-listing memo),
  * and [[append]] — the incremental maintenance verb — bands only the NEW
  * documents under the geometry pinned in `_dedup_index.json`, appends
  * into the band dirs, and evicts the memo before and after (the
  * layout-mutation eviction contract). Geometry is pinned at build so an
  * appended row can never disagree with the corpus rows on band shape.
  */
object DedupIndex {

  /** Reserved layout column names — inputs must not carry them. */
  private val Reserved = Seq("band", "band_sig", "sbucket")

  val DefaultSigBuckets = 16

  private def metaPath(dir: String) = Paths.get(dir, "_dedup_index.json")

  final case class Geometry(idCol: String, numHashes: Int, shingleN: Int,
                            rowsPerBand: Int, sigBuckets: Int) {
    def bands: Int = numHashes / rowsPerBand
  }

  def geometry(dir: String): Geometry = {
    val txt = new String(Files.readAllBytes(metaPath(dir)),
      StandardCharsets.UTF_8)
    def long(k: String): Int = (s""""$k":\\s*(\\d+)""").r
      .findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(
        s"dedup index at $dir has no $k in metadata"))
      .group(1).toInt
    val idCol = """"id_col":\s*"([^"]+)"""".r.findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(
        s"dedup index at $dir has no id_col in metadata"))
      .group(1)
    Geometry(idCol, long("num_hashes"), long("shingle_n"),
      long("rows_per_band"), long("sig_buckets"))
  }

  private def writeMeta(dir: String, g: Geometry): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(metaPath(dir),
      (s"""{"id_col": "${g.idCol}", "num_hashes": ${g.numHashes}, """ +
        s""""shingle_n": ${g.shingleN}, """ +
        s""""rows_per_band": ${g.rowsPerBand}, """ +
        s""""sig_buckets": ${g.sigBuckets}}""").getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** (id, band, band_sig, sbucket) rows for `docs` under geometry `g` —
    * the one banding definition build, append and the shard side of
    * [[pairsAgainst]] all share, so the two sides of a probe join can
    * never drift. */
  private def banded(docs: DataFrame, idCol: String, textCol: String,
                     g: Geometry): DataFrame = {
    Reserved.foreach(c => require(!docs.columns.contains(c),
      s"input carries a column named '$c' — reserved for the index layout"))
    Dedup.lshBandsFused(docs.select(col(idCol), col(textCol)), idCol,
        textCol, g.numHashes, g.shingleN, g.rowsPerBand)
      .withColumn("sbucket",
        pmod(Dedup.h32(col("band_sig")), lit(g.sigBuckets)).cast("int"))
  }

  /** Materialize the band index over the corpus. One exchange on the
    * partition key before the write (the `Collections.compact`
    * small-files discipline: a task holds whole (band, sbucket) cells, so
    * each leaf dir gets one file instead of one per input split). */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            numHashes: Int = 16, shingleN: Int = 3, rowsPerBand: Int = 4,
            sigBuckets: Int = DefaultSigBuckets): Unit = {
    require(numHashes % rowsPerBand == 0,
      s"$rowsPerBand rows/band must divide $numHashes hashes")
    val g = Geometry(idCol, numHashes, shingleN, rowsPerBand, sigBuckets)
    ServedReads.evict(dir)
    banded(docs, idCol, textCol, g)
      .repartition(col("band"), col("sbucket"))
      .write.mode("overwrite")
      .partitionBy("band", "sbucket")
      .parquet(dir)
    // after the data write — overwrite deletes the target first, and a
    // metadata record without data would claim a live index
    writeMeta(dir, g)
    ServedReads.evict(dir)
  }

  /** Incremental maintenance: band ONLY the new documents under the
    * pinned geometry and append into the band dirs. The corpus is never
    * re-read — this is the verb that makes the index worth persisting. */
  def append(docs: DataFrame, textCol: String, dir: String): Unit = {
    val g = geometry(dir)
    require(docs.columns.contains(g.idCol),
      s"append input has no '${g.idCol}' column (pinned id_col of $dir)")
    ServedReads.evict(dir)
    banded(docs, g.idCol, textCol, g)
      .repartition(col("band"), col("sbucket"))
      .write.mode("append")
      .partitionBy("band", "sbucket")
      .parquet(dir)
    ServedReads.evict(dir)
  }

  /** The served read of the layout (amortized listing; partition filters
    * still prune per query). */
  private def servedBands(spark: SparkSession, dir: String): DataFrame =
    ServedReads.of(spark, dir)

  /** Past this many shard band rows the shard is no longer "the small
    * side": the broadcast falls back to a shuffle join on the band key
    * (override per session via `graft.dedup.broadcastMaxBandRows`). At
    * the default 16-hash/4-band geometry 2M band rows ≈ 500k shard
    * documents ≈ tens of MB of (id, band, sig) — comfortably inside any
    * executor's broadcast budget; a 100 TB re-delivery above it still
    * completes, just through the exchange it genuinely needs. */
  val BroadcastMaxBandRows = 2000000L

  /** Shard-vs-corpus candidate pairs: every (shard id, corpus id) that
    * collides in ≥ 1 band. The shard is the small side by contract (an
    * incoming delivery against the full corpus): its bands are broadcast,
    * so the index side never shuffles, and its per-(band, sbucket) counts
    * — bounded at bands × sig_buckets rows REGARDLESS of shard size, so
    * the collect can never be unbounded — become literal partition
    * filters on the index read (static pruning that pays off exactly when
    * the shard is far smaller than the bucket space, the single-delivery
    * serving case). The same one bounded job also yields the shard's
    * total band-row count for free; an OVERSIZED delivery (>
    * [[BroadcastMaxBandRows]]) keeps the pruning but downgrades the
    * broadcast to a shuffle join instead of OOMing the driver — the plan
    * decision is a pure function of that count, so it stays
    * deterministic. Ids present in both the shard and the index pair
    * with themselves like any other collision — dedup of a shard against
    * a corpus that already contains it is the re-delivery case and those
    * pairs are the point. */
  def pairsAgainst(spark: SparkSession, dir: String, shard: DataFrame,
                   shardIdCol: String, textCol: String): DataFrame = {
    val g = geometry(dir)
    val sb = banded(shard, shardIdCol, textCol, g)
      .withColumnRenamed(shardIdCol, "shard_id")
    val cellCounts = sb.groupBy("band", "sbucket").count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val bandRows = cellCounts.map(_._3).sum
    val idx = servedBands(spark, dir)
    val pruned =
      if (cellCounts.length >= g.bands * g.sigBuckets) idx // all cells hit
      else idx.filter(cellCounts.map { case (b, s, _) =>
        col("band") === b && col("sbucket") === s
      }.reduce(_ || _))
    val maxBroadcast = spark.conf
      .getOption("graft.dedup.broadcastMaxBandRows")
      .map(_.toLong).getOrElse(BroadcastMaxBandRows)
    val right = if (bandRows <= maxBroadcast) broadcast(sb) else sb
    pruned
      .join(right, Seq("band", "sbucket", "band_sig"))
      .select(col("shard_id"), col(g.idCol).as("corpus_id"))
      .distinct()
  }

  /** Small-files maintenance for a long-gated index: every [[gateAppend]]
    * leaves one file per touched cell per micro-batch, so a long-running
    * stream accretes thousands of tiny files per cell. Rewrite the whole
    * layout with one exchange on the partition key (one file per cell —
    * the Collections.compact discipline) into a staging dir, then swap;
    * a crash mid-build leaves the live layout intact. Band rows are
    * byte-identical (spec-pinned) — compaction is an IO-layout verb,
    * never a semantic one. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val g = geometry(dir)
    // the staged-swap discipline (Drift.stagedRebuild): the live layout
    // serves until the renames; the build thunk reads the CURRENT bands
    // (dir is still live inside the thunk) into one file per cell
    Drift.stagedRebuild(dir) { staging =>
      servedBands(spark, dir)
        .select(col(g.idCol), col("band_sig"), col("band"), col("sbucket"))
        .repartition(col("band"), col("sbucket"))
        .write.mode("overwrite")
        .partitionBy("band", "sbucket")
        .parquet(staging)
      writeMeta(staging, g) // geometry travels with the new generation
      // the gate's replay fence travels too — losing the markers would
      // re-admit a replayed batch after every compaction
      val fence = Paths.get(dir, "_gated_batches")
      if (Files.isDirectory(fence)) {
        val target = Paths.get(staging, "_gated_batches")
        Files.createDirectories(target)
        val s = Files.list(fence)
        try s.forEach(p =>
          Files.copy(p, target.resolve(p.getFileName.toString)))
        finally s.close()
      }
    }
  }

  /** The streaming ingestion gate — one micro-batch through the
    * dedup-before-store loop a training-data pipeline runs continuously:
    * reject every batch document that near-collides with the corpus
    * ([[pairsAgainst]]) or with a LOWER-id document in the same batch
    * (the keep-lowest rule on within-batch band collisions — new ids are
    * monotone in arrival, so lowest = first seen), then [[append]] the
    * survivors' bands so the NEXT batch deduplicates against them too.
    * Returns the kept documents for the caller's downstream write.
    *
    * Replay contract (`batchId`): a batch id already marked committed
    * returns an EMPTY frame and touches nothing — the caller's
    * downstream write is fenced by its own batch id (the
    * committed-manifest sink pattern), so the replayed batch's kept
    * rows were already delivered by the original attempt. The marker
    * lands AFTER the append; a crash inside that window makes the next
    * attempt re-append IDENTICAL band rows — which is why every
    * count-serving read distincts band rows first: maintenance is
    * at-least-once, serving is exactly-once-effective. Without a
    * `batchId` the verb is a plain append (idempotence is the caller's
    * problem, like every append). */
  def gateAppend(spark: SparkSession, dir: String, batch: DataFrame,
                 idCol: String, textCol: String,
                 batchId: Option[Long] = None): DataFrame = {
    require(idCol != "shard_id" && idCol != "corpus_id",
      "batch id column must not collide with the pair output names")
    val marker = batchId.map(id =>
      Paths.get(dir, "_gated_batches", id.toString))
    if (marker.exists(Files.exists(_)))
      return batch.limit(0)
    // materialize the gate ONCE (localCheckpoint — blocks released by
    // the ContextCleaner, the inIdsFrame discipline): append() below and
    // the caller's consumption of the returned frame would otherwise
    // each re-run the corpus-pair and intra-batch banding joins
    val kept = gateKept(spark, dir, batch, idCol, textCol)
      .localCheckpoint(eager = true)
    append(kept, textCol, dir)
    marker.foreach { m =>
      Files.createDirectories(m.getParent); Files.write(m, Array[Byte]())
    }
    kept
  }

  /** The PURE gate decision — [[gateAppend]]'s kept set with NO
    * mutation and no fence: batch rows surviving reject-vs-corpus
    * (≥ 1 shared band with the index) and keep-lowest-id within the
    * batch (the LSH-candidate loser rule). One definition shared with
    * [[gateAppend]], and directly callable by declared queries (which
    * must not mutate state — `pipe_curate_indexed` composes this with
    * the semantic and quality gates). */
  def gateKept(spark: SparkSession, dir: String, batch: DataFrame,
               idCol: String, textCol: String): DataFrame = {
    require(idCol != "shard_id" && idCol != "corpus_id",
      "batch id column must not collide with the pair output names")
    val g = geometry(dir)
    val vsCorpus = pairsAgainst(spark, dir, batch, idCol, textCol)
      .select(col("shard_id").as(idCol)).distinct()
    val intraLosers = graft.operators.Dedup.lshCandidates(
        banded(batch, idCol, textCol, g), idCol)
      .select(col("doc_b").as(idCol)).distinct()
    batch.join(vsCorpus.unionAll(intraLosers).distinct(),
      Seq(idCol), "left_anti")
  }

  /** Driver-side band signatures of one probe text — the bit-identical
    * local twin of the fused banding pipeline (tokens → word shingles →
    * md5-based h32 → affine family running min → '-'-joined band
    * strings; `Dedup.minhashLocal`). Zero Spark jobs. */
  def probeBands(text: String, g: Geometry): Seq[(Int, Int, String)] = {
    val sig = Dedup.minhashLocal(text, g.shingleN, g.numHashes)
    (0 until g.bands).map { b =>
      val s = sig.slice(b * g.rowsPerBand, (b + 1) * g.rowsPerBand)
        .mkString("-")
      (b, (Dedup.h32(s) % g.sigBuckets).toInt, s)
    }
  }

  /** Single-document probe: which corpus documents share ≥ 1 band with
    * `text`, and in how many bands. The probe's band signatures are
    * computed driver-side (zero jobs), so the one job this runs carries
    * literal (band, sbucket) PartitionFilters — `bands` leaf dirs read
    * out of bands × sig_buckets — with the band_sig equality pushed to
    * parquet. Output: (id_col, n_bands). */
  def lookup(spark: SparkSession, dir: String, text: String): DataFrame = {
    val g = geometry(dir)
    val pred = probeBands(text, g).map { case (b, s, sig) =>
      col("band") === b && col("sbucket") === s && col("band_sig") === sig
    }.reduce(_ || _)
    servedBands(spark, dir)
      .filter(pred)
      // band rows are deterministic per document, so a replayed append
      // can only DUPLICATE rows, never change them; the distinct makes
      // every count-serving verb idempotent under at-least-once
      // maintenance (the gateAppend crash-window contract)
      .distinct()
      .groupBy(col(g.idCol))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Batched point probes — the `queryPointsMulti` serving discipline on
    * the dedup index: ALL probes' band signatures are computed
    * driver-side (zero jobs), their cells' union becomes ONE literal
    * (band, sbucket) DNF PartitionFilter over ONE scan, and per-probe
    * attribution is a broadcast join against the ≤ batch × bands-row
    * literal probe table — job budget independent of batch size, each
    * probe's rows equal to its single-[[lookup]] serving (spec). Bounded
    * loudly by the measured [[graft.operators.Knn.MaxBatchQueries]]
    * plan-arm contract. Output: (probe_id, id_col, n_bands). */
  def lookupMulti(spark: SparkSession, dir: String,
                  probes: Seq[(Long, String)]): DataFrame = {
    graft.operators.Knn.requireBatch(probes.length, "DedupIndex.lookupMulti")
    require(probes.map(_._1).distinct.length == probes.length,
      "duplicate probe ids in batch")
    val g = geometry(dir)
    val rows = probes.flatMap { case (pid, text) =>
      probeBands(text, g).map { case (b, s, sig) => (pid, b, s, sig) }
    }
    val cells = rows.map { case (_, b, s, _) => (b, s) }.distinct
    val pruned =
      if (cells.length >= g.bands * g.sigBuckets) servedBands(spark, dir)
      else servedBands(spark, dir).filter(cells.map { case (b, s) =>
        col("band") === b && col("sbucket") === s
      }.reduce(_ || _))
    import spark.implicits._
    val probeTable = broadcast(
      rows.toDF("probe_id", "band", "sbucket", "band_sig"))
    pruned
      .distinct() // replay-duplicate band rows count once (see lookup)
      .join(probeTable, Seq("band", "sbucket", "band_sig"))
      .groupBy(col("probe_id"), col(g.idCol))
      .agg(count(lit(1)).as("n_bands"))
  }
}
