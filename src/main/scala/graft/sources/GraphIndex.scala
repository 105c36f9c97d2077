package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, GraphAnn}

/** Incrementally-maintained navigable-graph ANN index over a collection —
  * the change-feed composition the other derived layouts already have
  * ([[IvfIndex]], [[SparseIndex]], [[Tenancy]], [[PayloadIndex]]): after
  * an upsert / deleteWhere / setVectorWhere sequence touches a handful of
  * collection buckets, [[refresh]] re-runs the NN-descent rounds ONLY for
  * the nodes the change can actually reach, instead of rebuilding the
  * graph from the whole collection.
  *
  * == Why the layout stores every round ==
  *
  * The build ([[GraphAnn.buildGraph]]) is deterministic but ITERATIVE:
  * round r's adjacency is a function of round r-1's. An incremental
  * refresh that must reproduce the full rebuild ROW FOR ROW therefore
  * needs the old per-round states to diff against — so the index persists
  * them (rounds are a small constant; the analog of HNSW's layers):
  *
  * {{{
  * indexDir/
  *   _graph_index.json            pinned build params incl. hyperplanes
  *   order/src_bucket=b/          (id, band, bkt)   LSH bucket membership
  *   graph/round=r/src_bucket=b/  (src, dst, score_micro, rnk)
  *   seeds/src_bucket=b/          (id)              per-bucket entry seeds
  * }}}
  *
  * `src_bucket` is the collection's id-hash bucket — the refresh/swap
  * unit. Serving reads `graph/round=R` alone (partition pruning on
  * `round`), with the usual row-group pruning on `src` for beam probes.
  *
  * == The dirty-propagation argument (why refresh == rebuild) ==
  *
  * Let C = all ids in collection buckets the feed reports changed (old
  * rows ∪ new rows — the feed's granularity), the only nodes whose
  * VECTOR or existence can differ.
  *
  *  - '''Init (round 0).''' A node's initial candidates are its windowed
  *    successors/predecessors inside its LSH buckets. Membership changed
  *    only in buckets holding a C member (old or new), so recomputing
  *    window edges for exactly those buckets and diffing old vs new gives
  *    every added/removed init edge; the endpoints of those edges, plus
  *    every endpoint of a surviving edge INCIDENT to C (same edge, new
  *    score — cosine reads the vectors), are the only nodes whose round-0
  *    top-M inputs differ. Recompute those, diff against the stored
  *    round-0 rows → D'₀ = nodes whose round-0 rows ACTUALLY changed.
  *  - '''Round r.''' g_r(s) is a function of (a) the edge sets und(x)
  *    for x ∈ {s} ∪ und(s) (symmetrize + one closure hop), and (b) the
  *    vectors of s and its candidates. (a) differs only for s within one
  *    und-hop of U = D'_{r-1} ∪ (old∪new neighbors of D'_{r-1}); (b)
  *    differs only for s within TWO und-hops of a RE-VECTORED node V
  *    (a candidate at closure distance 2 may be in V). So recomputing
  *    S_r = T ∪ N₁(T), T = U ∪ V ∪ N₁(V) (a superset of both) from the
  *    MERGED round r-1 table — which equals the full rebuild's g_{r-1}
  *    by induction — reproduces the rebuild's g_r for S_r, and every
  *    node outside S_r has bit-identical inputs, hence bit-identical
  *    rows. Diff → D'_r, merge-write, repeat. V is computed EXACTLY by
  *    diffing old vs new vectors through the previous manifest's still-
  *    readable generation dirs (the one-write reader grace window), so a
  *    compact or payload-only rewrite has V = ∅ and the rounds skip; if
  *    the old state is already GC'd, V falls back to every live changed
  *    id — conservative, never unsound.
  *
  * Scores are micro-quantized cosines with id tie-breaks (the
  * [[GraphAnn]] determinism contract), so "identical inputs" really does
  * mean "identical rows", and D'_r shrinks to the true change set — if a
  * round's diff is empty (and nothing was deleted), the remaining rounds
  * are provably unchanged and refresh stops early — but ONLY on
  * pure-deletion refreshes: a live changed-bucket id may carry a new
  * vector whose effect first surfaces at a later round's closure pair,
  * so any such id keeps all rounds running (guard in [[refresh]]).
  *
  * == Cost & limits ==
  *
  * Per round: two adjacency-table passes for the neighbor expansions
  * (narrow columns, no vectors), candidate scoring on the dirty
  * neighborhood only (vectors fetched by literal id probes —
  * PushedFilters — up to [[ProbeLimit]] ids, broadcast-joined above it),
  * and a staged per-`src_bucket` swap that leaves untouched buckets'
  * files byte-identical. Dirty sets live on the driver (bounded by
  * |touched|·(M+1)² per round); when a delta approaches corpus scale a
  * full [[build]] is the cheaper path — the same trade HNSW makes
  * between incremental insert and bulk rebuild. Ids must be BIGINT
  * (enforced at build).
  */
object GraphIndex {

  /** Pinned build parameters — persisted in `_graph_index.json` so
    * refresh can never diverge from the build's geometry. */
  final case class Params(bands: Int, planesPerBand: Int, w: Int, m: Int,
                          rounds: Int, planes: Seq[Seq[Double]],
                          seedCap: Int = GraphAnn.SeedCap) {
    require(planes.length == bands * planesPerBand,
      s"need ${bands * planesPerBand} planes, got ${planes.length}")
  }

  /** Above this many dirty ids a literal IN probe stops being the right
    * plan (planning cost ∝ literals); fall back to a broadcast semi-join.
    * Shared with the serving side ([[GraphAnn.ProbeLimit]]) so build,
    * refresh, and serving all switch probes at the same point. */
  val ProbeLimit: Int = GraphAnn.ProbeLimit

  private def metaPath(dir: String) = Paths.get(dir, "_graph_index.json")

  private def writeMeta(dir: String, p: Params): Unit = {
    val planesJson = p.planes
      .map(_.map(d => java.lang.Double.toString(d)).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    Files.createDirectories(Paths.get(dir))
    Files.write(metaPath(dir),
      (s"""{"bands": ${p.bands}, "planes_per_band": ${p.planesPerBand}, """ +
        s""""w": ${p.w}, "m": ${p.m}, "rounds": ${p.rounds}, """ +
        s""""seed_cap": ${p.seedCap}, "planes": $planesJson}""")
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Read back the pinned params (Double.toString round-trips exactly). */
  def params(dir: String): Params = {
    val txt = new String(Files.readAllBytes(metaPath(dir)),
      StandardCharsets.UTF_8)
    def int(k: String): Int =
      (""""""" + k + """":\s*(-?\d+)""").r.findFirstMatchIn(txt)
        .get.group(1).toInt
    val planesTxt = txt.substring(txt.indexOf("\"planes\":") + 9).trim
      .stripSuffix("}").trim.stripPrefix("[").stripSuffix("]")
    val planes =
      if (planesTxt.isEmpty) Seq.empty[Seq[Double]]
      else planesTxt.split("\\],\\[").toSeq
        .map(_.stripPrefix("[").stripSuffix("]")
          .split(',').toSeq.map(_.trim.toDouble))
    Params(int("bands"), int("planes_per_band"), int("w"), int("m"),
      int("rounds"), planes, int("seed_cap"))
  }

  // ---------------------------------------------------------------------
  // Shared relational pieces (build AND refresh derive edges the same way)
  // ---------------------------------------------------------------------

  /** LSH bucket membership rows (id, band, bkt) for a points frame. */
  private def orderOf(points: DataFrame, idCol: String, vecCol: String,
                      p: Params): DataFrame =
    (0 until p.bands).map { b =>
      points.select(col(idCol).cast("long").as("id"),
        lit(b).as("band"),
        Ann.lshBucket(col(vecCol),
          p.planes.slice(b * p.planesPerBand, (b + 1) * p.planesPerBand))
          .as("bkt"))
    }.reduce(_ union _)

  /** Init edges from a membership frame: per (band, bkt), connect each
    * id to its `w` successors in id order — [[GraphAnn]]'s band-pair
    * window expressed over the ORDER table. */
  private def initEdges(order: DataFrame, w: Int): DataFrame = {
    val win = Window.partitionBy(col("band"), col("bkt")).orderBy(col("id"))
    order
      .select(col("id").as("src"),
        array((1 to w).map(i => lead(col("id"), i).over(win)): _*)
          .as("__succ"))
      .select(col("src"), explode(col("__succ")).as("dst"))
      .filter(col("dst").isNotNull)
  }

  private def bucketCol(c: String, nb: Int) =
    pmod(hash(col(c)), lit(nb)).as("src_bucket")

  /** Literal-probe filter with join fallback above [[ProbeLimit]] — the
    * canonical form lives at [[GraphAnn.inIds]]. */
  private def inIds(df: DataFrame, c: String, ids: Iterable[Long]): DataFrame =
    GraphAnn.inIds(df, c, ids.toSeq)

  private def notInIds(df: DataFrame, c: String,
                       ids: Iterable[Long]): DataFrame =
    if (ids.isEmpty) df
    else if (ids.sizeIs <= GraphAnn.probeLimit(df.sparkSession))
      df.filter(!col(c).isin(ids.toSeq.map(Long.box): _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(ids.toSeq.toDF(c)), Seq(c), "leftanti")
    }

  private def collectLongs(df: DataFrame): Set[Long] =
    df.collect().iterator.map(_.getLong(0)).toSet

  /** Score candidate pairs against vectors fetched by id probe — the
    * [[GraphAnn.scoreEdges]] math on the dirty neighborhood only. */
  private def scoreProbed(collLong: DataFrame, vecCol: String,
                          pairs: DataFrame): DataFrame = {
    val ids = collectLongs(
      pairs.select(col("src")).union(pairs.select(col("dst"))).distinct())
    GraphAnn.scoreEdges(inIds(collLong, "id", ids), "id", vecCol, pairs)
  }

  private def roundPath(dir: String, r: Int): String =
    s"$dir/graph/round=$r"

  // ---------------------------------------------------------------------
  // Build
  // ---------------------------------------------------------------------

  /** Full build from a collection: order table, all NN-descent round
    * states, per-bucket entry seeds. Returns the manifest cursor for
    * [[refresh]]. */
  def build(spark: SparkSession, collDir: String, indexDir: String,
            idCol: String, vecCol: String, p: Params)
      : Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    buildFromPoints(Collections.read(spark, collDir), idCol, vecCol,
      Collections.numBuckets(collDir), indexDir, p)
    cur
  }

  /** Staged RETRAIN (the [[Drift]] maintenance verb): the graph's
    * data-derived artifacts — entry seeds and the NN-descent adjacency
    * rounds — recomputed from the CURRENT collection (the LSH planes
    * stay the caller's `p.planes`, the build's one external artifact),
    * whole layout rebuilt into staging, swapped. A pinned-seed layout
    * over drifted data degrades exactly like pinned centroids: the
    * persisted entries stop being near anything, and incremental
    * [[refresh]] keeps them by contract. */
  def retrain(spark: SparkSession, collDir: String, indexDir: String,
              idCol: String, vecCol: String, p: Params)
      : Collections.ManifestView = {
    val cur = Collections.manifestView(collDir)
    Drift.stagedRebuild(indexDir) { staging =>
      buildFromPoints(Collections.read(spark, collDir), idCol, vecCol,
        Collections.numBuckets(collDir), staging, p)
      // baseline against the NEW layout's seeds, inside staging — the
      // swap publishes layout and baseline atomically (renames only)
      Drift.snapshotAssignment(staging,
        Collections.read(spark, collDir), vecCol,
        seedCentroids(spark, collDir, staging, idCol, vecCol))
    }
    cur
  }

  /** The persisted entry seeds' VECTORS as a (cid, cv) table — the
    * routing "centroids" of a pinned-seed graph (bounded:
    * buckets · seedCap rows, literal id probe). */
  private def seedCentroids(spark: SparkSession, collDir: String,
                            indexDir: String, idCol: String,
                            vecCol: String): DataFrame = {
    val ids = ServedReads.of(spark, s"$indexDir/seeds")
      .select("id").collect().map(_.getLong(0)).toSeq
    GraphAnn.inIds(
      Collections.read(spark, collDir)
        .select(col(idCol).cast("long").as("cid"),
          col(vecCol).cast("array<double>").as("cv")),
      "cid", ids)
  }

  /** Persist the drift baseline for a pinned-seed graph: the
    * [[Drift.assignmentSketch]] of every point's distance to the
    * nearest persisted ENTRY SEED vector (the seeds' CURRENT vectors —
    * beam scoring reads current vectors too, so the signal measures
    * the current routing geometry). A pinned-seed layout over drifted
    * data degrades exactly like pinned centroids — beam entry starts
    * far from every query's neighborhood while incremental [[refresh]]
    * keeps the seeds by contract — and this is the deterministic
    * signal of that gap. Call after [[build]]; [[retrain]] refreshes
    * it automatically. Note the signal is vacuously 1.0 while every
    * point IS a seed (collection ≤ buckets·seedCap — a toy-fixture
    * state no real collection stays in). */
  def snapshotDrift(spark: SparkSession, collDir: String,
                    indexDir: String, idCol: String,
                    vecCol: String): Unit =
    Drift.snapshotAssignment(indexDir, Collections.read(spark, collDir),
      vecCol, seedCentroids(spark, collDir, indexDir, idCol, vecCol))

  /** The drift signal: current-collection 0.9-quantile
    * distance-to-nearest-seed over the pinned build-time quantile —
    * exactly 1.0 on unchanged data. */
  def driftRatio(spark: SparkSession, collDir: String, indexDir: String,
                 idCol: String, vecCol: String,
                 q: Double = 0.9): Double =
    Drift.assignmentRatio(spark, indexDir,
      Collections.read(spark, collDir), vecCol,
      seedCentroids(spark, collDir, indexDir, idCol, vecCol), q = q)

  /** ONE-CALL maintenance ([[Drift.maintain]]): evaluate [[driftRatio]],
    * [[retrain]] past `threshold`, no-op otherwise (layout bytes
    * untouched). Returns the signal and, iff it fired, the fresh
    * cursor. */
  def maintain(spark: SparkSession, collDir: String, indexDir: String,
               idCol: String, vecCol: String, p: Params,
               threshold: Double = Drift.DefaultThreshold)
      : (Drift.MaintainResult, Option[Collections.ManifestView]) = {
    var out: Option[Collections.ManifestView] = None
    val res = Drift.maintain(threshold)(
      driftRatio(spark, collDir, indexDir, idCol, vecCol)) {
      out = Some(retrain(spark, collDir, indexDir, idCol, vecCol, p))
    }
    (res, out)
  }

  /** Full build from any points frame (fixture-table form — the same
    * split every derived layout has). The round-R table is row-identical
    * to [[graft.operators.GraphAnn.buildGraph]] with the same params:
    * identical init windows, scoring, and top-M — only the layout
    * (per-round, per-bucket, refreshable) differs. */
  def buildFromPoints(coll: DataFrame, idCol: String, vecCol: String,
                      nb: Int, indexDir: String, p: Params): Unit = {
    val spark = coll.sparkSession
    require(coll.schema(idCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"graph index requires a BIGINT id column, got " +
        s"${coll.schema(idCol).dataType}")
    val collLong = coll.select(col(idCol).cast("long").as("id"),
      col(vecCol).as(vecCol))
    val order = orderOf(coll, idCol, vecCol, p)
    order.withColumn("src_bucket", pmod(hash(col("id")), lit(nb)))
      .write.mode("overwrite").partitionBy("src_bucket")
      .parquet(s"$indexDir/order")
    // round states: identical math to GraphAnn.buildGraph, but every
    // intermediate is persisted (the refresh diff base) — the write IS
    // the per-round checkpoint, so no localCheckpoint is needed
    val init = initEdges(spark.read.parquet(s"$indexDir/order"), p.w)
    val sym = init.union(init.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    var adj = GraphAnn.topM(
      GraphAnn.scoreEdges(collLong, "id", vecCol, sym), p.m)
    writeRound(indexDir, 0, adj.withColumn("src_bucket",
      pmod(hash(col("src")), lit(nb))))
    for (r <- 1 to p.rounds) {
      val prev = spark.read.parquet(roundPath(indexDir, r - 1))
        .drop("src_bucket")
      val und = prev.select("src", "dst")
        .union(prev.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val closure = und.as("a")
        .join(und.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
      adj = GraphAnn.topM(GraphAnn.scoreEdges(collLong, "id", vecCol,
        und.union(closure).distinct()), p.m)
      writeRound(indexDir, r, adj.withColumn("src_bucket",
        pmod(hash(col("src")), lit(nb))))
    }
    // per-bucket entry seeds: the global top-seedCap by the salted-hash
    // ordering is a subset of the per-bucket top-seedCaps, so seed
    // refresh is bucket-local and serving merges driver-side
    coll.select(col(idCol).cast("long").as("id"),
        bucketCol(idCol, nb))
      .withColumn("__rk", row_number().over(Window
        .partitionBy("src_bucket").orderBy(
          Dedup.h32(concat(lit("gseed|"), col("id"))), col("id"))))
      .filter(col("__rk") <= p.seedCap).drop("__rk")
      .write.mode("overwrite").partitionBy("src_bucket")
      .parquet(s"$indexDir/seeds")
    writeMeta(indexDir, p)
    ServedReads.evict(indexDir)
  }

  private def writeRound(dir: String, r: Int, rows: DataFrame): Unit =
    rows.write.mode("overwrite").partitionBy("src_bucket")
      .parquet(roundPath(dir, r))

  // ---------------------------------------------------------------------
  // Serving
  // ---------------------------------------------------------------------

  /** The serving adjacency: the FINAL round only (partition-pruned). */
  def adjacency(spark: SparkSession, indexDir: String): DataFrame = {
    val r = params(indexDir).rounds
    ServedReads.of(spark, roundPath(indexDir, r)).drop("src_bucket")
  }

  /** Entry seeds in the deterministic global order (driver-side merge of
    * the per-bucket lists — O(buckets · seedCap) rows). */
  def seeds(spark: SparkSession, indexDir: String, beam: Int): Array[Long] = {
    val cap = params(indexDir).seedCap
    require(beam <= cap, s"beam=$beam exceeds the $cap persisted seeds")
    ServedReads.of(spark, s"$indexDir/seeds")
      .orderBy(Dedup.h32(concat(lit("gseed|"), col("id"))), col("id"))
      .limit(beam).select("id").collect().map(_.getLong(0))
  }

  /** Beam search over the maintained index ([[GraphAnn]]'s serving core:
    * persisted seeds, literal-probe expansion and scoring). */
  def search(spark: SparkSession, collDir: String, indexDir: String,
             idCol: String, vecCol: String, query: Seq[Double], beam: Int,
             rounds: Int, k: Int): DataFrame =
    GraphAnn.beamSearchFrom(Collections.read(spark, collDir), idCol, vecCol,
      adjacency(spark, indexDir), seeds(spark, indexDir, beam), query,
      beam, rounds, k)._1

  // ---------------------------------------------------------------------
  // Refresh
  // ---------------------------------------------------------------------

  /** Marker present while a refresh is mid-mutation. The per-round /
    * order / seeds swaps are separate delete-then-move sequences; a crash
    * between them leaves a TORN index (e.g. order already rewritten,
    * later rounds not merged) from which a re-run with the same cursor
    * would compute an empty init-edge delta and silently diverge from a
    * full rebuild. The marker makes the torn state detectable; recovery
    * is a full [[build]] — the layout is derived and rebuildable. */
  private def refreshMarker(indexDir: String) =
    Paths.get(indexDir, "_refresh_in_progress")

  /** Incremental refresh from the change feed; row-for-row equal to a
    * full [[build]] over the collection's current state (spec-gated).
    * Returns the new cursor. Crash-safe: a marker brackets the
    * mutation window, and a marker found at entry (a previous refresh
    * died mid-swap) forces a full rebuild instead of trusting the torn
    * on-disk state. */
  def refresh(spark: SparkSession, collDir: String, indexDir: String,
              idCol: String, vecCol: String,
              prev: Collections.ManifestView): Collections.ManifestView = {
    if (Files.exists(refreshMarker(indexDir))) {
      val rebuilt = build(spark, collDir, indexDir, idCol, vecCol,
        params(indexDir))
      Files.deleteIfExists(refreshMarker(indexDir))
      return rebuilt
    }
    val p = params(indexDir)
    val (cur, changedDf, dropped) =
      Collections.changedSince(spark, collDir, prev)
    val changedBuckets = Collections.changedBuckets(prev, cur)
    val stale: Set[Int] = changedBuckets ++ dropped
    if (stale.isEmpty) return cur
    // serving memo: a memoized adjacency/seeds listing predates the
    // in-place swaps below (second evict at exit — a reader
    // re-memoizing mid-swap is stale too)
    ServedReads.evict(indexDir)
    val nb = Collections.numBuckets(collDir)
    val collLong = Collections.read(spark, collDir)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as(vecCol))

    val storedOrder = spark.read.parquet(s"$indexDir/order")
    val staleSeq = stale.toSeq.sorted.map(Int.box)
    val oldOrderCB = storedOrder
      .filter(col("src_bucket").isin(staleSeq: _*)) // partition-pruned
    val newRows = changedDf.select(col(idCol).cast("long").as("id"),
      col(vecCol).as(vecCol))
    val newOrderCB = orderOf(newRows, "id", vecCol, p)

    // C = every id the feed's granularity can have touched (old ∪ new)
    val oldIds = collectLongs(oldOrderCB.select("id").distinct())
    val newIds = collectLongs(newRows.select("id").distinct())
    val dead = oldIds -- newIds

    // Which live changed-bucket ids ACTUALLY changed their vector? The
    // feed's granularity is whole buckets, but superseded generation
    // dirs survive one write (the reader grace window), so the OLD rows
    // are usually still readable through the PREVIOUS manifest view —
    // diffing old vs new vectors shrinks "every id in a rewritten
    // bucket" to the true re-vectored set. A compact or payload-only
    // rewrite shrinks it to ∅, and the score-propagation rounds below
    // skip entirely — without this, every such refresh would pay ~full
    // NN-descent cost for provably-unchanged vectors. If the old state
    // is already GC'd, fall back to the conservative set (all live
    // changed ids) — soundness never depends on the grace window.
    val oldPathOf: Map[Int, String] = changedBuckets.iterator
      .flatMap(b => prev.buckets.get(b)
        .map(rel => b -> s"$collDir/data/$rel")).toMap
    val vecChanged: Set[Long] =
      if (oldPathOf.values.exists(pth => !Files.exists(Paths.get(pth))))
        newIds
      else if (oldPathOf.isEmpty) newIds // all-new buckets: pure inserts
      else {
        val olds = spark.read.parquet(oldPathOf.values.toSeq.sorted: _*)
          .select(col(idCol).cast("long").as("id"),
            col(vecCol).as("__oldvec"))
        // inserts (no old row) + rows whose vector is not byte-equal
        collectLongs(newRows.join(olds, Seq("id"), "left")
          .filter(!(col(vecCol) <=> col("__oldvec")))
          .select("id").distinct())
      }

    // ---- round 0: init-edge delta over affected LSH buckets -----------
    val aBuckets = oldOrderCB.select("band", "bkt")
      .union(newOrderCB.select("band", "bkt")).distinct()
    val newOrder = storedOrder
      .filter(!col("src_bucket").isin(staleSeq: _*))
      .select("id", "band", "bkt")
      .unionByName(newOrderCB)
    val oldEdgesA = initEdges(storedOrder.select("id", "band", "bkt")
      .join(broadcast(aBuckets), Seq("band", "bkt")), p.w)
    val newEdgesA = initEdges(newOrder
      .join(broadcast(aBuckets), Seq("band", "bkt")), p.w)
    val deltaE = oldEdgesA.exceptAll(newEdgesA)
      .union(newEdgesA.exceptAll(oldEdgesA))
    // dirty₀ = endpoints of membership-changed edges ∪ endpoints of
    // surviving edges incident to a RE-VECTORED node (same edge, new
    // score) ∪ the re-vectored/dead nodes themselves. Membership-only
    // changes are fully covered by deltaE; same-vector same-membership
    // rows in a rewritten bucket provably keep identical round-0 rows
    val incidentC = inIds(newEdgesA, "src", vecChanged)
      .union(inIds(newEdgesA, "dst", vecChanged))
    val d0 = collectLongs(
      deltaE.select("src").union(deltaE.select("dst"))
        .union(incidentC.select("src")).union(incidentC.select("dst"))
        .distinct()) ++ vecChanged ++ dead
    // recompute round-0 rows for d0: window edges of every bucket holding
    // a d0 member (under the new membership), symmetrized, incident to d0
    val bPlus = inIds(newOrder, "id", d0).select("band", "bkt").distinct()
    val e0 = initEdges(newOrder.join(broadcast(bPlus), Seq("band", "bkt")),
      p.w)
    val cand0 = inIds(e0, "src", d0)
      .union(inIds(e0, "dst", d0)
        .select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val r0 = GraphAnn.topM(scoreProbed(collLong, vecCol, cand0), p.m)
      .localCheckpoint(eager = true)
    // everything below mutates on-disk state; bracket it with the marker
    Files.write(refreshMarker(indexDir), Array.emptyByteArray)
    var (dp, oldDsts, newDsts) = mergeRound(spark, indexDir, 0, nb, d0, r0)

    // order + seeds swaps (safe now: no later step reads the OLD order)
    swapBucketDirs(spark, s"$indexDir/order", stale,
      newOrderCB.withColumn("src_bucket", pmod(hash(col("id")), lit(nb))))
    swapBucketDirs(spark, s"$indexDir/seeds", stale,
      newRows.select(col("id"), bucketCol("id", nb))
        .withColumn("__rk", row_number().over(Window
          .partitionBy("src_bucket").orderBy(
            Dedup.h32(concat(lit("gseed|"), col("id"))), col("id"))))
        .filter(col("__rk") <= p.seedCap).drop("__rk"))

    // ---- rounds 1..R: dirty-neighborhood recompute --------------------
    // A round may be SKIPPED only when (a) the previous round's diff is
    // empty AND (b) no live node's vector actually changed: with
    // unchanged g_{r-1} a changed vector can still flip a LATER round —
    // a pair (s, c) first formed at closure distance in round r scores
    // with c's new vector even though every earlier round's output was
    // bit-identical (micro-quantization makes such collisions possible).
    // vecChanged is exact when the old generation is still readable and
    // conservative (= all live changed ids) when it is not.
    for (r <- 1 to p.rounds) {
      if (dp.nonEmpty || vecChanged.nonEmpty) {
        val g = spark.read.parquet(roundPath(indexDir, r - 1))
          .select("src", "dst") // merged state == the rebuild's g_{r-1}
        def n1(ids: Set[Long]): Set[Long] =
          collectLongs(inIds(g, "src", ids).select(col("dst"))
            .union(inIds(g, "dst", ids).select(col("src"))).distinct())
        val u = dp ++ oldDsts ++ newDsts
        val t = u ++ vecChanged ++ n1(vecChanged)
        val s = t ++ n1(t)
        val undS = inIds(g, "src", s)
          .union(inIds(g, "dst", s)
            .select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        val undFull = g.union(
          g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        val closure = undS.as("a")
          .join(undFull.as("b"), col("a.dst") === col("b.src"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
          .filter(col("src") =!= col("dst"))
        val candR = undS.union(closure).distinct()
        val rr = GraphAnn.topM(scoreProbed(collLong, vecCol, candR), p.m)
          .localCheckpoint(eager = true)
        val next = mergeRound(spark, indexDir, r, nb, s, rr)
        dp = next._1; oldDsts = next._2; newDsts = next._3
      }
      // dp empty AND no possibly-revectored live nodes ⇒ round r-1 is
      // bit-identical to before and every remaining round has identical
      // inputs — nothing left to do (see vectorsMayHaveChanged above)
    }
    Files.deleteIfExists(refreshMarker(indexDir))
    ServedReads.evict(indexDir) // a read re-memoized mid-swap is stale
    cur
  }

  /** Diff recomputed rows (`repl`, for dirty-superset `s`) against the
    * stored round-r table, and merge-write ONLY the buckets holding a
    * truly-changed src. Returns (changed srcs, their old dsts, their new
    * dsts) — the propagation state for round r+1. Deleted nodes appear
    * as changed srcs with no replacement rows. */
  private def mergeRound(spark: SparkSession, indexDir: String, r: Int,
                         nb: Int, s: Set[Long], repl: DataFrame)
      : (Set[Long], Set[Long], Set[Long]) = {
    val path = roundPath(indexDir, r)
    val stored = spark.read.parquet(path)
    val storedS = inIds(stored, "src", s)
      .select("src", "dst", "score_micro", "rnk")
      .localCheckpoint(eager = true) // pre-swap rows must survive the swap
    val replS = repl.select("src", "dst", "score_micro", "rnk")
    val diff = storedS.exceptAll(replS).union(replS.exceptAll(storedS))
      .localCheckpoint(eager = true)
    val dp = collectLongs(diff.select("src").distinct())
    if (dp.isEmpty) return (dp, Set.empty, Set.empty)
    val oldDsts = collectLongs(
      inIds(storedS, "src", dp).select("dst").distinct())
    val newDsts = collectLongs(
      inIds(replS, "src", dp).select("dst").distinct())
    // dirty buckets = buckets of changed srcs; replacement content =
    // kept stored rows ∪ recomputed rows, staged then swapped
    import spark.implicits._
    val dirtyB = collectLongs(dp.toSeq.toDF("src")
        .select(pmod(hash(col("src")), lit(nb)).cast("long")).distinct())
      .map(_.toInt)
    val dirtySeq = dirtyB.toSeq.sorted.map(Int.box)
    val replacement = notInIds(
        stored.filter(col("src_bucket").isin(dirtySeq: _*))
          .select("src", "dst", "score_micro", "rnk"), "src", dp)
      .union(inIds(replS, "src", dp))
      .withColumn("src_bucket", pmod(hash(col("src")), lit(nb)))
    swapBucketDirs(spark, path, dirtyB, replacement)
    (dp, oldDsts, newDsts)
  }

  /** Staged bucket-dir swap (the [[IvfIndex.refresh]] commit shape):
    * write `replacement` under `_staging_refresh` first, then delete the
    * stale `src_bucket=` dirs and move staged dirs in (renames only —
    * a crash during the expensive write leaves the live table intact). */
  private def swapBucketDirs(spark: SparkSession, tableDir: String,
                             staleBuckets: Set[Int],
                             replacement: DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    val staging = Paths.get(tableDir, "_staging_refresh")
    if (Files.exists(staging)) Collections.deleteRecursively(staging)
    replacement.write.mode("overwrite").partitionBy("src_bucket")
      .parquet(staging.toString)
    staleBuckets.foreach { b =>
      val d = Paths.get(tableDir, s"src_bucket=$b")
      if (Files.exists(d)) Collections.deleteRecursively(d)
    }
    if (Files.isDirectory(staging)) {
      val ls = Files.list(staging)
      try ls.iterator().asScala
        .filter(d => Files.isDirectory(d) &&
          d.getFileName.toString.startsWith("src_bucket="))
        .foreach { d =>
          val dst = Paths.get(tableDir, d.getFileName.toString)
          if (Files.exists(dst)) Collections.deleteRecursively(dst)
          Files.move(d, dst)
        }
      finally ls.close()
      Collections.deleteRecursively(staging)
    }
  }
}
