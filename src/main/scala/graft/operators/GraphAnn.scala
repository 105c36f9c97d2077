package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.plans.TopKByScore

/** Graph-based ANN (the HNSW/NSW family) — the index class Qdrant
  * actually serves the reference's collections with
  * (`bob_vector_db/qdrant_embedder.py:92-103` creates cosine collections;
  * Qdrant's serving index for them is a navigable small-world graph).
  * IVF/LSH/PQ cover the batch probe story; this adds the
  * navigable-neighbor-graph story, re-expressed Spark-first:
  *
  * == Build: batch NN-descent in fixed oracle-replayable rounds ==
  *
  * A navigable graph needs, per node, edges to (approximately) its M
  * nearest neighbors. Sequential HNSW inserts points one at a time — a
  * driver-side loop that cannot scale. The batch equivalent is
  * **NN-descent** (Dong, Moses, Li — WWW'11 "Efficient K-Nearest Neighbor
  * Graph Construction for Generic Similarity Measures"): start from cheap
  * candidate edges, then repeat "a neighbor of my neighbor is probably my
  * neighbor" rounds. Every step is a relational operator:
  *
  *  1. **Init**: per LSH band (sign-random-projection buckets,
  *     [[Ann.hyperplanes]]), order each bucket by id and connect every
  *     node to its W successors — a per-bucket window `lead`, no
  *     all-pairs join anywhere (candidates ∝ n·W·bands, not n²).
  *  2. **Refine round** (×`rounds`): symmetrize the current edge set,
  *     join it to itself (neighbor-of-neighbor closure), re-score, and
  *     keep each node's top-M by the bounded-heap aggregate
  *     ([[TopKByScore]] — only |partitions|·M rows per node cross the
  *     shuffle, the same one-pass physical form the kNN queries use).
  *
  * Every selection orders on the MICRO-QUANTIZED cosine
  * (`floor(cos·1e6 + 0.5)`, ties by neighbor id), so construction is
  * bit-replayable by the DuckDB oracle — the same determinism contract
  * as [[Ann.kmeansFit]]: the gate covers the index BUILD, not just the
  * search.
  *
  * == Serve: fixed-round beam search ==
  *
  * Entry frontier = the `beam` lowest ids (deterministic seeds); each
  * round expands the frontier through the adjacency table, scores the
  * candidates against the query, and keeps the best `beam`
  * (score DESC, id ASC). The frontier is beam-bounded, so each round is
  * a literal `isin` probe into the materialized adjacency — parquet
  * row-group pruning via PushedFilters on `src`, exactly how a 100 TB
  * serving read wants the graph laid out (adjacency bucketed/sorted by
  * src; a probe touches O(beam) row groups, never the corpus). Since the
  * frontier always re-enters the candidate set, best-so-far is retained
  * and the final frontier IS the answer (beam ≥ k).
  *
  * Scale notes: build shuffles ∝ edges (n·M·fan-out), never pairs; the
  * per-bucket init window partitions by bucket (no global sort); serving
  * touches O(beam·M·rounds) rows. The single-machine HNSW insert loop is
  * the one thing deliberately NOT reproduced — it is the part that
  * cannot run on a cluster.
  */
object GraphAnn {

  /** Candidate pairs from one LSH-band ordering: per bucket (6-plane
    * sign-projection), connect each node to its `w` id-successors. */
  private def bandPairs(coll: DataFrame, idCol: String, vecCol: String,
                        planes: Seq[Seq[Double]], w: Int): DataFrame = {
    val win = Window.partitionBy(col("__bkt")).orderBy(col(idCol))
    coll.select(col(idCol), col(vecCol))
      .withColumn("__bkt", Ann.lshBucket(col(vecCol), planes))
      // windows first, generator after: Spark forbids a window inside a
      // generator expression
      .select(col(idCol).as("src"),
        array((1 to w).map(i => lead(col(idCol), i).over(win)): _*)
          .as("__succ"))
      .select(col("src"), explode(col("__succ")).as("dst"))
      .filter(col("dst").isNotNull)
  }

  /** Micro-quantized cosine for every (src, dst) pair — the scoring
    * shared by build rounds. Vectors arrive by two equi-joins on id (at
    * scale: shuffle ∝ candidate edges). */
  private[graft] def scoreEdges(coll: DataFrame, idCol: String, vecCol: String,
                         pairs: DataFrame): DataFrame =
    pairs
      .join(coll.select(col(idCol).as("src"), col(vecCol).as("__sv")), "src")
      .join(coll.select(col(idCol).as("dst"), col(vecCol).as("__dv")), "dst")
      .withColumn("__sm",
        floor(VectorOps.cosine(col("__sv"), col("__dv")) * 1e6 + lit(0.5))
          .cast("double"))
      .filter(col("__sm").isNotNull)
      .select(col("src"), col("dst"), col("__sm"))

  /** Per-src bounded-heap top-M by (score DESC, dst ASC) → ranked
    * adjacency rows (src, dst, score_micro, rnk). */
  private[graft] def topM(scored: DataFrame, m: Int): DataFrame =
    scored.groupBy("src")
      .agg(TopKByScore.topK(col("__sm"), col("dst"), m).as("__tk"))
      .select(col("src"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("src"), col("__e.id").as("dst"),
        col("__e.score").cast("long").as("score_micro"),
        (col("__pos") + 1).cast("long").as("rnk"))

  /** Build the ranked adjacency table (src, dst, score_micro, rnk):
    * LSH-band init + `rounds` NN-descent refinement rounds, each
    * fully deterministic (micro scores, id tie-breaks). `planes` must
    * hold `bands · planesPerBand` hyperplanes ([[Ann.hyperplanes]]). */
  def buildGraph(coll: DataFrame, idCol: String, vecCol: String,
                 planes: Seq[Seq[Double]], bands: Int, planesPerBand: Int,
                 w: Int, m: Int, rounds: Int): DataFrame = {
    require(planes.length == bands * planesPerBand,
      s"need ${bands * planesPerBand} planes, got ${planes.length}")
    val init = (0 until bands)
      .map(b => bandPairs(coll, idCol, vecCol,
        planes.slice(b * planesPerBand, (b + 1) * planesPerBand), w))
      .reduce(_ union _)
    val sym = init.union(init.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    // each refine round references the previous adjacency FOUR times
    // (symmetrize ×2, closure join ×2) — left as lineage, the LOGICAL
    // plan grows 4^r (persist alone doesn't help: cache substitution
    // happens at physical planning, but Catalyst must still analyze the
    // exponential tree — measured: the r=4 build spun the driver for
    // >25 min at sf0.01 before OOM). localCheckpoint truncates the plan
    // to the materialized rows each round — the standard iterative-
    // algorithm discipline (at multi-TB scale: a reliable checkpoint /
    // per-round table instead of executor-local blocks).
    var adj = topM(scoreEdges(coll, idCol, vecCol, sym), m)
      .localCheckpoint(eager = true)
    for (_ <- 0 until rounds) {
      val und = adj.select("src", "dst")
        .union(adj.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val closure = und.as("a")
        .join(und.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
      adj = topM(
        scoreEdges(coll, idCol, vecCol, und.union(closure).distinct()), m)
        .localCheckpoint(eager = true)
    }
    adj
  }

  /** How many entry seeds [[buildGraphIndex]] persists — the serving
    * `beam` must be ≤ this (beam 10–64 covers the HNSW ef range the
    * reference's Qdrant collections serve with). */
  val SeedCap = 64

  /** Deterministic entry points, SCATTERED across the collection by a
    * salted 32-bit hash of the id (the pipe_sample membership contract):
    * a navigable-graph search without HNSW's long-range upper layers
    * needs at least one seed near the query's region, and the `cap`
    * lowest ids could all fall in one cluster. Plans to
    * TakeOrderedAndProject — a bounded heap, one pass; run at BUILD time
    * only (the seed list is query-independent, so scanning the corpus per
    * query for it would be pure waste — HNSW's persistent-entry-point
    * discipline). */
  def seedIds(coll: DataFrame, idCol: String, cap: Int): Array[Long] =
    coll
      .orderBy(Dedup.h32(concat(lit("gseed|"), col(idCol))), col(idCol))
      .limit(cap)
      .select(col(idCol).cast("long")).collect().map(_.getLong(0))

  /** Above this many literal ids an `IN` probe stops being the right
    * plan — planning cost grows with the literal count and pushdown
    * degrades — so [[inIds]] falls back to a broadcast semi-join. One
    * constant for the whole graph family ([[graft.sources.GraphIndex]]
    * delegates here). Runtime-tunable via `graft.graph.probeLimit` so
    * specs can force the fallback path on fixture-sized id sets. */
  val ProbeLimit = 10000

  private[graft] def probeLimit(spark: SparkSession): Int =
    spark.conf.getOption("graft.graph.probeLimit")
      .map(_.toInt).getOrElse(ProbeLimit)

  /** Literal-probe filter with broadcast-semi-join fallback above
    * [[ProbeLimit]] — row-identical either way (spec-gated); only the
    * physical probe changes. Batched serving can push hundreds of
    * queries × beam·(M+1) ids through one probe, which crosses the
    * literal budget exactly when batching pays off most. */
  private[graft] def inIds(df: DataFrame, c: String, ids: Seq[Long]): DataFrame =
    if (ids.isEmpty) df.limit(0)
    else if (ids.sizeIs <= probeLimit(df.sparkSession))
      df.filter(col(c).isin(ids.map(Long.box): _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(ids.toDF(c)), Seq(c), "leftsemi")
    }

  /** Pin a DRIVER-BOUNDED frame locally (collect → local relation with
    * the same schema) and return it with the distinct long ids under
    * `idCol` — the shared "materialize the candidate set, then
    * literal-probe a store for exactly those ids" idiom of the batched
    * serving paths (one definition, so ProbeLimit/null-id/duplicate
    * fixes land everywhere at once). Caller contract: `df` is already
    * bounded (per-query heaps), never a corpus-scaling frame — and the
    * contract is CHECKED, not hoped: the collect reads at most
    * probeLimit+1 rows (driver memory bounded by construction, the
    * [[inIdsFrame]] discipline) and fails loudly past the limit or on a
    * NULL id, instead of OOMing or NPEing three calls later. */
  private[graft] def pinWithIds(df: DataFrame, idCol: String)
      : (DataFrame, Seq[Long]) = {
    val spark = df.sparkSession
    val limit = probeLimit(spark)
    val rows = df.limit(limit + 1).collect()
    require(rows.length <= limit,
      s"pinWithIds: candidate frame exceeds $limit rows — the caller's " +
        "driver-bounded contract is violated (batched candidates must " +
        "be per-query-heap bounded)")
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
    val idx = df.schema.fieldIndex(idCol)
    (local, rows.map { r =>
      require(!r.isNullAt(idx),
        s"pinWithIds: NULL $idCol in the candidate frame — ids must be " +
          "integral and non-null (the literal-probe contract)")
      r.getAs[Number](idx).longValue
    }.distinct.toSeq)
  }

  /** [[inIds]] for a DISTRIBUTED candidate id frame (one id column):
    * collect at most ProbeLimit ids for the literal probe — driver
    * memory is bounded BY CONSTRUCTION via limit(), not by hoping the
    * set is small — and a larger set never reaches the driver at all:
    * the probe becomes a distributed left-semi join against the
    * candidate frame. The sizing pass reads `limit+1` rows of `cands`
    * (cheap — the candidate computation is already pruned/bounded by
    * its own plan). */
  private[graft] def inIdsFrame(df: DataFrame, c: String,
                                cands: DataFrame): DataFrame = {
    val limit = probeLimit(df.sparkSession)
    // materialize the candidate ids ONCE (localCheckpoint — the sizing
    // collect and, on the large path, the semi-join both read the
    // materialized rows; without it the semi-join would re-execute the
    // whole candidate computation. Blocks are released by the
    // ContextCleaner once the frame is GC'd — the buildGraph
    // discipline).
    val idsDf = cands.select(col(c).cast("long").as(c))
      .localCheckpoint(eager = true)
    val sample = idsDf.limit(limit + 1).collect()
    if (sample.length <= limit)
      inIds(df, c, sample.map(_.getLong(0)).toSeq)
    else
      df.join(idsDf, Seq(c), "leftsemi")
  }

  /** The serving-side candidate fetch: a LITERAL id `IN` probe into the
    * collection, so the scan prunes row groups via PushedFilters — the
    * same discipline as the adjacency probe and `coll_get`. At 100 TB
    * this touches O(|ids|) row groups; a join against the corpus (the
    * rejected alternative) would read every row group of the collection
    * per serving round. `ids` is beam-bounded per query; batched unions
    * can cross [[ProbeLimit]], where [[inIds]] switches probes. */
  private[graft] def collectionProbe(coll: DataFrame, idCol: String,
                                     ids: Seq[Long]): DataFrame =
    inIds(coll, idCol, ids)

  /** Materialize the serving layout:
    *
    *  - `indexDir/` — the ranked adjacency, RANGE-partitioned and sorted
    *    by `src`: per-file AND per-row-group min/max on `src` stay tight,
    *    so a beam probe (`src IN (frontier)`) prunes at both granularities
    *    (PushedFilters), and the write parallelizes across the range
    *    partitions (a single-file write would serialize the whole graph
    *    through one task — the opposite of the 100 TB story).
    *  - `indexDir/_seeds/` — the persistent entry points (seed_rank, id),
    *    [[SeedCap]] rows. Underscore-prefixed, so a plain parquet read of
    *    `indexDir` still sees only the adjacency.
    *
    * A derived layout, rebuildable byte-identically from the collection
    * (the IVF index-dir discipline). */
  def buildGraphIndex(coll: DataFrame, idCol: String, vecCol: String,
                      planes: Seq[Seq[Double]], bands: Int,
                      planesPerBand: Int, w: Int, m: Int, rounds: Int,
                      indexDir: String): Unit = {
    val spark = coll.sparkSession
    import spark.implicits._
    val adj = buildGraph(coll, idCol, vecCol, planes, bands, planesPerBand,
      w, m, rounds)
    // explicit partition count ∝ edges (~1M rows ≈ 30 MB per file), never
    // below 2: the count pins the write's parallelism AND stops AQE from
    // coalescing a small build back into the single-file bottleneck;
    // adj is localCheckpoint'd, so the count reads materialized rows
    val parts = math.max(2, (adj.count() / 1000000L).toInt + 1)
    adj.repartitionByRange(parts, col("src")).sortWithinPartitions("src")
      .write.mode("overwrite").parquet(indexDir)
    // adj is localCheckpoint'd; its blocks are released by the
    // ContextCleaner once the RDD reference is GC'd after this frame —
    // an explicit unpersist() would NOT free checkpoint blocks (it only
    // touches cache storage) and was removed as misleading (r9 ADVICE)
    // seeds are O(SeedCap) rows — one file is the right layout for them
    seedIds(coll, idCol, SeedCap).zipWithIndex
      .map { case (id, i) => ((i + 1).toLong, id) }.toSeq
      .toDF("seed_rank", "id")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_seeds")
    graft.sources.ServedReads.evict(indexDir)
  }

  /** Serving entry point over a materialized index: beam search using the
    * index's PERSISTED entry seeds — no per-query corpus pass of any
    * kind. Reads: `rounds` adjacency probes + at most `rounds` collection
    * probes, all literal-`IN` pruned. */
  def beamSearchIndexed(coll: DataFrame, idCol: String, vecCol: String,
                        indexDir: String, query: Seq[Double], beam: Int,
                        rounds: Int, k: Int): DataFrame = {
    require(beam <= SeedCap,
      s"beam=$beam exceeds the $SeedCap persisted seeds — rebuild the " +
        s"index with a larger SeedCap or lower the beam")
    val spark = coll.sparkSession
    val seeds = graft.sources.ServedReads.of(spark, s"$indexDir/_seeds")
      .orderBy("seed_rank").limit(beam)
      .select(col("id")).collect().map(_.getLong(0))
    beamSearchFrom(coll, idCol, vecCol, graft.sources.ServedReads.of(spark, indexDir),
      seeds, query, beam, rounds, k)._1
  }

  /** FILTERED traversal over a materialized index (the filtrable-HNSW
    * serving shape a real vector server uses for mid-selectivity
    * filters): the beam ROUTES exactly as [[beamSearchIndexed]] —
    * filtered-out nodes stay usable as hops, so the walk still follows
    * the graph's geometry toward the query — while the RESULT pool is
    * every VISITED node that passes `pred`, accumulated across rounds,
    * and the answer is its top-`k` by (score DESC, id ASC). Contrast
    * with candidate post-filtering (filter the final beam's k rows),
    * which under-returns whenever the filter kills most of the beam:
    * here the pool is the whole ≈ beam·(M+1)·rounds visited set, so a
    * 1/s-selective filter still fills k while s ≲ visited/k. The
    * predicate is evaluated ON the same collection probe that scores a
    * candidate (no extra jobs; NULL coerces to false — the DSL
    * translator's must_not rule), and the traversal itself is
    * UNCHANGED by the filter, so the unfiltered gates cannot move.
    * Fully oracle-replayable: the pool is the union of the per-round
    * scored sets (`v_auto_filtered_graph` replays it). */
  def beamSearchIndexedFiltered(coll: DataFrame, idCol: String,
                                vecCol: String, indexDir: String,
                                query: Seq[Double], beam: Int, rounds: Int,
                                k: Int, pred: Column): DataFrame = {
    require(beam <= SeedCap,
      s"beam=$beam exceeds the $SeedCap persisted seeds")
    val spark = coll.sparkSession
    val seeds = graft.sources.ServedReads.of(spark, s"$indexDir/_seeds")
      .orderBy("seed_rank").limit(beam)
      .select(col("id")).collect().map(_.getLong(0))
    beamSearchFrom(coll, idCol, vecCol, graft.sources.ServedReads.of(spark, indexDir),
      seeds, query, beam, rounds, k, resultPred = Some(pred))._1
  }

  /** BATCHED serving over a materialized index — the [[graft.operators.Knn.knnMulti]]
    * analog for the graph path: N queries advance their beams in
    * lock-step, sharing ONE adjacency probe (union of live frontiers)
    * and ONE collection probe (union of unscored candidates, one score
    * column per live query) per round. Total jobs: 1 seed read +
    * ≤ 2·rounds — independent of the batch size, vs 2·rounds per query
    * served one at a time. Scores come from the identical per-query
    * Catalyst expression the single-query path evaluates, so each
    * query's rows equal its [[beamSearchIndexed]] result exactly
    * (spec-gated). With `resultPred` (ONE shared predicate — the
    * shared-filter `query_batch_points` shape) the batch runs the
    * FILTERED-traversal contract of [[beamSearchIndexedFiltered]]:
    * routing unchanged, each query answering from its own cumulative
    * visited∩passing pool, the predicate riding the shared probes at
    * zero extra jobs. Returns (query_id, rnk, id, score_micro). */
  def beamSearchMultiIndexed(coll: DataFrame, idCol: String, vecCol: String,
                             indexDir: String,
                             queries: Seq[(Long, Seq[Double])], beam: Int,
                             rounds: Int, k: Int,
                             resultPred: Option[Column] = None)
      : DataFrame = {
    require(k <= beam, s"k=$k must be <= beam=$beam")
    require(beam <= SeedCap,
      s"beam=$beam exceeds the $SeedCap persisted seeds")
    // the per-query driver state is keyed by query id — duplicates
    // would silently collapse two requests into one
    require(queries.map(_._1).distinct.length == queries.length,
      "beamSearchMultiIndexed: duplicate query ids in the batch")
    Knn.requireBatch(queries.length, "beamSearchMultiIndexed")
    val spark = coll.sparkSession
    import spark.implicits._
    val seeds = graft.sources.ServedReads.of(spark, s"$indexDir/_seeds")
      .orderBy("seed_rank").limit(beam)
      .select(col("id")).collect().map(_.getLong(0))
    val adj = graft.sources.ServedReads.of(spark, indexDir)
    val qScore: Map[Long, Column] = queries.map { case (qid, q) =>
      qid -> floor(VectorOps.cosine(col(vecCol), typedLit(q)) * 1e6 +
        lit(0.5)).cast("long")
    }.toMap
    // per-query driver state (each ≤ beam·(M+1)·rounds entries)
    val frontier = scala.collection.mutable.Map(
      queries.map { case (qid, _) => qid -> seeds.take(beam) }: _*)
    val candidates = scala.collection.mutable.Map(
      queries.map { case (qid, _) => qid -> seeds.take(beam) }: _*)
    val cache = scala.collection.mutable.Map(
      queries.map { case (qid, _) =>
        qid -> scala.collection.mutable.LongMap.empty[Long] }: _*)
    val unscorable = scala.collection.mutable.Map(
      queries.map { case (qid, _) =>
        qid -> scala.collection.mutable.Set.empty[Long] }: _*)
    val converged = scala.collection.mutable.Map(
      queries.map { case (qid, _) => qid -> seeds.isEmpty }: _*)
    // filtered traversal (one shared predicate for the batch — the
    // shared-filter query_batch_points shape): ids that passed, and the
    // cumulative per-query VISITED sets forming the result pools
    val passing = scala.collection.mutable.Set.empty[Long]
    val visited = scala.collection.mutable.Map(
      queries.map { case (qid, _) =>
        qid -> scala.collection.mutable.Set.empty[Long] }: _*)
    for (_ <- 0 until rounds if converged.values.exists(!_)) {
      val live = queries.map(_._1).filter(q => !converged(q))
      // ONE adjacency probe for every live query's frontier
      val probeSrcs = live.flatMap(frontier(_)).distinct
      val nbrMap: Map[Long, Array[Long]] =
        if (probeSrcs.isEmpty) Map.empty
        else inIds(adj, "src", probeSrcs)
          .select(col("src").cast("long"), col("dst").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      live.foreach { q =>
        candidates(q) = (frontier(q) ++
          frontier(q).flatMap(nbrMap.getOrElse(_, Array.empty[Long])))
          .distinct
        visited(q) ++= candidates(q)
      }
      // ONE collection probe for every query's unscored candidates,
      // one score column per live query (+ one shared predicate column
      // when filtering — still one probe)
      val missing = live.flatMap(q => candidates(q)
        .filterNot(id => cache(q).contains(id) || unscorable(q)(id)))
        .distinct
      if (missing.nonEmpty) {
        val passCol = resultPred
          .map(p => coalesce(p, lit(false)).cast("boolean"))
          .getOrElse(lit(true))
        val got = collectionProbe(coll, idCol, missing)
          .select((col(idCol).cast("long") +:
            live.map(q => qScore(q).as(s"__sm_$q"))) :+
            passCol.as("__ok"): _*)
          .collect()
        got.foreach { r =>
          val id = r.getLong(0)
          live.zipWithIndex.foreach { case (q, i) =>
            if (r.isNullAt(i + 1)) unscorable(q) += id
            else cache(q)(id) = r.getLong(i + 1)
          }
          if (r.getBoolean(live.length + 1)) passing += id
        }
        val found = got.map(_.getLong(0)).toSet
        live.foreach(q => unscorable(q) ++= missing.toSet -- found)
      }
      live.foreach { q =>
        val ranked = candidates(q).filter(cache(q).contains)
          .sortBy(id => (-cache(q)(id), id))
        converged(q) = frontier(q).sameElements(ranked.take(beam))
        frontier(q) = ranked.take(beam)
      }
    }
    // unfiltered: each query's final-round candidate set (pre-r13
    // contract, bit-unchanged); filtered: the query's OWN cumulative
    // visited set ∩ passing — cache(q) alone would leak ids probed only
    // for other queries in the shared probes
    def pool(qid: Long): Array[Long] =
      if (resultPred.isEmpty) candidates(qid).filter(cache(qid).contains)
      else visited(qid).iterator
        .filter(id => cache(qid).contains(id) && passing(id)).toArray
    queries.flatMap { case (qid, _) =>
      pool(qid)
        .sortBy(id => (-cache(qid)(id), id)).take(k)
        .zipWithIndex
        .map { case (id, i) => (qid, (i + 1).toLong, id, cache(qid)(id)) }
    }.toDF("query_id", "rnk", "id", "score_micro")
  }

  /** Fixed-round beam search over a (materialized or in-memory) ranked
    * adjacency, seeding from the collection (dev/spec path — the serving
    * path is [[beamSearchIndexed]], which reads persisted seeds).
    * Returns (rnk, id, score_micro) — the top `k` of the final candidate
    * set, k ≤ beam. */
  def beamSearch(coll: DataFrame, idCol: String, vecCol: String,
                 adj: DataFrame, query: Seq[Double], beam: Int,
                 rounds: Int, k: Int): DataFrame =
    beamSearchProbe(coll, idCol, vecCol, adj, query, beam, rounds, k)._1

  /** [[beamSearch]] plus the DISTINCT candidate count it examined — the
    * budget side of the recall/budget trade (spec: graph recall at a
    * fraction of IVF's candidate budget). */
  def beamSearchProbe(coll: DataFrame, idCol: String, vecCol: String,
                      adj: DataFrame, query: Seq[Double], beam: Int,
                      rounds: Int, k: Int): (DataFrame, Long) =
    beamSearchFrom(coll, idCol, vecCol, adj,
      seedIds(coll, idCol, beam), query, beam, rounds, k)

  /** The shared beam-search core. Each round:
    *
    *  1. expand the beam-bounded frontier through the adjacency
    *     (`src IN (frontier)` — PushedFilters row-group pruning);
    *  2. score ONLY candidates not already scored, via a literal id
    *     probe into the collection ([[collectionProbe]] — the scan reads
    *     O(new candidates) row groups, never the corpus; scores are
    *     deterministic, so caching across rounds cannot change a result);
    *  3. rank the round's candidate set driver-side from the cache and
    *     keep the best `beam` — rank-and-truncate costs no extra job.
    *
    * Total reads per query: ≤ `rounds` adjacency probes + ≤ `rounds`
    * collection probes, each literal-pruned and beam·(M+1)-bounded — vs
    * the rejected broadcast-join form whose collection side re-read ALL
    * row groups every round. Driver state is ≤ beam·(M+1)·rounds cached
    * (id, score) pairs. Ids must be integral (cast to long). */
  private[graft] def beamSearchFrom(coll: DataFrame, idCol: String, vecCol: String,
                             adj: DataFrame, seeds: Array[Long],
                             query: Seq[Double], beam: Int, rounds: Int,
                             k: Int,
                             resultPred: Option[Column] = None)
      : (DataFrame, Long) = {
    require(k <= beam, s"k=$k must be <= beam=$beam")
    val spark = coll.sparkSession
    import spark.implicits._
    val qScore =
      floor(VectorOps.cosine(col(vecCol), typedLit(query)) * 1e6 + lit(0.5))
        .cast("long")
    // driver-side score cache: id -> micro score; unscorable (null/invalid
    // vector) ids are remembered too so they are never re-probed
    val cache = scala.collection.mutable.LongMap.empty[Long]
    val unscorable = scala.collection.mutable.Set.empty[Long]
    // filtered traversal: ids whose row passed resultPred — eligible for
    // the RESULT pool (traversal/frontier ignores this entirely)
    val passing = scala.collection.mutable.Set.empty[Long]
    def score(ids: Seq[Long]): Unit = {
      val missing = ids.filterNot(i => cache.contains(i) || unscorable(i))
      if (missing.nonEmpty) {
        // the predicate rides the SAME probe that scores the candidate —
        // filtering costs no extra job; NULL coerces to false (the DSL
        // translator's must_not rule)
        val passCol = resultPred
          .map(p => coalesce(p, lit(false)).cast("boolean"))
          .getOrElse(lit(true))
        val got = collectionProbe(coll, idCol, missing)
          .select(col(idCol).cast("long"), qScore.as("__sm"),
            passCol.as("__ok"))
          .collect()
        got.foreach { r =>
          if (r.isNullAt(1)) unscorable += r.getLong(0)
          else {
            cache(r.getLong(0)) = r.getLong(1)
            if (r.getBoolean(2)) passing += r.getLong(0)
          }
        }
        // ids absent from the collection (dangling adjacency edges) are
        // unscorable as well
        unscorable ++= missing.toSet -- got.map(_.getLong(0))
      }
    }
    var frontier: Array[Long] = seeds.take(beam)
    var candidates: Array[Long] = frontier
    // an empty collection has no seeds — the search is trivially empty
    var converged = frontier.isEmpty
    for (_ <- 0 until rounds if !converged) {
      val nbrs = inIds(adj, "src", frontier.toSeq)
        .select(col("dst").cast("long")).collect().map(_.getLong(0))
      candidates = (frontier ++ nbrs).distinct
      score(candidates.toSeq)
      // rank by (score DESC, id ASC) from the cache — no extra job
      val ranked = candidates.filter(cache.contains)
        .sortBy(id => (-cache(id), id))
      // fixed point: an unchanged frontier re-derives the identical
      // candidate set next round — skipping the remaining rounds cannot
      // change the result (exactness preserved: with a resultPred the
      // pool is the union of per-round scored sets, and a fixed frontier
      // re-derives the identical set, adding nothing)
      converged = frontier.sameElements(ranked.take(beam))
      frontier = ranked.take(beam)
    }
    // unfiltered: the final round's candidate set (the pre-r13 contract,
    // bit-unchanged); filtered: every VISITED passing node — the cache
    // IS the union of the rounds' scored sets
    val pool =
      if (resultPred.isEmpty) candidates.filter(cache.contains)
      else cache.keysIterator.filter(passing).toArray
    val top = pool
      .sortBy(id => (-cache(id), id)).take(k)
      .zipWithIndex
      .map { case (id, i) => ((i + 1).toLong, id, cache(id)) }
    (top.toSeq.toDF("rnk", "id", "score_micro"), cache.size.toLong)
  }
}
