package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines — the
  * content-level counterpart of the reference's same-id upsert overwrite
  * (`bob_vector_db/qdrant_embedder.py:130-143`, SURVEY.md §2.2 V5/V6).
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on the content digest with map-side
  *    partial aggregation — the optimal distributed form;
  *  - MinHash+LSH is the near-dup scale path: candidate volume is
  *    proportional to the number of band-bucket collisions (≈ near-dup
  *    density), never O(n²); the only shuffles are the signature
  *    aggregation (keyed by doc) and the band self-join (keyed by
  *    band+signature, uniformly hashed);
  *  - SimHash gives a per-doc 60-bit signature in one fused compiled
  *    pass (TokensSimHashExpr — no explode, no shuffle);
  *    pairing buckets on signature bands (simhashBands/simhashCandidates —
  *    the Manku prefix-bucketing form), an equi-join that never goes
  *    all-pairs; hamming is verified exactly on the candidates only;
  *  - n-gram Jaccard joins only pairs that SHARE a shingle (an inverted-
  *    index join), so cost tracks shared-content volume, and at scale it
  *    runs on LSH candidates rather than the raw corpus.
  *
  * All hashes are md5-derived (first 8 hex chars → 32-bit int) so the
  * DuckDB oracle can recompute every pipeline bit-for-bit; arithmetic is
  * integer-only, immune to float drift.
  */
object Dedup {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Word n-gram shingles of a token array; documents shorter than n
    * tokens contribute their whole token list as a single shingle.
    * Fused compiled construction (ShinglesExpr) — byte-identical strings
    * to the transform/slice/array_join HOF chain it replaces. */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(toks), n))

  /** 32-bit hash of a (seed-namespaced) string: first 8 md5 hex chars. */
  def h32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Driver-side twin of [[h32]] (bit-identical): for query-literal
    * construction — sparse query buckets, sketch probe cells. */
  def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Driver-side twin of the fused tokens→MinHash kernel
    * (`TokensMinHashExpr` / `MinHashUtil.sig`), bit-identical on any text
    * [[tokens]] would tokenize (lowercase is Locale.ROOT — the
    * locale-independent path UTF8String.toLowerCase takes for ASCII):
    * for query-literal probe construction (a single-document dedup-index
    * lookup builds its band signatures with ZERO Spark jobs). Spec-pinned
    * against the compiled kernel on fixture documents. */
  def minhashLocal(text: String, shingleN: Int, numHashes: Int): Array[Long] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    val out = Array.fill(numHashes)(Long.MaxValue)
    def fold(h: Long): Unit = {
      var s = 0
      while (s < numHashes) {
        val v = ((2L * s + 3L) * h + 104729L * s + 12345L) % 2147483647L
        if (v < out(s)) out(s) = v
        s += 1
      }
    }
    if (toks.length >= shingleN) {
      var i = 0
      while (i <= toks.length - shingleN) {
        fold(h32(toks.slice(i, i + shingleN).mkString(" ")))
        i += 1
      }
    } else fold(h32(toks.mkString(" ")))
    out
  }

  /** MinHash signatures: one row per (id, seed) with the min hash over the
    * doc's distinct shingles. Each shingle is md5-hashed ONCE to a 32-bit
    * base value; the per-seed hash family is arithmetic
    * (`(2s+3)·h + 104729·s + 12345 mod 2³¹−1` — a universal-hash-style
    * affine family, exact in 64-bit on any engine), so the expensive md5
    * does not scale with numHashes. Two hash-aggregations, both map-side
    * combinable. */
  def minhash(docs: DataFrame, idCol: String, textCol: String,
              numHashes: Int, shingleN: Int = 3): DataFrame =
    // The whole signature comes from one fused compiled pass over the
    // token array (TokensMinHashExpr): shingle strings are never
    // materialized, there is no distinct (a duplicate cannot change a
    // min), no explode of hash rows, no data-dependent shuffle.
    // Benchmarked ~10× over the equivalent 4-layer HOF chain, which
    // evaluated interpreted lambdas per shingle per seed. Par.spread
    // repairs single-split local parallelism only (no-op at scale).
    Par.spread(docs)
      .select(col(idCol),
        posexplode(org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.TokensMinHashExpr(
            org.apache.spark.sql.GraftSqlBridge.expression(
              tokens(col(textCol))),
            shingleN, numHashes)))
          .as(Seq("seed", "minhash")))

  /** (id, band, band_sig) rows straight from the fused in-row MinHash
    * signature: the signature array never explodes to (seed, minhash)
    * rows, so there is NO (id, band) aggregation shuffle — banding is a
    * narrow projection + posexplode of `numHashes/rowsPerBand` small
    * strings per doc. Output is row-identical to
    * `lshBands(minhash(docs, ...), ...)` (spec-asserted); that exploded
    * twin remains for signature-level analysis (e.g. the monotonicity
    * property test). */
  def lshBandsFused(docs: DataFrame, idCol: String, textCol: String,
                    numHashes: Int, shingleN: Int = 3,
                    rowsPerBand: Int = 4,
                    carryCols: Seq[String] = Nil): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"$rowsPerBand rows/band must divide $numHashes hashes")
    // carryCols ride along unchanged (e.g. the event-time column a
    // streaming consumer's watermark is pinned to — dropping it here
    // would strip the watermark tag before the stateful operator)
    val carried = carryCols.map(col)
    Par.spread(docs)
      .select(col(idCol) +: carried :+
        org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.TokensMinHashExpr(
            org.apache.spark.sql.GraftSqlBridge.expression(
              tokens(col(textCol))),
            shingleN, numHashes)).as("__sig"): _*)
      .select(col(idCol) +: carried :+
        posexplode(transform(
          sequence(lit(0), lit(numHashes / rowsPerBand - 1)),
          b => array_join(
            transform(
              slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              m => m.cast("string")), "-")))
          .as(Seq("band", "band_sig")): _*)
  }

  /** LSH banding: group each doc's signature into bands of `rowsPerBand`
    * hashes; the band signature is the ordered minhash concatenation. */
  def lshBands(sig: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    sig
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy(idCol, "band")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
          s => s.getField("minhash").cast("string")), "-").as("band_sig"))

  /** Candidate near-dup pairs: docs colliding in ≥1 band. Output
    * (doc_a < doc_b), distinct. `maxBucket` is the super-bucket cap —
    * the same skewed-corpus knob as [[simhashCandidates]] (None keeps
    * exact banded semantics for the oracle-gated query). */
  def lshCandidates(bands: DataFrame, idCol: String,
                    maxBucket: Option[Int] = None): DataFrame =
    bandedPairs(bands, Seq("band", "band_sig"), idCol, maxBucket)

  /** SimHash: 60-bit signature (60 bits keeps every intermediate positive
    * in a signed 64-bit int in both engines). Token weight = occurrence
    * count (tokens are NOT distinct'd). One fused compiled pass per doc
    * (TokensSimHashExpr) — the signature never leaves the row, zero
    * shuffle. The empty-token filter matches the explode twin (and the
    * oracle): a doc with no tokens has no signature, it does not
    * contribute a zero-vote sig. NOTE the r2 "nested-HOF 27× slower"
    * finding applied to INTERPRETED HOF lambdas; this is a codegen
    * expression, benchmarked faster than the explode form it replaces
    * (see SURVEY §8.4 r3). */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 60): DataFrame =
    Par.spread(docs)
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col(idCol),
        org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.TokensSimHashExpr(
            org.apache.spark.sql.GraftSqlBridge.expression(col("__tk")),
            bits)).as("simhash"))

  /** The explode + two-aggregation twin of [[simhash]] — kept as the
    * cross-check surface (OperatorSpec asserts bit-equality with the
    * fused form, the same twin pattern as cosine HOF vs codegen). */
  def simhashExplode(docs: DataFrame, idCol: String, textCol: String,
                     bits: Int = 60): DataFrame =
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .select(col(idCol),
        conv(substring(md5(col("__tok")), 1, 15), 16, 10).cast("long").as("h"))
      .withColumn("j", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("c", expr("CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END"))
      .groupBy(idCol, "j")
      .agg(sum("c").as("s"))
      .groupBy(idCol)
      .agg(sum(expr("CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END"))
        .as("simhash"))

  /** Band a simhash signature into `bands` equal-width bit groups: one row
    * per (id, band, band_bits). This is the Manku-style prefix bucketing
    * that replaces the all-pairs hamming join at scale — pairing becomes an
    * equi-join on (band, band_bits). Pigeonhole guarantee: a pair differing
    * in h bits touches at most h bands, so any pair with hamming <= bands-1
    * collides in at least one band (exact recall); looser thresholds (up to
    * the verify cutoff) are found iff some band happens to be untouched —
    * the standard LSH recall trade every banded scheme makes. */
  def simhashBands(sig: DataFrame, idCol: String, bits: Int = 60,
                   bands: Int = 4, carrySig: Boolean = false): DataFrame = {
    val w = bits / bands
    require(bands * w == bits, s"$bands bands must divide $bits bits")
    val banded = sig
      .select(col(idCol), col("simhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_bits",
        expr(s"(simhash >> (band * $w)) & ${(1L << w) - 1}"))
    // carrySig keeps the 8-byte signature ON the band rows so the
    // verify step can hamming-test pairs IN-ROW at the band join
    // instead of joining the signature table back onto the (much
    // larger) pair set twice — see [[bandedPairsCarry]]
    if (carrySig) banded.select(idCol, "band", "band_bits", "simhash")
    else banded.select(idCol, "band", "band_bits")
  }

  /** Candidate near-dup pairs from banded simhash signatures: docs whose
    * signatures agree exactly on >= 1 band. Same LSH shape as
    * [[lshCandidates]] — a shuffled equi-join keyed on (band, band_bits),
    * candidate volume proportional to band-bucket collision density, never
    * O(n²). Output (doc_a < doc_b), distinct.
    *
    * `maxBucket`: the SUPER-BUCKET cap, the production knob for skewed
    * corpora — §8.5b's 100× probe measured 94% of all candidate pairs
    * coming from band buckets holding >64 docs (low-entropy/short
    * documents collapsing onto shared band values; pairs grow as the
    * SQUARE of a bucket's size). A capped bucket contributes no pairs
    * from THIS band: byte-identical docs are already caught by exact
    * dedup, and a true near-dup pair usually collides in another,
    * uncapped band — the documented LSH recall trade (the same skip-
    * super-buckets discipline as published dedup pipelines). None (the
    * default) keeps exact banded semantics for the oracle-gated query. */
  def simhashCandidates(bands: DataFrame, idCol: String,
                        maxBucket: Option[Int] = None): DataFrame =
    bandedPairs(bands, Seq("band", "band_bits"), idCol, maxBucket)

  /** Auto-sized super-bucket cap from a corpus-cardinality estimate —
    * the knob [[simhashCandidates]] documents, derived instead of
    * hand-set. Grows with expected band-bucket occupancy
    * (`n̂ / bandBuckets`, ×`perExpected` headroom for benign skew) and
    * floors at 1024: the floor sits far above any ORGANIC near-dup
    * cluster at fixture scale (measured max band bucket at sf0.1 is 269
    * — real template clusters the cap must NOT drop, so the oracle-gated
    * query is row-unchanged at the gate SFs), while a 100× blow-up's
    * pathological low-entropy buckets (thousands of members, pairs ∝
    * size² — the §8.5b cliff) are bounded by the same call with no
    * hand-tuning. The banding itself (4 × 15 bits) is deliberately NOT
    * auto-sized: Manku band count pins WHICH hamming distances are
    * guaranteed found — a semantic contract, not a performance knob. */
  def autoMaxBucket(est: Double, bandBuckets: Long = 1L << 15,
                    perExpected: Double = 32.0, floor: Int = 1024): Int = {
    require(est >= 0 && est.isFinite, s"bad cardinality estimate: $est")
    math.max(floor, math.ceil(est / bandBuckets * perExpected).toInt)
  }

  /** Shared banded-pairing core: equi-join a band table with itself on
    * `keyCols`, optionally skipping super-buckets (see
    * [[simhashCandidates]]). Distinct (doc_a < doc_b) pairs. */
  private[graft] def bandedPairs(bands: DataFrame, keyCols: Seq[String],
                                 idCol: String,
                                 maxBucket: Option[Int],
                                 shareExchange: Boolean = false): DataFrame =
    bandedPairsCarry(bands, keyCols, idCol, maxBucket, Nil, shareExchange)
      .select("doc_a", "doc_b")
      .distinct()

  /** [[bandedPairs]] with PAYLOAD pass-through and NO distinct: each
    * `carry` column rides the band rows through the self-join and
    * lands on the pair as `<c>_a` / `<c>_b`. A pair colliding in m
    * bands appears m times — the caller chooses where to dedupe, which
    * is the point: a CHEAP in-row verify (one xor+popcount for simhash)
    * filters the raw collisions BEFORE any shuffle, so the distinct —
    * and everything after it — runs over the verified matches (tiny)
    * instead of the full candidate volume. With an expensive verify
    * (64-dim cosine) or a fat payload (the vector itself), dedupe FIRST
    * via [[bandedPairs]] and join the payload back — scoring each pair
    * once was measured 1.8× better for the kNN join (§8.6 r11), while
    * filter-before-distinct deleted dedup_simhash's two signature
    * join-backs (58 → 13 s warm at the 100× probe, §8.7 r12). TWO
    * carry variants were MEASURED AND REJECTED for dedup_embed: the
    * 64-float vectors (raw collision rows widen to ~550 B before any
    * filter can run — 222 → 255 s at the same probe) and even the
    * compact band-bucket array with a first-collision-band in-row
    * dedupe (201 → 321 s): `distinct` partial-aggregates map-side, so
    * raw collisions already dedupe locally before the exchange, and a
    * per-collision array lambda costs more than the combine it
    * replaces. The carry pays only when the carried VERIFY payload is
    * a few bytes and its filter is highly selective (simhash). */
  private[graft] def bandedPairsCarry(bands: DataFrame,
                                      keyCols: Seq[String], idCol: String,
                                      maxBucket: Option[Int],
                                      carry: Seq[String],
                                      shareExchange: Boolean = false)
      : DataFrame = {
    val kept = maxBucket match {
      case None => bands
      case Some(cap) =>
        // one map-side-combined count per bucket (rows ∝ buckets), then a
        // semi-join keeps only members of small-enough buckets
        val ok = bands.groupBy(keyCols.map(col): _*).count()
          .filter(col("count") <= cap).drop("count")
        bands.join(ok, keyCols, "leftsemi")
    }
    // shareExchange (r16, guide §2.4): when the banding subtree above
    // this self-join is EXPENSIVE NARROW work (the 36-hyperplane-dot
    // banding of the kNN-join family), the planner's broadcast self-join
    // computes it once per side (Dev prof on v_knn_join: the two
    // dominant single-task jobs were the duplicate banding+build); an
    // explicit repartition on the join keys pins both sides to ONE
    // exchange (the second side plans as ReusedExchange) — also the only
    // shape a corpus-sized self-join can take at scale. When the banded
    // frame already ENDS in an exchange (lshBands' aggregation, the
    // spread simhash signature), that exchange is reused as-is and the
    // broadcast self-join duplicates only an alias projection — there
    // the extra keyed exchange is pure cost (measured: dedup_minhash
    // 0.15 → 0.77 s under a blanket repartition), so the old broadcast
    // shape stays the default.
    val keyed =
      if (shareExchange) kept.repartition(keyCols.map(col): _*) else kept
    def side(suffix: String) = keyed.select(
      (keyCols.map(col) :+ col(idCol).as(s"doc$suffix")) ++
        carry.map(c => col(c).as(s"$c$suffix")): _*)
    side("_a").join(side("_b"), keyCols)
      .filter(col("doc_a") < col("doc_b"))
      .drop(keyCols: _*)
  }

  /** Swap a one-slot cache list: unpersist previous entries UNLESS a new
    * entry is plan-identical to them. Spark's CacheManager keys cached
    * data by the analyzed plan — when a caller re-runs the SAME pipeline
    * (bench iterations, the verify pass), the fresh `persist()` is a
    * no-op against the existing entry, and unpersisting the "old" handle
    * would delete the very cache the new call relies on (measured: every
    * bench iteration after the first ran fully uncached). */
  private def swapCache(old: List[DataFrame], fresh: List[DataFrame])
      : Unit =
    old.foreach { o =>
      if (!fresh.exists(
          _.queryExecution.analyzed.sameResult(o.queryExecution.analyzed)))
        o.unpersist(blocking = false)
    }

  // One-slot cache for the simhash signature table (bounded-cache
  // contract: persist the latest, unpersist the previous via swapCache —
  // an unpersist under a live concurrent consumer only forces a
  // recompute, never a wrong result). The signature feeds three consumers
  // in the banded pipeline (banding + both verify join sides).
  private var lastSimhashCache: Option[DataFrame] = None

  def simhashCached(docs: DataFrame, idCol: String, textCol: String,
                    bits: Int = 60): DataFrame = {
    val sig = simhash(docs, idCol, textCol, bits).persist()
    synchronized {
      swapCache(lastSimhashCache.toList, List(sig))
      lastSimhashCache = Some(sig)
    }
    sig
  }

  // Per-call cache set for the connected-components iteration (same
  // one-slot contract as the other caches: the previous call's tables are
  // unpersisted, an in-flight consumer merely recomputes).
  private var lastCcCache: List[DataFrame] = Nil

  /** Connected components over a candidate-pair graph by synchronous
    * min-label propagation — the step AFTER pair generation in a dedup
    * pipeline (cluster id per doc; keep-one-per-cluster = `id == lbl`).
    * Each round is one equi-join (edges ⋈ labels) plus a map-side-
    * combined min aggregation — the canonical BSP CC step; labels after
    * round r are exact for components of diameter ≤ r. Rounds are FIXED
    * so an oracle can replay the identical computation.
    *
    * Self-loops are added to the edge set so a round keeps a vertex's own
    * label through the SAME join that gathers its neighbors' — each round
    * then references the previous label table exactly ONCE, the lineage
    * stays linear, and no intermediate round needs its own
    * materialization (a `new = join(old) ∪ old` formulation doubles the
    * lineage per round: 2^rounds recomputes of the candidate pipeline,
    * measured 8 s vs ~1 s at sf0.1). Only `edges` — the expensive input —
    * is cached. */
  def connectedComponents(cands: DataFrame, idA: String = "doc_a",
                          idB: String = "doc_b",
                          rounds: Int = 3): DataFrame = {
    // cache the PAIRS before deriving anything: the edge construction
    // references them twice (directed copies) and the self-loop distinct
    // once more — uncached, the whole candidate pipeline (a band
    // self-join) would re-run per reference
    val c = cands.persist()
    val und = c
      .select(col(idA).as("src"), col(idB).as("dst"))
      .unionAll(c.select(col(idB).as("src"), col(idA).as("dst")))
    val edges = und
      .unionAll(und.select(col("src").as("src"), col("src").as("dst"))
        .distinct())
      .persist()
    var labels = edges.filter(col("src") === col("dst"))
      .select(col("src").as("v"), col("src").as("lbl"))
    for (_ <- 1 to rounds) {
      // No broadcast hint: the label table is the candidate-graph VERTEX
      // set, which for a duplicate-heavy 100 TB corpus is billions of
      // rows — a forced broadcast would OOM the driver at exactly the
      // scale CC matters. Left to AQE, a small label side still becomes
      // a runtime broadcast join (fixture-scale plans are unchanged in
      // effect) while an outsized one degrades safely to a shuffled
      // equi-join with the identical result.
      labels = edges
        .join(labels.select(col("v").as("dst"), col("lbl")), "dst")
        .groupBy("src").agg(min("lbl").as("lbl"))
        .select(col("src").as("v"), col("lbl"))
    }
    val out = labels.persist()
    synchronized {
      swapCache(lastCcCache, List(c, edges, out))
      lastCcCache = List(c, edges, out)
    }
    out
  }

  /** Exact Jaccard over distinct shingle sets for a GIVEN candidate-pair
    * table — the verify stage of the canonical two-stage near-dup
    * pipeline (LSH proposes, Jaccard verifies). Cost scales with the
    * candidate count, never n². */
  // Exactly ONE shingle cache stays alive: each call unpersists the
  // previous call's table (MEMORY_AND_DISK blocks are NOT reclaimed by
  // LRU alone — CacheManager holds them until an explicit unpersist, so
  // skipping this would accumulate dead caches for the session's
  // lifetime). If a concurrent caller's consumers are still running, the
  // unpersist merely forces a recompute — never a wrong result.
  private var lastShingleCache: Option[DataFrame] = None

  def jaccardVerify(candidates: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, shingleN: Int = 3): DataFrame = {
    // The shingle table feeds three consumers (sizes, both join sides);
    // persist it so the explode chain runs once.
    val sh = Par.spread(docs).select(col(idCol).as("id"),
      explode(array_distinct(shingles(tokens(col(textCol)), shingleN)))
        .as("sh"))
      .persist()
    synchronized {
      swapCache(lastShingleCache.toList, List(sh))
      lastShingleCache = Some(sh)
    }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = candidates
      .join(sh.select(col("id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("n_sh").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("n_sh").as("n_b")),
        Seq("doc_b"))
      .withColumn("jacc_micro",
        expr("inter * 1000000 DIV (n_a + n_b - inter)"))
      .select("doc_a", "doc_b", "inter", "jacc_micro")
  }

  /** In-row Jaccard verify for a GIVEN candidate-pair table: joins each
    * pair with its two token arrays (two broadcast/hash joins on doc id)
    * and computes |A|, |B|, |A∩B| in one compiled pass per pair
    * (JaccardStatsExpr) — no shingle table, no shingle-keyed join, no
    * aggregation. O(|a|+|b|) per candidate: the right regime when LSH
    * candidates are sparse relative to the corpus (the usual LLM-dedup
    * case). Bit-identical to [[jaccardVerify]] (spec-asserted), which
    * remains for the opposite regime (candidate pairs ≫ docs, where the
    * inverted index amortizes shingle construction). */
  def jaccardVerifyInRow(candidates: DataFrame, docs: DataFrame,
                         idCol: String, textCol: String,
                         shingleN: Int = 3): DataFrame = {
    val tk = docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
    candidates
      .join(tk.select(col(idCol).as("doc_a"), col("__tk").as("__ta")),
        "doc_a")
      .join(tk.select(col(idCol).as("doc_b"), col("__tk").as("__tb")),
        "doc_b")
      .withColumn("__st", org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.JaccardStatsExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(col("__ta")),
          org.apache.spark.sql.GraftSqlBridge.expression(col("__tb")),
          shingleN)))
      .select(col("doc_a"), col("doc_b"),
        col("__st.inter").as("inter"),
        expr("__st.inter * 1000000 DIV (__st.n_a + __st.n_b - __st.inter)")
          .as("jacc_micro"))
  }

  /** Exact Jaccard similarity over distinct n-gram shingle sets, computed
    * with an inverted-index join: only pairs sharing ≥1 shingle are ever
    * materialized. jacc_micro = |∩| * 1e6 div |∪| (integer). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3): DataFrame = {
    val sh = Par.spread(docs).select(col(idCol).as("id"),
      explode(array_distinct(shingles(tokens(col(textCol)), shingleN)))
        .as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("id").as("doc_a"), col("sh"))
      .join(sh.select(col("id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
      .withColumn("jacc_micro",
        expr("inter * 1000000 DIV (n_a + n_b - inter)"))
      .select("doc_a", "doc_b", "inter", "jacc_micro")
  }
}
