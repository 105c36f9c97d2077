package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter over a 64-bit hash column — the standard
  * prefilter for INCREMENTAL dedup (new batch vs an already-ingested
  * corpus, the shape the reference's ingestion loop implies at scale:
  * `bob_vector_db/qdrant_embedder.py:129-141` upserts batches into an
  * existing collection).
  *
  * Shape at 100 TB: the filter is built with ONE distributed pass over the
  * corpus (k bit positions per key fold map-side into bitmap WORDS via
  * `bit_or` — at most m/64 rows cross the shuffle, bounded by the filter
  * size, never by the corpus), collected to a driver bitmap of m bits (m/8 bytes — 8 KiB
  * here; a production m of 2³⁵ for 10¹⁰ keys is 4 GiB, sharded across
  * several filters), and shipped to executors as a PLAN LITERAL. The
  * membership probe is then a narrow in-row expression — no join, no
  * shuffle, whole-stage codegen — and only probe SURVIVORS reach the
  * exact verification join. Blooms have no false negatives, so
  * prefilter + exact-verify returns exactly the exact join's answer while
  * shuffling only `fpr · batch + true_dups` rows.
  *
  * Determinism: bit positions come from the same public affine family as
  * the MinHash kernel ((2j+3)·h + 104729·j + 12345 mod 2³¹−1, then mod m),
  * so an independent engine replays the filter bit-for-bit — the oracle
  * computes the identical candidate set from the position sets alone.
  */
object Bloom {
  val Mod = 2147483647L // 2^31 - 1, the MinHash family modulus

  /** The j-th bit position of hash `h` (j in [0, k)). `h` must be
    * non-negative AND below 2^59 (the affine multiplier reaches 2k+1, so
    * a full 60-bit hash can overflow the Long product — and the SQL
    * oracle's BIGINT would error rather than wrap; the intended family is
    * the 32-bit md5 prefix, [[Dedup.h32]]). [[shardOf]] reduces mod the
    * prime internally and accepts any non-negative hash. */
  def position(h: Column, j: Int, m: Int): Column =
    ((lit(2L * j + 3) * h + lit(104729L * j + 12345L)) % Mod) % m

  /** All k bit positions of `h`. */
  def positions(h: Column, k: Int, m: Int): Seq[Column] =
    (0 until k).map(j => position(h, j, m))

  /** Distributed fold of a position column to finished bitmap WORDS:
    * positions group by their word index (p DIV 64) and `bit_or` the
    * per-position masks — `bit_or` is an algebraic aggregate, so the
    * OR folds map-side and at most m/64 (word, bits) rows cross the
    * shuffle and reach the driver, 64× less traffic than collecting
    * distinct positions at the documented 2^26–2^35 production sizes
    * (and no distinct pass: OR is idempotent). */
  private def foldToWords(positions: DataFrame,
                          groupCols: Column*): DataFrame =
    positions
      .filter(col("p").isNotNull)
      .groupBy(groupCols :+
        call_function("shiftright", col("p"), lit(6)).cast("int")
          .as("w"): _*)
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L), (col("p") % 64L).cast("int")))
        .as("bits"))

  /** Build the m-bit filter from a corpus: one distributed pass folding
    * the k positions per key into bitmap words ([[foldToWords]] — ≤ m/64
    * rows reach the driver). */
  def build(corpus: DataFrame, h: Column, k: Int, m: Int): Array[Long] = {
    val words = new Array[Long]((m + 63) / 64)
    // a null hash (e.g. md5 of a null column) contributes no positions —
    // the probe side treats null as not-contained, so the two agree
    foldToWords(
      corpus.select(explode(array(positions(h, k, m): _*)).as("p")))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** In-row membership probe against a driver-built bitmap: true iff all
    * k bit positions of `h` are set. The bitmap rides into the generated
    * code as an array literal; each probe is element_at + shiftright —
    * no join, no shuffle. May return false positives (rate ≈ fill^k),
    * never false negatives. */
  def mightContain(bitmap: Array[Long], h: Column, k: Int, m: Int): Column = {
    val words = typedLit(bitmap.toSeq)
    positions(h, k, m).map { p =>
      // word index via integral shiftright(p, 6), not Column `/` (double
      // division + truncating cast — correct for 0 ≤ p < 2^53 but fragile)
      val word = call_function("element_at", words,
        call_function("shiftright", p, lit(6)).cast("int") + lit(1))
      call_function("shiftright", word, (p % 64L).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** SHARDED filter — the scale path past [[sizeFromEstimate]]'s 2^26-bit
    * single-bitmap bound: keys hash-route to `shards` independent filters
    * (shard = h % shards), each an ordinary m-bit bitmap. Build stays ONE
    * distributed word-fold pass (≤ shards·m/64 rows to the driver); the probe
    * stays a narrow in-row expression — the shard index just selects the
    * word table from a two-level plan literal. A 10¹⁰-key corpus at
    * 16 bits/key is 512 shards of 2^25 bits (yes, the plan literal is
    * then 2 GiB — at that point ship the shard tables as a broadcast
    * variable instead; the SHAPE of build and probe is unchanged, which
    * is what this form pins down). */
  /** Shard route: an affine map over the prime modulus INDEPENDENT of the
    * position family — `h % shards` would correlate with the power-of-two
    * position modulus (same-shard keys then collide into m/shards
    * position cosets, measured 4× the design fpr), so the shard index
    * comes from its own universal-hash draw. `h` reduces mod the prime
    * FIRST: 7919·h would wrap negative for h ≥ ~2^50 (this repo's 60-bit
    * md5-prefix hashes), crashing the build and — worse — feeding
    * element_at a negative index in the probe, which reads from the END
    * of the shard table and breaks the no-false-negative guarantee. */
  def shardOf(h: Column, shards: Int): Column =
    ((lit(7919L) * (h % Mod) + lit(104729L)) % Mod) % shards

  def buildSharded(corpus: DataFrame, h: Column, k: Int, m: Int,
                   shards: Int): Array[Array[Long]] = {
    require(shards > 0, s"need at least one shard, got $shards")
    // the sharded analog of sizeFromEstimate's 2^26-bit single-bitmap
    // require: shards·m longs are collected to the driver and embedded as
    // a plan literal, so an oversized call must fail fast here, not OOM
    // the driver (2^30 bits total = 128 MiB of shard tables; past that,
    // ship the tables as a broadcast variable instead of a literal — the
    // build/probe SHAPE is unchanged, see the scaladoc)
    require(shards.toLong * ((m + 63L) / 64) <= (1L << 30) / 64,
      s"$shards shards × $m bits exceeds the 2^30-bit sharded-literal " +
        "bound — ship the shard tables as a broadcast variable instead")
    val bitmaps = Array.fill(shards)(new Array[Long]((m + 63) / 64))
    foldToWords(
      corpus
        .select(shardOf(h, shards).as("s"),
          explode(array(positions(h, k, m): _*)).as("p"))
        .filter(col("s").isNotNull),
      col("s"))
      .collect()
      .foreach(r => bitmaps(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2))
    bitmaps
  }

  /** In-row probe of a sharded filter: true iff all k positions of `h`
    * are set in h's OWN shard. Zero joins/shuffles, like
    * [[mightContain]]. */
  def mightContainSharded(bitmaps: Array[Array[Long]], h: Column, k: Int,
                          m: Int): Column = {
    val tables = typedLit(bitmaps.map(_.toSeq).toSeq)
    val words = call_function("element_at", tables,
      shardOf(h, bitmaps.length).cast("int") + lit(1))
    positions(h, k, m).map { p =>
      val word = call_function("element_at", words,
        call_function("shiftright", p, lit(6)).cast("int") + lit(1))
      call_function("shiftright", word, (p % 64L).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Size the filter from a KMV cardinality estimate: the smallest power
    * of two ≥ 16·n̂ (k = 4 probes at 16 bits/key ⇒ fill ≈ 1−e^(−1/4) ≈
    * 0.22, fpr ≈ 0.22⁴ ≈ 0.24%), floored at 2^10 and REQUIRED ≤ 2^26.
    * The bound is the driver/plan-literal memory contract: m bits live on
    * the driver and ride into the generated code (2^26 = 8 MiB) — beyond
    * that, shard the corpus into several filters (hash-route on
    * `h % shards`) rather than growing one bitmap; the SQL oracle replays
    * this sizing exactly (min power of two ≥ 16·est over a generated
    * power table — no logarithms, which engines round differently). */
  def sizeFromEstimate(est: Long): Int = {
    require(est >= 0, s"negative cardinality estimate: $est")
    // bound BEFORE multiplying: 16·est would wrap negative for huge
    // estimates and silently pass a product-form check
    require(est <= (1L << 26) / 16,
      s"16·$est exceeds the 2^26-bit single-bitmap bound — shard the filter")
    var m = 1L << 10
    while (m < 16 * est) m <<= 1
    m.toInt
  }
}
