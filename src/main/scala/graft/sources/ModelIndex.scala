package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MODEL-ARTIFACT layout for the learned gates — the missing
  * member of the trained-layout family (the r14 verdict's top gap):
  * every VECTOR artifact the engine trains (IVF centroids, PQ
  * codebooks, graph seeds, semantic-dedup cells) is pinned on disk with
  * refresh / drift / retrain contracts, while the MODEL artifacts the
  * curation loop depends on — the trained quality classifier's weight
  * LUT, the DSIR importance-ratio LUT, the LM bigram table — were
  * per-JVM memos: correct for the gates (deterministic fits), but at
  * 100 TB a model fit is a corpus pass you run ONCE, version, and serve
  * everywhere, exactly how the reference treats its own learned
  * artifacts (pinned versioned models loaded at startup,
  * `qdrant_embedder.py:55-56` text model, `:71` the CLIP pair — never
  * refit per process).
  *
  * == Layout ==
  *
  * {{{
  * modelDir/
  *   _model_index.json   {"kind": "model", "form": "lut"|"table",
  *                        "name", "buckets", "key_col", "val_col",
  *                        "teacher", "n_docs", "signal_micro"}
  *   weights/part-….parquet   (key_col, val_col) — the pinned weights
  * }}}
  *
  * Two forms:
  *
  *  - `lut` — a BOUNDED integer weight array (hashing-trick models: one
  *    weight per feature bucket, `buckets` rows total). Serving reads
  *    the whole table once per JVM ([[lut]] — the literal-LUT
  *    discipline: the weights enter generated code via addReferenceObj,
  *    no model join in the scoring plan).
  *  - `table` — a corpus-sized model table (the LM bigram
  *    probabilities) served by JOIN ([[table]], memoized listing via
  *    [[ServedReads]]).
  *
  * == Fit provenance & the drift signal ==
  *
  * The metadata pins WHAT the model was distilled from (`teacher` — a
  * free-text provenance line, e.g. the stopword-density rule), the fit
  * corpus size, and `signal_micro`: the model's own health statistic
  * measured AT FIT TIME on the fit corpus (teacher-disagreement rate
  * for distilled classifiers, out-of-vocabulary mass for the LM — both
  * deterministic integers in micro units). [[maintain]] re-measures the
  * same statistic on the CURRENT corpus and compares:
  * `ratio = (now + 1) / (pinned + 1)` — exactly 1.0 on unchanged data
  * (same corpus, same pinned weights ⇒ same integer), finite when the
  * pinned value is 0 (the LM's fit-time OOV), rising as the corpus
  * drifts away from what the teacher distilled. Past the threshold the
  * refit runs as a STAGED whole-layout rebuild ([[Drift.stagedRebuild]]
  * — the live weights serve until the swap's renames).
  *
  * == Refresh ==
  *
  * Model weights are GLOBAL statistics of the fit corpus — any changed
  * document can move any bucket's weight — so there is no per-bucket
  * incremental path: refresh IS a staged refit ([[refresh]]), and
  * refresh == rebuild holds trivially (both run the same deterministic
  * fit; spec-pinned row-for-row). That asymmetry with the flat layouts
  * is fundamental, not an implementation gap: a posting or a code row
  * depends on its own document alone; a Laplace-smoothed class ratio
  * depends on every document.
  */
object ModelIndex {

  /** Pinned layout + fit metadata. `signalMicro` = the fit-time health
    * statistic [[maintain]]'s ratio is measured against. */
  final case class Meta(form: String, name: String, buckets: Int,
                        keyCol: String, valCol: String, teacher: String,
                        nDocs: Long, signalMicro: Long)

  private def metaPath(dir: String) = Paths.get(dir, "_model_index.json")

  private def writeMeta(dir: String, m: Meta): Unit = {
    require(m.form == "lut" || m.form == "table",
      s"model form must be lut|table, got ${m.form}")
    Seq(m.name, m.keyCol, m.valCol, m.teacher).foreach(s =>
      require(!s.contains("\"") && !s.contains("\\"),
        "metadata strings must not contain quotes or backslashes " +
          "(pinned verbatim in the layout metadata)"))
    Files.createDirectories(Paths.get(dir))
    Files.write(metaPath(dir),
      (s"""{"kind": "model", "form": "${m.form}", """ +
        s""""name": "${m.name}", "buckets": ${m.buckets}, """ +
        s""""key_col": "${m.keyCol}", "val_col": "${m.valCol}", """ +
        s""""teacher": "${m.teacher}", "n_docs": ${m.nDocs}, """ +
        s""""signal_micro": ${m.signalMicro}}""")
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  def metaOf(dir: String): Meta = {
    val txt = new String(Files.readAllBytes(metaPath(dir)),
      StandardCharsets.UTF_8)
    def field(k: String, re: String): String =
      (""""""" + k + """":\s*""" + re).r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(
          s"model layout at $dir predates the $k metadata — rebuild it " +
            "(a derived layout, refit from the corpus)"))
        .group(1)
    def str(k: String): String = field(k, """"([^"]*)"""")
    def num(k: String): Long = field(k, """(-?\d+)""").toLong
    Meta(str("form"), str("name"), num("buckets").toInt, str("key_col"),
      str("val_col"), str("teacher"), num("n_docs"), num("signal_micro"))
  }

  /** Is `dir` a model layout? (The [[VectorRouter]] sniffing shape.) */
  def exists(dir: String): Boolean = Files.isRegularFile(metaPath(dir))

  /** Persist a BOUNDED weight LUT (`weights(b)` = bucket b's integer
    * weight) — one small file; the bounded read is [[lut]]. */
  def buildLut(spark: SparkSession, weights: Seq[Long], dir: String,
               name: String, teacher: String, nDocs: Long,
               signalMicro: Long): Unit = {
    require(weights.nonEmpty, "a weight LUT needs ≥ 1 bucket")
    import spark.implicits._
    weights.zipWithIndex.map { case (w, b) => (b, w) }
      .toDF("bk", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
    writeMeta(dir, Meta("lut", name, weights.length, "bk", "w", teacher,
      nDocs, signalMicro))
    ServedReads.evict(dir)
  }

  /** Persist a corpus-sized model TABLE (key → integer value), served
    * by join ([[table]]). */
  def buildTable(weights: DataFrame, dir: String, name: String,
                 keyCol: String, valCol: String, teacher: String,
                 nDocs: Long, signalMicro: Long): Unit = {
    require(weights.columns.contains(keyCol) &&
        weights.columns.contains(valCol),
      s"model table must carry $keyCol and $valCol: " +
        weights.columns.mkString(", "))
    weights.write.mode("overwrite").parquet(s"$dir/weights")
    writeMeta(dir, Meta("table", name, 0, keyCol, valCol, teacher,
      nDocs, signalMicro))
    ServedReads.evict(dir)
  }

  /** The pinned LUT, read back as the dense weight array the fused
    * scoring kernel binds ([[graft.functions.TokensNgramScoreExpr]]
    * addReferenceObj) — a driver-bounded read of exactly `buckets`
    * rows, validated dense (every bucket exactly once) so a partial
    * write can never serve as a silently-zeroed model. */
  def lut(spark: SparkSession, dir: String): Seq[Long] = {
    val m = metaOf(dir)
    require(m.form == "lut",
      s"model at $dir is a ${m.form} (join-served) — lut() is for " +
        "bounded weight arrays")
    val rows = ServedReads.of(spark, s"$dir/weights")
      .select(col(m.keyCol).cast("int"), col(m.valCol).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    require(rows.length == m.buckets &&
        rows.map(_._1).sorted.sameElements(0 until m.buckets),
      s"model LUT at $dir is not dense over ${m.buckets} buckets " +
        s"(${rows.length} rows) — rebuild it")
    val arr = new Array[Long](m.buckets)
    rows.foreach { case (b, w) => arr(b) = w }
    arr.toSeq
  }

  /** The pinned model table (memoized listing — the serving-read
    * discipline every layout shares). */
  def table(spark: SparkSession, dir: String): DataFrame = {
    val m = metaOf(dir)
    require(m.form == "table",
      s"model at $dir is a ${m.form} (LUT-served) — table() is for " +
        "join-served models")
    ServedReads.of(spark, s"$dir/weights")
  }

  /** Teacher-disagreement rate in micro units over one bounded
    * aggregation pass: the fraction of rows where the pinned model's
    * keep decision contradicts the (cheap, deterministic) teacher rule
    * it was distilled from — the natural drift signal for a distilled
    * gate (rises exactly when the corpus moves away from what the
    * teacher taught). Returns (nRows, disagreeMicro). */
  def disagreementMicro(rows: DataFrame, teacher: Column,
                        modelKeep: Column): (Long, Long) = {
    val r = rows.agg(count(lit(1)).as("n"),
      count(when(teacher =!= modelKeep, 1)).as("d")).head()
    val n = r.getLong(0)
    (n, if (n == 0) 0L else r.getLong(1) * 1000000L / n)
  }

  /** Out-of-vocabulary mass in micro units — the LM/table-model drift
    * signal: the share of current-corpus occurrences whose key the
    * pinned model has never seen (0 at fit time by construction — the
    * fit corpus covers itself — so ANY new vocabulary moves the
    * (now+1)/(pinned+1) ratio off 1.0). `occurrences` = (keyCol,
    * cntCol) rows; one broadcast-ish join + one bounded agg. */
  def oovMicro(spark: SparkSession, dir: String,
               occurrences: DataFrame, keyCol: String,
               cntCol: String): Long = {
    val m = metaOf(dir)
    val r = occurrences
      .join(table(spark, dir).select(col(m.keyCol).as(keyCol),
        lit(1).as("__hit")), Seq(keyCol), "left")
      .agg(coalesce(sum(col(cntCol)), lit(0L)).as("t"),
        coalesce(sum(when(col("__hit").isNull, col(cntCol))), lit(0L))
          .as("o")).head()
    val total = r.getLong(0)
    if (total == 0) 0L else r.getLong(1) * 1000000L / total
  }

  /** The maintain ratio: Laplace-smoothed so unchanged data is EXACTLY
    * 1.0 (same corpus + same pinned weights ⇒ the same deterministic
    * integer) and a pinned 0 (the LM's fit-time OOV) stays finite. */
  def signalRatio(nowMicro: Long, pinnedMicro: Long): Double =
    (nowMicro + 1).toDouble / (pinnedMicro + 1).toDouble

  /** ONE-CALL maintenance ([[Drift.maintain]] — the threshold policy
    * shared with every trained layout): measure the caller's current
    * signal, compare against the pinned fit-time value, refit as a
    * staged whole-layout rebuild past the threshold, no-op otherwise
    * (by-name: a no-op costs one signal pass, bytes untouched). `refit`
    * receives the STAGING dir and must write a complete fresh layout
    * into it (the same fit the original build ran, over the current
    * corpus). */
  def maintain(spark: SparkSession, dir: String,
               threshold: Double = Drift.DefaultThreshold)
              (currentSignalMicro: => Long)(refit: String => Unit)
      : Drift.MaintainResult =
    Drift.maintain(threshold)(
      signalRatio(currentSignalMicro, metaOf(dir).signalMicro)) {
      Drift.stagedRebuild(dir)(refit); ()
    }

  /** Refresh = a staged refit (see the object doc: model weights are
    * global corpus statistics — there is no sound per-bucket
    * incremental path, so refresh and rebuild are the SAME operation,
    * staged so the live weights serve until the swap). */
  def refresh(dir: String)(refit: String => Unit): Unit = {
    Drift.stagedRebuild(dir)(refit)
    ()
  }
}
