package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declare-once routing for MODEL layouts (r15 verdict worklist #5) —
  * the [[IndexRouter]]/[[VectorRouter]] law applied to the learned text
  * gates: the caller DECLARES layout dirs (pointers, not schemas); the
  * router sniffs each for a model layout ([[ModelIndex.exists]] — the
  * self-describing `_model_index.json`) whose pinned `name` matches the
  * requested model, serves from the FIRST match (the deterministic
  * first-declaration rule, never cost-based), and falls back to the
  * caller's in-plan fit when nothing matches. Routing is a plan
  * decision, never a semantic one: a model layout is the persisted form
  * of the SAME deterministic corpus fit the fallback runs (spec-pinned
  * row-identical in both declaration states), exactly how the reference
  * serves its pinned models — the collection declares them once
  * (`qdrant_embedder.py:55-56,71`) and every query benefits without
  * naming a model.
  *
  * The name match matters: a collection may declare several model
  * layouts (classifier LUT, DSIR LUT, LM table, token-freq table) plus
  * vector/payload layouts in one list — each serving site picks only
  * its own kind, and a non-model declaration is inert here (the
  * [[IndexRouter]] skip rule).
  */
object ModelRouter {

  /** First declared dir holding a model layout with the pinned `name`;
    * non-model dirs and other models are skipped. */
  def modelDirOf(dirs: Seq[String], name: String): Option[String] =
    dirs.find(d => ModelIndex.exists(d) && ModelIndex.metaOf(d).name == name)

  /** Serve a TABLE-form model by declaration, else run the caller's
    * in-plan fit (by-name — nothing is computed when a layout serves). */
  def tableOr(spark: SparkSession, dirs: Seq[String], name: String)
             (fallback: => DataFrame): DataFrame =
    modelDirOf(dirs, name) match {
      case Some(d) => ModelIndex.table(spark, d)
      case None => fallback
    }

  /** Serve a LUT-form model's bounded weight array by declaration, else
    * run the caller's in-plan fit. */
  def lutOr(spark: SparkSession, dirs: Seq[String], name: String)
           (fallback: => Seq[Long]): Seq[Long] =
    modelDirOf(dirs, name) match {
      case Some(d) => ModelIndex.lut(spark, d)
      case None => fallback
    }
}
