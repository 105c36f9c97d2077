package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PayloadFilter

/** Qdrant-filter-DSL translation: each DSL document must behave exactly
  * like its hand-written predicate. */
class PayloadFilterSpec extends AnyFunSuite with SparkSpec {

  private def emb = Tables.load(spark, sf, "embeddings")

  private def sameAs(dsl: String, hand: org.apache.spark.sql.Column): Unit = {
    val a = emb.filter(PayloadFilter.fromJson(dsl)).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = emb.filter(hand).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty, "degenerate test: empty result set")
  }

  test("match.value == equality") {
    sameAs("""{"key": "label", "match": {"value": 3}}""", col("label") === 3)
  }

  test("match.any == IN") {
    sameAs("""{"key": "label", "match": {"any": [1, 4]}}""",
      col("label").isin(1, 4))
  }

  test("range composes gte/lt") {
    sameAs("""{"key": "vec_id", "range": {"gte": 100, "lt": 200}}""",
      col("vec_id") >= 100 && col("vec_id") < 200)
  }

  test("must + should + must_not compose") {
    sameAs(
      """{"must": [{"key": "vec_id", "range": {"lt": 300}}],
          "should": [{"key": "label", "match": {"value": 1}},
                     {"key": "label", "match": {"value": 2}}],
          "must_not": [{"key": "vec_id", "match": {"value": 7}}]}""",
      col("vec_id") < 300 &&
        (col("label") === 1 || col("label") === 2) &&
        !(col("vec_id") === 7))
  }

  test("nested payload key via JSON column") {
    val ev = Tables.load(spark, sf, "events")
    val dsl = PayloadFilter.fromJson(
      """{"key": "k", "match": {"value": "77"}}""", jsonCol = Some("props"))
    val a = ev.filter(dsl).count()
    val b = ev.filter(get_json_object(col("props"), "$.k") === "77").count()
    assert(a == b && a > 0)
  }

  test("must_not keeps rows with missing/NULL keys (Qdrant semantics)") {
    val ev = Tables.load(spark, sf, "events")
    // props lacks key "zzz" everywhere: must_not(zzz = x) keeps ALL rows
    val dsl = PayloadFilter.fromJson(
      """{"must_not": [{"key": "zzz", "match": {"value": "x"}}]}""",
      jsonCol = Some("props"))
    assert(ev.filter(dsl).count() == ev.count())
  }

  test("empty clause arrays mean no constraint, not a crash") {
    val n = emb.count()
    assert(emb.filter(PayloadFilter.fromJson("""{"must": []}""")).count() == n)
    assert(emb.filter(PayloadFilter.fromJson(
      """{"must": [], "must_not": []}""")).count() == n)
  }

  test("filter pushes down to the parquet scan") {
    val plan = emb.filter(PayloadFilter.fromJson(
        """{"must": [{"key": "label", "match": {"value": 3}}]}"""))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]"),
      s"no pushdown in plan:\n$plan")
  }
}
