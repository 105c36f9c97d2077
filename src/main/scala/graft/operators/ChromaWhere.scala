package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Chroma-style `where` / `where_document` filter DSL → Catalyst
  * predicate — the query language of the OTHER backend the reference
  * writes to (`bob_vector_db/chroma_embedder.py:28-36`: documents land in
  * Chroma collections, whose public query API filters metadata with
  * `where` and full text with `where_document`).
  *
  * Translated surface (the public Chroma operators):
  *  - metadata `where`: `{"field": v}` equality shorthand,
  *    `{"field": {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": v}}`,
  *    `{"field": {"$in"|"$nin": [v, ...]}}`,
  *    `{"$and"|"$or": [w, ...]}` composition;
  *  - document `where_document`: `{"$contains": "s"}`,
  *    `{"$not_contains": "s"}`, `{"$and"|"$or": [...]}`.
  *
  * Missing-value semantics pinned where SQL three-valued logic would
  * silently diverge: `$ne` and `$nin` PASS a null/missing value (the
  * value is not the excluded one — same choice as the Qdrant
  * translator's `match.except`); `$not_contains` likewise passes a null
  * document. Everything is an ordinary Catalyst expression tree, so
  * simple comparisons push down to the parquet scan.
  */
object ChromaWhere {

  /** Parse a `where` metadata filter into a boolean Column. */
  def fromJson(json: String): Column = build(JsonMethods.parse(json))

  /** Parse a `where_document` filter against the given text column. */
  def documentFilter(json: String, textCol: Column): Column =
    buildDoc(JsonMethods.parse(json), textCol)

  private def litOf(v: JValue): Column = lit(rawOf(v))

  private def rawOf(v: JValue): Any = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JString(s) => s
    case JBool(b) => b
    case other => throw new IllegalArgumentException(s"bad literal: $other")
  }

  private def combine(op: String, fs: List[JValue],
                      one: JValue => Column): Column = {
    val cs = fs.map(one)
    if (cs.isEmpty)
      throw new IllegalArgumentException(s"empty $op clause")
    if (op == "$and") cs.reduce(_ && _) else cs.reduce(_ || _)
  }

  private def build(j: JValue): Column = j match {
    case JObject(List((op @ ("$and" | "$or"), JArray(fs)))) =>
      combine(op, fs, build)
    case JObject(List((field, JObject(ops)))) =>
      val c = col(field)
      ops match {
        case List(("$eq", v))  => c === litOf(v)
        case List(("$ne", v))  => coalesce(c =!= litOf(v), lit(true))
        case List(("$gt", v))  => c > litOf(v)
        case List(("$gte", v)) => c >= litOf(v)
        case List(("$lt", v))  => c < litOf(v)
        case List(("$lte", v)) => c <= litOf(v)
        case List(("$in", JArray(vs)))  => c.isin(vs.map(rawOf): _*)
        case List(("$nin", JArray(vs))) =>
          coalesce(!c.isin(vs.map(rawOf): _*), lit(true))
        case other =>
          throw new IllegalArgumentException(s"where op: $other")
      }
    case JObject(List((field, v))) => col(field) === litOf(v) // shorthand
    case other =>
      throw new IllegalArgumentException(s"bad where node: $other")
  }

  private def buildDoc(j: JValue, textCol: Column): Column = j match {
    case JObject(List((op @ ("$and" | "$or"), JArray(fs)))) =>
      combine(op, fs, buildDoc(_, textCol))
    case JObject(List(("$contains", JString(s)))) => textCol.contains(s)
    case JObject(List(("$not_contains", JString(s)))) =>
      coalesce(!textCol.contains(s), lit(true))
    case other =>
      throw new IllegalArgumentException(s"bad where_document node: $other")
  }
}
