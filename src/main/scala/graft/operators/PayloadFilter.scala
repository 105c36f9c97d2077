package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Qdrant-style payload-filter DSL → Catalyst predicate (SURVEY.md §2.2
  * V3). The reference's collections are queried through Qdrant's JSON
  * filter language; this translates the core of that public DSL
  * (`must` / `should` / `must_not` clauses; `match.value`, `match.any`,
  * `range.{gt,gte,lt,lte}` conditions) into a single `Column` predicate,
  * so it composes with any scan and — being an ordinary Catalyst
  * expression tree — pushes down to parquet like a hand-written filter.
  *
  * Keys resolve against top-level columns; nested payload keys
  * ("props.k") resolve via `get_json_object` on a JSON payload column
  * when `jsonCol` is given.
  */
object PayloadFilter {

  /** Parse a filter JSON document into a boolean Column. */
  def fromJson(json: String, jsonCol: Option[String] = None): Column =
    build(JsonMethods.parse(json), jsonCol)

  /** With `jsonCol` set, every key resolves inside that JSON payload
    * column (Qdrant keys address the payload); otherwise keys are
    * top-level columns. */
  private def keyCol(key: String, jsonCol: Option[String]): Column =
    jsonCol match {
      case Some(jc) =>
        get_json_object(col(jc), if (key.startsWith("$")) key else s"$$.$key")
      case None => col(key)
    }

  private def litOf(v: JValue): Column = v match {
    case JInt(i) => lit(i.toLong)
    case JLong(l) => lit(l)
    case JDouble(d) => lit(d)
    case JDecimal(d) => lit(d.toDouble)
    case JString(s) => lit(s)
    case JBool(b) => lit(b)
    case other => throw new IllegalArgumentException(s"bad literal: $other")
  }

  private def rawOf(v: JValue): Any = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JString(s) => s
    case JBool(b) => b
    case other => throw new IllegalArgumentException(s"bad literal: $other")
  }

  private def build(j: JValue, jsonCol: Option[String]): Column = j match {
    case JObject(fields) =>
      val fm = fields.toMap
      val clauses = Seq.newBuilder[Column]
      // empty clause arrays are valid Qdrant filters meaning "no
      // constraint"; must_not negates under Qdrant semantics ("condition
      // did not match"), so a NULL/missing key PASSES — hence
      // !coalesce(cond, false), not SQL three-valued !cond.
      fm.get("must").foreach { case JArray(fs) =>
        clauses += fs.map(build(_, jsonCol)).reduceOption(_ && _)
          .getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"must: $other") }
      fm.get("should").foreach { case JArray(fs) =>
        clauses += fs.map(build(_, jsonCol)).reduceOption(_ || _)
          .getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"should: $other") }
      fm.get("must_not").foreach { case JArray(fs) =>
        clauses += fs.map(f => !coalesce(build(f, jsonCol), lit(false)))
          .reduceOption(_ && _).getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"must_not: $other") }
      fm.get("key").foreach { case JString(key) =>
        val c = keyCol(key, jsonCol)
        fm.get("match").foreach {
          case JObject(m) =>
            val mm = m.toMap
            mm.get("value").foreach(v => clauses += (c === litOf(v)))
            mm.get("any").foreach { case JArray(vs) =>
              clauses += c.isin(vs.map(rawOf): _*)
            case other => throw new IllegalArgumentException(s"any: $other") }
          case other => throw new IllegalArgumentException(s"match: $other")
        }
        fm.get("range").foreach {
          case JObject(r) =>
            r.toMap.foreach {
              case ("gt", v)  => clauses += (c > litOf(v))
              case ("gte", v) => clauses += (c >= litOf(v))
              case ("lt", v)  => clauses += (c < litOf(v))
              case ("lte", v) => clauses += (c <= litOf(v))
              case (k, _) => throw new IllegalArgumentException(s"range op: $k")
            }
          case other => throw new IllegalArgumentException(s"range: $other")
        }
      case other => throw new IllegalArgumentException(s"key: $other") }
      val cs = clauses.result()
      if (cs.isEmpty) throw new IllegalArgumentException(s"empty filter: $j")
      cs.reduce(_ && _)
    case other => throw new IllegalArgumentException(s"bad filter node: $other")
  }
}
