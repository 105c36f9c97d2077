package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Qdrant-style payload-filter DSL → Catalyst predicate (SURVEY.md §2.2
  * V3). The reference's collections are queried through Qdrant's JSON
  * filter language; this translates the core of that public DSL
  * (`must` / `should` / `must_not` clauses; `match.value`, `match.any`,
  * `match.text`, `match.phrase` (consecutive-token),
  * `match.except`, `range.{gt,gte,lt,lte}` (numeric, or
  * Qdrant's datetime range via RFC 3339 string bounds),
  * `values_count.{gt,gte,lt,lte}`, `is_empty`, `is_null`,
  * `geo_bounding_box`, `geo_radius` conditions) into
  * a single `Column` predicate, so it composes with any scan and — being
  * an ordinary Catalyst expression tree — pushes down to parquet like a
  * hand-written filter (simple comparisons reach PushedFilters; the
  * tokenized/size forms evaluate post-scan like any expression on a
  * complex type).
  *
  * Semantics pinned to the public Qdrant condition docs:
  *  - `match.text` — every lowercased whitespace token of the query
  *    appears among the field's tokens (the default text-index
  *    tokenization: word, lowercase);
  *  - `match.except` — NOT IN over the given values; a missing/null value
  *    matches (it is "not any of the given");
  *  - `is_empty` — the field is null/missing or an empty array;
  *  - `is_null` — the field has a null value;
  *  - `values_count` — comparisons on the number of values under the key.
  *
  * Keys resolve against top-level columns; nested payload keys
  * ("props.k") resolve via `get_json_object` on a JSON payload column
  * when `jsonCol` is given.
  *
  * Nested ARRAY paths — `key[].sub`, the public Qdrant nested-object
  * filter — match when ANY element under the array key satisfies the
  * condition (match.value / match.any / range). Typed mode resolves
  * `key[].sub` as `col("key.sub")` (Spark's array-of-struct field
  * extraction yields the per-element values); JSON mode collects the
  * matches with JsonPath `$.key[*].sub`, and elements compare by their
  * JSON text rendering (range casts them to double).
  *
  * `has_id` — Qdrant's point-id condition — resolves against `idCol`
  * (the point-id column, never the payload), so
  * `{"must_not": [{"has_id": [..]}]}` excludes specific points the way
  * the public API does.
  */
object PayloadFilter {

  /** Parse a filter JSON document into a boolean Column. */
  def fromJson(json: String, jsonCol: Option[String] = None,
               idCol: String = "id"): Column =
    build(JsonMethods.parse(json), jsonCol, idCol)

  /** The haversine great-circle predicate (meters, R = 6371 km — the
    * figure Qdrant's geo docs use) — shared by the in-plan `geo_radius`
    * DSL arm and [[graft.sources.PayloadIndex.forGeoRadius]]'s residual,
    * so the indexed read's exactness step IS the in-plan predicate (the
    * two can never disagree on a boundary point). */
  private[graft] def geoRadiusPred(lat: Column, lon: Column,
      cLat: Column, cLon: Column, radiusM: Column): Column = {
    val dLat = radians(lat - cLat) / 2
    val dLon = radians(lon - cLon) / 2
    val h = sin(dLat) * sin(dLat) +
      cos(radians(cLat)) * cos(radians(lat)) * sin(dLon) * sin(dLon)
    asin(sqrt(h)) * lit(2 * 6371000.0) <= radiusM
  }

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

  /** Extract the `key` of an `is_empty`/`is_null` condition object. */
  private def keyOf(cond: String, o: JValue): String = o match {
    case JObject(fields) => fields.toMap.get("key") match {
      case Some(JString(k)) => k
      case other => throw new IllegalArgumentException(s"$cond key: $other")
    }
    case other => throw new IllegalArgumentException(s"$cond: $other")
  }

  /** The candidate-value array of a `key[].sub` path (see object doc). */
  private def nestedElems(key: String, jsonCol: Option[String]): Column =
    jsonCol match {
      case Some(jc) =>
        val raw = get_json_object(col(jc), "$." + key.replace("[]", "[*]"))
        // a single JsonPath match comes back as the bare scalar, not a
        // one-element array — normalize so exists() sees both shapes
        when(raw.startsWith("["),
          from_json(raw, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
          .otherwise(array(raw))
      case None => col(key.replace("[]", ""))
    }

  /** A literal comparable against [[nestedElems]] elements: JSON mode
    * compares by JSON text (numbers render without quotes, so the string
    * cast of the typed literal matches), typed mode by value. */
  private def nestedLit(v: JValue, jsonCol: Option[String]): Column =
    if (jsonCol.isDefined) litOf(v).cast("string") else litOf(v)

  /** gt/gte/lt/lte bounds of a range object ANDed over one target.
    *
    * String bounds are Qdrant's DATETIME range (the public API reuses
    * `range` with RFC 3339 bounds for datetime payload values): both the
    * bound and the target cast to timestamp so comparison is in time
    * order, not lexicographic — `to_timestamp` accepts the RFC 3339
    * forms (`2024-01-03T00:00:00Z`) under the UTC session the engine
    * pins. Numeric bounds compare the raw target as before. */
  private def rangePred(target: Column, r: Map[String, JValue]): Column = {
    val datetime = r.values.exists(_.isInstanceOf[JString])
    def bound(v: JValue): Column = v match {
      case JString(s) => to_timestamp(lit(s))
      case other if datetime =>
        throw new IllegalArgumentException(s"mixed datetime range: $other")
      case other => litOf(other)
    }
    val t = if (datetime) target.cast("timestamp") else target
    r.map {
      case ("gt", v)  => t > bound(v)
      case ("gte", v) => t >= bound(v)
      case ("lt", v)  => t < bound(v)
      case ("lte", v) => t <= bound(v)
      case (k, _) => throw new IllegalArgumentException(s"range op: $k")
    }.reduce(_ && _)
  }

  private def build(j: JValue, jsonCol: Option[String],
                    idCol: String): Column = j match {
    case JObject(fields) =>
      val fm = fields.toMap
      val clauses = Seq.newBuilder[Column]
      // empty clause arrays are valid Qdrant filters meaning "no
      // constraint"; must_not negates under Qdrant semantics ("condition
      // did not match"), so a NULL/missing key PASSES — hence
      // !coalesce(cond, false), not SQL three-valued !cond.
      fm.get("must").foreach { case JArray(fs) =>
        clauses += fs.map(build(_, jsonCol, idCol)).reduceOption(_ && _)
          .getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"must: $other") }
      fm.get("should").foreach { case JArray(fs) =>
        clauses += fs.map(build(_, jsonCol, idCol)).reduceOption(_ || _)
          .getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"should: $other") }
      fm.get("must_not").foreach { case JArray(fs) =>
        clauses += fs.map(f => !coalesce(build(f, jsonCol, idCol), lit(false)))
          .reduceOption(_ && _).getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"must_not: $other") }
      fm.get("has_id").foreach { case JArray(vs) =>
        // the point-id condition addresses the id column, not the payload
        clauses += col(idCol).isin(vs.map(rawOf): _*)
      case other => throw new IllegalArgumentException(s"has_id: $other") }
      fm.get("is_empty").foreach { o =>
        val c = keyCol(keyOf("is_empty", o), jsonCol)
        // Qdrant IsEmpty: missing, null, or EMPTY ARRAY — nothing else
        // (an empty string value is present and non-empty to Qdrant).
        // The schema-less translation tests the string form "[]", which
        // is what an empty array casts to (and what get_json_object
        // returns for one); the residual ambiguity — a SCALAR string
        // whose literal value is "[]" — is undecidable without a schema
        // and documented here.
        clauses += (c.isNull || c.cast("string") === "[]")
      }
      fm.get("is_null").foreach { o =>
        clauses += keyCol(keyOf("is_null", o), jsonCol).isNull
      }
      fm.get("key").foreach { case JString(key) =>
        val nested = key.contains("[]")
        val c = if (nested) nestedElems(key, jsonCol) else keyCol(key, jsonCol)
        fm.get("match").foreach {
          case JObject(m) =>
            val mm = m.toMap
            mm.get("value").foreach { v =>
              clauses += (if (nested) exists(c, _ === nestedLit(v, jsonCol))
                          else c === litOf(v))
            }
            mm.get("any").foreach { case JArray(vs) =>
              clauses += (if (nested)
                exists(c, e => e.isin(vs.map(v =>
                  if (jsonCol.isDefined) rawOf(v).toString else rawOf(v)): _*))
              else c.isin(vs.map(rawOf): _*))
            case other => throw new IllegalArgumentException(s"any: $other") }
            mm.get("text").foreach { case JString(q) =>
              val toks = q.toLowerCase.split("\\s+").filter(_.nonEmpty)
              val fieldToks = split(lower(c), "\\s+")
              clauses += toks.map(t => array_contains(fieldToks, t))
                .reduceOption(_ && _).getOrElse(lit(true))
            case other => throw new IllegalArgumentException(s"text: $other") }
            mm.get("phrase").foreach { case JString(q) =>
              // Qdrant PHRASE matching (public since 1.15): the query
              // tokens appear CONSECUTIVELY in the field's token stream
              // (default text-index tokenization: word, lowercase).
              // Re-joining the normalized tokens with single spaces and
              // testing " phrase "-in-" tokens " is exactly
              // consecutive-token containment — one in-row pass, no
              // position explode.
              val ph = q.toLowerCase.split("\\s+").filter(_.nonEmpty)
                .mkString(" ")
              val norm = concat(lit(" "),
                array_join(filter(split(lower(c), "\\s+"),
                  t => t =!= ""), " "), lit(" "))
              clauses += norm.contains(s" $ph ")
            case other =>
              throw new IllegalArgumentException(s"phrase: $other") }
            mm.get("except").foreach { case JArray(vs) =>
              // missing/null values match (they are "not any of the given")
              clauses += coalesce(!c.isin(vs.map(rawOf): _*), lit(true))
            case other =>
              throw new IllegalArgumentException(s"except: $other") }
          case other => throw new IllegalArgumentException(s"match: $other")
        }
        fm.get("range").foreach {
          case JObject(r) =>
            // nested: at least one element satisfies ALL the bounds (the
            // any-element semantics applied to the whole range condition)
            clauses += (if (nested)
              exists(c, e => rangePred(
                if (jsonCol.isDefined) e.cast("double") else e, r.toMap))
            else rangePred(c, r.toMap))
          case other => throw new IllegalArgumentException(s"range: $other")
        }
        fm.get("geo_bounding_box").foreach {
          case JObject(b) =>
            val bm = b.toMap
            def pt(name: String): (Column, Column) = bm(name) match {
              case JObject(p) =>
                val pm = p.toMap
                (litOf(pm("lat")).cast("double"),
                  litOf(pm("lon")).cast("double"))
              case other =>
                throw new IllegalArgumentException(s"$name: $other")
            }
            val (tlLat, tlLon) = pt("top_left")
            val (brLat, brLon) = pt("bottom_right")
            val lat = keyCol(s"$key.lat", jsonCol).cast("double")
            val lon = keyCol(s"$key.lon", jsonCol).cast("double")
            clauses += (lat <= tlLat && lat >= brLat &&
              lon >= tlLon && lon <= brLon)
          case other =>
            throw new IllegalArgumentException(s"geo_bounding_box: $other")
        }
        fm.get("geo_radius").foreach {
          case JObject(r) =>
            val rm = r.toMap
            val (cLat, cLon) = rm("center") match {
              case JObject(p) =>
                val pm = p.toMap
                (litOf(pm("lat")).cast("double"),
                  litOf(pm("lon")).cast("double"))
              case other =>
                throw new IllegalArgumentException(s"center: $other")
            }
            val radiusM = litOf(rm("radius")).cast("double")
            val lat = keyCol(s"$key.lat", jsonCol).cast("double")
            val lon = keyCol(s"$key.lon", jsonCol).cast("double")
            clauses += geoRadiusPred(lat, lon, cLat, cLon, radiusM)
          case other =>
            throw new IllegalArgumentException(s"geo_radius: $other")
        }
        fm.get("values_count").foreach {
          case JObject(r) =>
            // array columns count with size(); in JSON-payload mode the
            // extracted value is JSON text, so count via json_array_length
            val cnt = jsonCol.map(_ => json_array_length(c)).getOrElse(size(c))
            r.toMap.foreach {
              case ("gt", v)  => clauses += (cnt > litOf(v))
              case ("gte", v) => clauses += (cnt >= litOf(v))
              case ("lt", v)  => clauses += (cnt < litOf(v))
              case ("lte", v) => clauses += (cnt <= litOf(v))
              case (k, _) =>
                throw new IllegalArgumentException(s"values_count op: $k")
            }
          case other =>
            throw new IllegalArgumentException(s"values_count: $other")
        }
      case other => throw new IllegalArgumentException(s"key: $other") }
      val cs = clauses.result()
      if (cs.isEmpty) throw new IllegalArgumentException(s"empty filter: $j")
      cs.reduce(_ && _)
    case other => throw new IllegalArgumentException(s"bad filter node: $other")
  }
}
