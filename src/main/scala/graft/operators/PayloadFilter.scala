package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Qdrant-style payload-filter DSL → Catalyst predicate (SURVEY.md §2.2
  * V3). The reference's collections are queried through Qdrant's JSON
  * filter language; this translates the core of that public DSL
  * (`must` / `should` / `must_not` clauses; `min_should` (at-least-m of
  * the conditions); `match.value`, `match.any`, `match.text`,
  * `match.phrase` (consecutive-token), `match.except`,
  * `range.{gt,gte,lt,lte}` (numeric, or Qdrant's datetime range via
  * RFC 3339 string bounds), `values_count.{gt,gte,lt,lte}`, `is_empty`,
  * `is_null`, `geo_bounding_box`, `geo_radius`, `geo_polygon`,
  * `has_id`, `has_vector`, `nested` conditions) into
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
  *  - `values_count` — comparisons on the number of values under the key;
  *  - `has_vector` — the point carries the NAMED vector (the partial-
  *    named-vector state `deleteVectorsWhere` / partial upserts produce):
  *    one `isNotNull` on that vector column — never the payload;
  *  - `min_should` — `{"conditions": [...], "min_count": m}`: at least
  *    `m` of the conditions match (counted with must_not's
  *    null-is-false coercion, so a NULL condition counts as unmatched).
  *
  * Keys resolve against top-level columns; nested payload keys
  * ("props.k") resolve via `get_json_object` on a JSON payload column
  * when `jsonCol` is given.
  *
  * Nested ARRAY paths — `key[].sub` — match when ANY element under the
  * array key satisfies the condition (match.value / match.any / range).
  * Typed mode resolves `key[].sub` as `col("key.sub")` (Spark's
  * array-of-struct field extraction yields the per-element values); JSON
  * mode collects the matches with JsonPath `$.key[*].sub`, and elements
  * compare by their JSON text rendering (range casts them to double).
  *
  * The `nested` CONDITION (`{"nested": {"key": k, "filter": f}}`) is the
  * public DSL's SAME-ELEMENT form: one element of the array under `k`
  * satisfies the WHOLE inner filter — `key[].sub` paths cannot express
  * "one element satisfies both conditions" because each path quantifies
  * independently. Translated as `exists(arrayCol, e -> f(e))` with the
  * inner filter's keys resolved against the element `e` (struct fields
  * in typed mode; JSON-object members in JSON mode, where the array
  * elements come back as JSON text via `from_json(.., array<string>)`).
  * Per the public docs, `has_id` / `has_vector` are not valid inside a
  * nested filter (rejected here).
  *
  * `geo_polygon` — point-in-polygon (exterior ring minus `interiors`
  * holes) by ray casting in INTEGER MICRO-DEGREES: coordinates quantize
  * to `floor(deg·1e6 + 0.5)` and every edge-crossing test is a cross-
  * product comparison in long arithmetic (the per-edge Δlat sign is a
  * plan-time constant, so the division-free inequality direction is
  * too) — no trig, no float division, hence exactly replayable by a SQL
  * oracle. Rings may close explicitly (first point == last) or
  * implicitly. Polygons are treated on the cylinder (no antimeridian
  * wrap), matching the plate-carrée reading of the public docs'
  * coordinate model.
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
    build(JsonMethods.parse(json), RootScope(jsonCol), idCol)

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

  /** Degree column → integer micro-degrees, the quantization both the
    * polygon predicate and its SQL oracle apply before any comparison. */
  private[graft] def microCol(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)).cast("long")

  /** Ray-casting point-in-ring parity in integer micro-degrees (see
    * object doc). `ring` = (latMicro, lonMicro) vertices; the ray runs
    * along +lon. Shared by the DSL arm and the spec suite; the oracle
    * replays the identical per-edge tests
    * ([[graft.VectorQueries.polygonOracleSql]]). */
  private[graft] def pointInRing(latM: Column, lonM: Column,
                                 ringIn: Seq[(Long, Long)]): Column = {
    val ring =
      if (ringIn.length > 1 && ringIn.head == ringIn.last) ringIn.init
      else ringIn
    require(ring.length >= 3,
      s"polygon ring needs >= 3 distinct points, got ${ring.length}")
    ring.indices.map { i =>
      val (y1, x1) = ring(i)
      val (y2, x2) = ring((i + 1) % ring.length)
      if (y1 == y2) lit(0) // horizontal edge: never straddles the ray
      else {
        val straddles = (lit(y1) > latM) =!= (lit(y2) > latM)
        // px < x1 + (x2-x1)(py-y1)/(y2-y1), cleared of the division by
        // Δy (its sign is a plan-time constant, so the inequality
        // direction is too); all terms stay in long range (micro-degree
        // deltas ≤ 3.6e8, products ≤ 1.3e17)
        val lhs = (lonM - lit(x1)) * lit(y2 - y1)
        val rhs = lit(x2 - x1) * (latM - lit(y1))
        when(straddles && (if (y2 > y1) lhs < rhs else lhs > rhs), lit(1))
          .otherwise(lit(0))
      }
    }.reduce(_ + _) % 2 === 1
  }

  /** Key-resolution scope. ROOT resolves keys against top-level columns
    * (or inside the JSON payload column); ELEMENT — inside a `nested`
    * condition — resolves keys against ONE array element, which is what
    * makes the nested filter's conditions constrain the SAME element. */
  private sealed trait Scope {
    def json: Boolean
    def field(key: String): Column
    /** The raw JsonPath match under this scope (JSON mode only). */
    def jsonAt(path: String): Column
  }

  /** With `jsonCol` set, every key resolves inside that JSON payload
    * column (Qdrant keys address the payload); otherwise keys are
    * top-level columns. */
  private final case class RootScope(jsonCol: Option[String])
      extends Scope {
    val json: Boolean = jsonCol.isDefined
    def field(key: String): Column = jsonCol match {
      case Some(jc) =>
        get_json_object(col(jc),
          if (key.startsWith("$")) key else s"$$.$key")
      case None => col(key)
    }
    def jsonAt(path: String): Column = get_json_object(col(jsonCol.get), path)
  }

  /** One array element under a `nested` condition: a struct in typed
    * mode (dotted keys chain field extraction), a JSON object's text in
    * JSON mode. */
  private final case class ElemScope(e: Column, json: Boolean)
      extends Scope {
    def field(key: String): Column =
      if (json) jsonAt(s"$$.$key")
      else key.split('.').foldLeft(e)(_ getField _)
    def jsonAt(path: String): Column = get_json_object(e, path)
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

  private def numOf(v: JValue): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"bad number: $other")
  }

  /** Extract the `key` of an `is_empty`/`is_null` condition object. */
  private def keyOf(cond: String, o: JValue): String = o match {
    case JObject(fields) => fields.toMap.get("key") match {
      case Some(JString(k)) => k
      case other => throw new IllegalArgumentException(s"$cond key: $other")
    }
    case other => throw new IllegalArgumentException(s"$cond: $other")
  }

  /** The element array under an array key: JSON mode normalizes the
    * JsonPath match (a single match comes back as the bare scalar, not a
    * one-element array) into `array<string>` of the elements' JSON text;
    * typed mode is the array column itself. */
  private def elemArray(key: String, path: String, scope: Scope): Column =
    if (scope.json) {
      val raw = scope.jsonAt(path)
      when(raw.startsWith("["),
        from_json(raw, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
        .otherwise(array(raw))
    } else scope.field(key)

  /** The candidate-value array of a `key[].sub` path (see object doc). */
  private def nestedElems(key: String, scope: Scope): Column =
    elemArray(key.replace("[]", ""),
      "$." + key.replace("[]", "[*]"), scope)

  /** A literal comparable against [[nestedElems]] elements: JSON mode
    * compares by JSON text (numbers render without quotes, so the string
    * cast of the typed literal matches), typed mode by value. */
  private def nestedLit(v: JValue, scope: Scope): Column =
    if (scope.json) litOf(v).cast("string") else litOf(v)

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

  private def build(j: JValue, scope: Scope, idCol: String): Column =
    j match {
    case JObject(fields) =>
      val fm = fields.toMap
      val clauses = Seq.newBuilder[Column]
      // empty clause arrays are valid Qdrant filters meaning "no
      // constraint"; must_not negates under Qdrant semantics ("condition
      // did not match"), so a NULL/missing key PASSES — hence
      // !coalesce(cond, false), not SQL three-valued !cond.
      fm.get("must").foreach { case JArray(fs) =>
        clauses += fs.map(build(_, scope, idCol)).reduceOption(_ && _)
          .getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"must: $other") }
      fm.get("should").foreach { case JArray(fs) =>
        clauses += fs.map(build(_, scope, idCol)).reduceOption(_ || _)
          .getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"should: $other") }
      fm.get("must_not").foreach { case JArray(fs) =>
        clauses += fs.map(f => !coalesce(build(f, scope, idCol), lit(false)))
          .reduceOption(_ && _).getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"must_not: $other") }
      fm.get("min_should").foreach {
        // at-least-m-of-n: conditions count under the same null-is-false
        // coercion as must_not (an unmatched condition is "did not
        // match", never NULL-poisons the sum)
        case JObject(ms) =>
          val mm = ms.toMap
          val conds = mm.get("conditions") match {
            case Some(JArray(fs)) if fs.nonEmpty =>
              fs.map(build(_, scope, idCol))
            case other =>
              throw new IllegalArgumentException(
                s"min_should conditions: $other")
          }
          val minCount = mm.get("min_count") match {
            case Some(JInt(i)) => i.toInt
            case Some(JLong(l)) => l.toInt
            case other => throw new IllegalArgumentException(
              s"min_should min_count: $other")
          }
          // a non-positive min_count would be vacuously true — reject
          // like every other malformed condition, never silently match
          if (minCount < 1) throw new IllegalArgumentException(
            s"min_should min_count must be >= 1, got $minCount")
          clauses += (conds.map(c =>
              when(coalesce(c, lit(false)), lit(1)).otherwise(lit(0)))
            .reduce(_ + _) >= lit(minCount))
        case other =>
          throw new IllegalArgumentException(s"min_should: $other")
      }
      fm.get("has_id").foreach { case JArray(vs) =>
        // the point-id condition addresses the id column, not the payload
        scope match {
          case _: ElemScope => throw new IllegalArgumentException(
            "has_id is not valid inside a nested filter")
          case _ => ()
        }
        clauses += col(idCol).isin(vs.map(rawOf): _*)
      case other => throw new IllegalArgumentException(s"has_id: $other") }
      fm.get("has_vector").foreach { case JString(name) =>
        // the named-vector presence condition addresses the point's
        // vector column (the partial-vector model: an absent named
        // vector is a NULL column value), never the payload
        scope match {
          case _: ElemScope => throw new IllegalArgumentException(
            "has_vector is not valid inside a nested filter")
          case _ => ()
        }
        clauses += col(name).isNotNull
      case other =>
        throw new IllegalArgumentException(s"has_vector: $other") }
      fm.get("nested").foreach {
        // SAME-ELEMENT quantification: one element under `key` satisfies
        // the WHOLE inner filter (see object doc)
        case JObject(n) =>
          val nm = n.toMap
          val key = nm.get("key") match {
            case Some(JString(k)) => k.stripSuffix("[]")
            case other =>
              throw new IllegalArgumentException(s"nested key: $other")
          }
          val inner = nm.getOrElse("filter",
            throw new IllegalArgumentException("nested: missing filter"))
          val arr = elemArray(key, s"$$.$key", scope)
          clauses += exists(arr, e =>
            coalesce(build(inner, ElemScope(e, scope.json), idCol),
              lit(false)))
        case other => throw new IllegalArgumentException(s"nested: $other")
      }
      fm.get("is_empty").foreach { o =>
        val c = scope.field(keyOf("is_empty", o))
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
        clauses += scope.field(keyOf("is_null", o)).isNull
      }
      fm.get("key").foreach { case JString(key) =>
        val nested = key.contains("[]")
        val c = if (nested) nestedElems(key, scope) else scope.field(key)
        fm.get("match").foreach {
          case JObject(m) =>
            val mm = m.toMap
            mm.get("value").foreach { v =>
              clauses += (if (nested) exists(c, _ === nestedLit(v, scope))
                          else c === litOf(v))
            }
            mm.get("any").foreach { case JArray(vs) =>
              clauses += (if (nested)
                exists(c, e => e.isin(vs.map(v =>
                  if (scope.json) rawOf(v).toString else rawOf(v)): _*))
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
                if (scope.json) e.cast("double") else e, r.toMap))
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
            val lat = scope.field(s"$key.lat").cast("double")
            val lon = scope.field(s"$key.lon").cast("double")
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
            val lat = scope.field(s"$key.lat").cast("double")
            val lon = scope.field(s"$key.lon").cast("double")
            clauses += geoRadiusPred(lat, lon, cLat, cLon, radiusM)
          case other =>
            throw new IllegalArgumentException(s"geo_radius: $other")
        }
        fm.get("geo_polygon").foreach {
          // exterior ring minus interior holes, integer micro-degree ray
          // casting (see object doc; [[pointInRing]])
          case JObject(poly) =>
            val pm = poly.toMap
            def ringOf(v: JValue): Seq[(Long, Long)] = v match {
              case JObject(r) => r.toMap.get("points") match {
                case Some(JArray(pts)) => pts.map {
                  case JObject(p) =>
                    val m2 = p.toMap
                    (math.round(numOf(m2("lat")) * 1e6),
                      math.round(numOf(m2("lon")) * 1e6))
                  case other => throw new IllegalArgumentException(
                    s"polygon point: $other")
                }
                case other => throw new IllegalArgumentException(
                  s"polygon points: $other")
              }
              case other =>
                throw new IllegalArgumentException(s"polygon ring: $other")
            }
            val ext = ringOf(pm.getOrElse("exterior",
              throw new IllegalArgumentException(
                "geo_polygon: missing exterior")))
            val holes = pm.get("interiors") match {
              case Some(JArray(rs)) => rs.map(ringOf)
              case None => Nil
              case other =>
                throw new IllegalArgumentException(s"interiors: $other")
            }
            val latM = microCol(scope.field(s"$key.lat").cast("double"))
            val lonM = microCol(scope.field(s"$key.lon").cast("double"))
            clauses += holes.foldLeft(pointInRing(latM, lonM, ext)) {
              (acc, h) => acc && !pointInRing(latM, lonM, h)
            }
          case other =>
            throw new IllegalArgumentException(s"geo_polygon: $other")
        }
        fm.get("values_count").foreach {
          case JObject(r) =>
            // array columns count with size(); in JSON-payload mode the
            // extracted value is JSON text, so count via json_array_length
            val cnt =
              if (scope.json) json_array_length(c) else size(c)
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
