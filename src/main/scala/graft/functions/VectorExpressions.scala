package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector-math hot path (SURVEY.md §4:
  * "custom codegen'd Expression over ArrayType(FloatType) is the 100-TB
  * path"). The higher-order-function formulation (`zip_with` +
  * `aggregate`) is correct but interpreted per element — lambda variables,
  * a materialized product array, and a double function-call per element.
  * These expressions generate a single fused Java loop over the two
  * ArrayData buffers with primitive accumulators: no intermediate array,
  * no boxing, whole-stage-codegen friendly, and they read FLOAT arrays
  * in place (no `cast(array<double>)` copy — each element is widened
  * exactly, so results are bit-identical to the cast-then-HOF pipeline,
  * keeping the DuckDB oracle parity argument intact: same IEEE ops in the
  * same order).
  *
  * Accumulation order matches the HOF form (index order, independent
  * accumulators), so `CosineSim(a,b) ==
  * dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))` bit-for-bit. NULL semantics
  * also match the HOF form: a length mismatch (zip_with pads with nulls)
  * or a null element nulls the whole result.
  */
abstract class VectorBinaryReduce extends BinaryExpression
    with org.apache.spark.sql.GraftArrayInputCasts {

  override def dataType: DataType = DoubleType

  /** Can be NULL even for non-null children (length-mismatch / null
    * element guard) — the optimizer must not fold IsNotNull over this. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Java source for element i of `arr` as a double. */
  protected def getJava(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def getScala(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def mayHaveNullElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  /** HOF-parity NULL semantics (zip_with pads a length mismatch with
    * nulls; any null element nulls the whole reduction). The element null
    * check is FUSED into the main loop (no second pass) and elided
    * entirely when the schema says elements cannot be null. */
  protected def elemNullScala(x: ArrayData, y: ArrayData, i: Int): Boolean =
    (mayHaveNullElems(left) && x.isNullAt(i)) ||
      (mayHaveNullElems(right) && y.isNullAt(i))

  /** In-loop Java null check; empty string when schema-impossible. */
  protected def elemNullJava(ev: ExprCode, a: String, b: String,
                             i: String): String = {
    val checks = Seq(
      if (mayHaveNullElems(left)) Some(s"$a.isNullAt($i)") else None,
      if (mayHaveNullElems(right)) Some(s"$b.isNullAt($i)") else None).flatten
    if (checks.isEmpty) ""
    else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
  }
}

/** Σ aᵢ·bᵢ in index order — fused replacement for
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, +)`. */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorBinaryReduce {
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = x.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      if (elemNullScala(x, y, i)) return null
      acc += getScala(x, i, lf) * getScala(y, i, rf); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            ${elemNullJava(ev, a, b, i)}
            $acc += ${getJava(a, i, lf)} * ${getJava(b, i, rf)};
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a,b) = dot/(√xx·√yy), three independent index-order accumulators
  * in one pass — bit-identical to the composed HOF form. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends VectorBinaryReduce {
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = x.numElements()
    var dot = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < n) {
      if (elemNullScala(x, y, i)) return null
      val xv = getScala(x, i, lf); val yv = getScala(y, i, rf)
      dot += xv * yv; xx += xv * xv; yy += yv * yv; i += 1
    }
    dot / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0; double $xx = 0.0; double $yy = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            ${elemNullJava(ev, a, b, i)}
            double $xv = ${getJava(a, i, lf)};
            double $yv = ${getJava(b, i, rf)};
            $dot += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** √Σ(aᵢ−bᵢ)² — fused euclidean distance. */
case class L2DistExpr(left: Expression, right: Expression)
    extends VectorBinaryReduce {
  override def prettyName: String = "graft_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = x.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      if (elemNullScala(x, y, i)) return null
      val d = getScala(x, i, lf) - getScala(y, i, rf)
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            ${elemNullJava(ev, a, b, i)}
            double $d = ${getJava(a, i, lf)} - ${getJava(b, i, rf)};
            $acc += $d * $d;
          }
          if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($acc); }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ|aᵢ−bᵢ| — fused Manhattan (L1) distance. Qdrant's fourth public
  * collection metric (`Distance.MANHATTAN` alongside Cosine/Euclid/Dot;
  * the reference pins cosine at `bob_vector_db/qdrant_embedder.py:98,101`,
  * so this completes the metric surface rather than the reference's own
  * default). Index-order accumulation; `Math.abs` is exact (no rounding),
  * so the HOF twin and the DuckDB replay are bit-identical. */
case class L1DistExpr(left: Expression, right: Expression)
    extends VectorBinaryReduce {
  override def prettyName: String = "graft_l1"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = x.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      if (elemNullScala(x, y, i)) return null
      acc += math.abs(getScala(x, i, lf) - getScala(y, i, rf)); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            ${elemNullJava(ev, a, b, i)}
            $acc += java.lang.Math.abs(${getJava(a, i, lf)} - ${getJava(b, i, rf)});
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Runtime helper for [[TokensMinHashExpr]] — kept as plain JVM code (not
  * generated source) so both the interpreted and codegen paths call the
  * same JIT-compiled loop. */
object MinHashUtil {
  private val MOD = 2147483647L
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 32-bit base hash of a shingle's UTF-8 bytes: first 4 md5 digest bytes
    * as an unsigned int — identical to `('0x'||substr(md5(sh),1,8))::BIGINT`
    * in the DuckDB oracle and to Dedup.h32. */
  private def h32(bytes: Array[Byte]): Long = {
    val d = md5.get(); d.reset()
    val dig = d.digest(bytes)
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  /** MinHash signature straight from the token array: word `shingleN`-grams
    * joined with ' ' (whole token list when shorter), md5 → 32-bit base
    * hash, affine per-seed family, running min — no shingle array, no
    * distinct (duplicates cannot change a min). */
  def sig(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
          shingleN: Int, numHashes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = tokens.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    val space = ' '.toByte
    // SKIPS null elements while keeping window positions — the exact
    // semantics of ShingleUtil.joinWindow (array_join's null handling),
    // so SQL-registered calls on arrays with null elements get defined
    // behavior instead of an executor NPE, and the two fused kernels
    // agree.
    def shingleBytes(from: Int, count: Int): Array[Byte] = {
      var len = 0; var nonNull = 0
      var k = 0
      while (k < count) {
        if (!tokens.isNullAt(from + k)) {
          len += tokens.getUTF8String(from + k).numBytes(); nonNull += 1
        }
        k += 1
      }
      if (nonNull > 1) len += nonNull - 1
      val buf = new Array[Byte](len)
      var pos = 0; k = 0; var first = true
      while (k < count) {
        if (!tokens.isNullAt(from + k)) {
          if (!first) { buf(pos) = space; pos += 1 }
          val t = tokens.getUTF8String(from + k)
          t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += t.numBytes(); first = false
        }
        k += 1
      }
      buf
    }
    def fold(h: Long): Unit = {
      var s = 0
      while (s < numHashes) {
        val v = ((2L * s + 3L) * h + 104729L * s + 12345L) % MOD
        if (v < out(s)) out(s) = v
        s += 1
      }
    }
    if (n >= shingleN) {
      var i = 0
      while (i <= n - shingleN) { fold(h32(shingleBytes(i, shingleN))); i += 1 }
    } else {
      fold(h32(shingleBytes(0, n)))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Fused tokens → MinHash signature (see [[MinHashUtil.sig]]): replaces a
  * four-layer interpreted HOF chain (shingle transform, array_join,
  * array_distinct, per-seed min) that dominated the dedup benchmark. */
case class TokensMinHashExpr(child: Expression, shingleN: Int, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(shingleN > 0 && numHashes > 0,
    s"tokens_minhash needs shingleN > 0 and numHashes > 0, got ($shingleN, $numHashes)")


  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"tokens_minhash needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_tokens_minhash"

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.sig(input.asInstanceOf[ArrayData], shingleN, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashUtil.sig($a, $shingleN, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[TokensNgramScoreExpr]] — same plain-JVM contract
  * as [[MinHashUtil]] (one JIT-compiled loop shared by the interpreted and
  * codegen paths; md5 → 32-bit base hash identical to Dedup.h32 and the
  * DuckDB oracle's `('0x'||substr(md5(g),1,8))::BIGINT`). */
object NgramScoreUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Σ weights[h32(tok_i ⧺ ' ' ⧺ … ⧺ tok_{i+g-1}) mod weights.length]
    * over the token array's consecutive word g-grams (g = 1 → single
    * tokens) — hashed-feature linear scoring in one pass: no gram array,
    * no per-element lambda dispatch. Null elements are skipped inside a
    * window, keeping window positions (the [[MinHashUtil.sig]] join
    * semantics). Fewer than g tokens → 0 (no gram, empty-sum identity). */
  def score(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
            weights: Array[Long], g: Int): Long = {
    val n = tokens.numElements()
    if (n < g) return 0L
    val d = md5.get()
    val space = ' '.toByte
    var sum = 0L
    var i = 0
    while (i <= n - g) {
      var len = 0; var nonNull = 0
      var k = 0
      while (k < g) {
        if (!tokens.isNullAt(i + k)) {
          len += tokens.getUTF8String(i + k).numBytes(); nonNull += 1
        }
        k += 1
      }
      if (nonNull > 1) len += nonNull - 1
      val buf = new Array[Byte](len)
      var pos = 0; k = 0; var first = true
      while (k < g) {
        if (!tokens.isNullAt(i + k)) {
          if (!first) { buf(pos) = space; pos += 1 }
          val t = tokens.getUTF8String(i + k)
          t.writeToMemory(buf,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += t.numBytes(); first = false
        }
        k += 1
      }
      d.reset()
      val dig = d.digest(buf)
      val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      sum += weights((h % weights.length).toInt)
      i += 1
    }
    sum
  }
}

/** Fused tokens → hashed word-g-gram linear score (see
  * [[NgramScoreUtil.score]]): replaces a transform+aggregate HOF chain
  * whose per-gram lambdas evaluated interpreted (same-session A/B ~30×,
  * `Dev classifyprobe`). The weight table rides into generated code as a
  * bound reference — exactly how a trained model's weights would ship;
  * g = 2 is the txt_classify bigram classifier, g = 1 the pipe_dsir
  * unigram importance ratios. */
case class TokensNgramScoreExpr(child: Expression, weights: Seq[Long],
                                g: Int = 2)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(weights.nonEmpty, "ngram_score needs a non-empty weight table")
  require(g > 0, s"ngram_score needs g > 0, got $g")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_score needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_ngram_score"

  @transient private lazy val wArr: Array[Long] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    NgramScoreUtil.score(input.asInstanceOf[ArrayData], wArr, g)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("ngramWeights", wArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramScoreUtil.score($a, $wRef, $g);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[LmBigramHotExpr]] — same plain-JVM contract as
  * [[NgramScoreUtil]]. Bigram formation mirrors the relational
  * `explodedBigrams` chain exactly: consecutive token pairs joined by
  * one space; a pair touching a null token is skipped (its SQL concat
  * is a NULL bigram, which the model join drops). */
object LmScoreUtil {
  private val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** One pass over the token array: occurrences whose bigram sits in
    * the bounded HOT table accumulate (count, Σ p_micro) in-row —
    * Σ over occurrences equals the relational Σ k·p over distinct
    * bigrams — and the misses come back as the COLD occurrence list
    * for the join-served tail. Returns struct
    * (n_hot, sp_hot, cold ARRAY<STRING>). */
  def score(tokens: ArrayData,
            hot: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
              java.lang.Long])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = tokens.numElements()
    var nHot = 0L
    var sp = 0L
    val cold = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n - 1) {
      if (!tokens.isNullAt(i) && !tokens.isNullAt(i + 1)) {
        val bg = org.apache.spark.unsafe.types.UTF8String.concat(
          tokens.getUTF8String(i), Space, tokens.getUTF8String(i + 1))
        val p = hot.get(bg)
        if (p != null) { nHot += 1; sp += p.longValue() }
        else cold.add(bg)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nHot, sp,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          cold.toArray)))
  }
}

/** Fused tokens → LM hot-head scoring ([[LmScoreUtil.score]]): the
  * bounded top-mass slice of the bigram model rides into generated
  * code as a bound hash table (the [[TokensNgramScoreExpr]]
  * addReferenceObj discipline), so the overwhelming Zipf share of
  * bigram occurrences scores IN-ROW — no explode, no (doc, bigram)
  * aggregation, no corpus-sized shuffle — and only the cold tail
  * leaves the row for the join-served model table. The struct output
  * carries the per-document hot partials plus the cold occurrence
  * list the caller explodes. */
case class LmBigramHotExpr(child: Expression, hot: Map[String, Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_hot",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sp_hot",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cold",
      ArrayType(org.apache.spark.sql.types.StringType,
        containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lm_hot_score needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_lm_hot_score"

  @transient private lazy val jmap
      : java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
        java.lang.Long] = {
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, java.lang.Long](
      math.max(16, hot.size * 2))
    hot.foreach { case (k, v) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(k),
        java.lang.Long.valueOf(v))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    LmScoreUtil.score(input.asInstanceOf[ArrayData], jmap)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("lmHot", jmap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LmScoreUtil.score($a, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[ArgminCellExpr]] — same plain-JVM contract as
  * [[NgramScoreUtil]] (one JIT-compiled loop shared by the interpreted
  * and codegen paths). The compare is bit-identical to the distributed
  * `Ann.argminAssign` chain: per-centroid sequential squared-diff sum,
  * final `Math.sqrt` (the [[L2DistExpr]] law), then min by
  * (distance, cid) with the lower cid winning exact ties. */
object ArgminUtil {
  /** Argmin centroid id for `v`, or `Long.MinValue` as the caller's
    * null sentinel on a null element / dimension mismatch (the cases
    * where the HOF chain's distances all go null). */
  def cell(v: org.apache.spark.sql.catalyst.util.ArrayData,
           cents: Array[Array[Double]], cids: Array[Long],
           isFloat: Boolean): Long = {
    val dim = cents(0).length
    if (v.numElements() != dim) return Long.MinValue
    // Double.compare is the TOTAL order (NaN greater than everything,
    // equal to itself) — the same order Scala's tuple .min (probeCell)
    // and Spark's struct min_by (the HOF chain) use, so an all-NaN
    // vector ties every centroid and the cid tie-break picks the lowest
    // cid in all three forms instead of leaking a phantom sentinel
    var bestD = Double.NaN
    var bestCid = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return Long.MinValue
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val t = x - cv(i)
        d += t * t
        i += 1
      }
      val sd = Math.sqrt(d)
      val cmp = java.lang.Double.compare(sd, bestD)
      if (cmp < 0 || (cmp == 0 && cids(c) < bestCid)) {
        bestD = sd; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }

  /** Minimum L2 distance to any centroid (the [[ArgminUtil.cell]] loop
    * keeping the distance), or -1.0 as the caller's null sentinel on a
    * null element / dimension mismatch. NaN inputs yield NaN (total-
    * order min: a NaN distance loses to any real one), matching the
    * crossjoin + min chain this replaces. */
  def minDist(v: org.apache.spark.sql.catalyst.util.ArrayData,
              cents: Array[Array[Double]], isFloat: Boolean): Double = {
    val dim = cents(0).length
    if (v.numElements() != dim) return -1.0
    var bestD = Double.NaN
    var first = true
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return -1.0
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val t = x - cv(i)
        d += t * t
        i += 1
      }
      val sd = Math.sqrt(d)
      if (first || java.lang.Double.compare(sd, bestD) < 0) {
        bestD = sd; first = false
      }
      c += 1
    }
    bestD
  }
}

/** Fused nearest-centroid DISTANCE: `min_c l2(v, cent_c)` — the
  * [[ArgminCellExpr]] loop returning the distance instead of the cid
  * (the [[graft.sources.Drift]] assignment-sketch kernel: the crossjoin
  * + min-aggregation it replaces had the same k-way row blow-up the
  * argmin form did; same ~9.5×-per-pass A/B shape). NULL on null array,
  * null element or dimension mismatch — exactly the rows the old
  * chain's isNotNull filter dropped. */
case class MinCellDistExpr(child: Expression, cents: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty, "min_cell_dist needs a non-empty centroid table")
  require(cents.forall(_.length == cents.head.length),
    "min_cell_dist centroids must share one dimension")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"min_cell_dist needs array<double|float>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_min_cell_dist"

  @transient private lazy val cArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val r = ArgminUtil.minDist(input.asInstanceOf[ArrayData], cArr,
      elemIsFloat)
    // -1.0 is the null sentinel (a real distance is ≥ 0; NaN inputs
    // flow through as NaN exactly like the HOF chain they replace)
    if (r == -1.0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("minDistCents", cArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.ArgminUtil.minDist($a, $cRef,
        $elemIsFloat);
      if (${ev.value} == -1.0) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused nearest-centroid assignment: `cluster = argmin_c l2(v, cent_c)`
  * with the (distance, cid) tie-break, the centroid MATRIX bound into
  * generated code via addReferenceObj — entering the plan exactly as the
  * pinned artifact it is (the [[TokensNgramScoreExpr]] weight-LUT
  * discipline). The `Ann.argminAssign` formulation is a broadcast
  * CROSS-JOIN + k-way row blow-up + a hash re-aggregation keyed by the
  * point id — correct, but every assigned point becomes k intermediate
  * rows through an exchange-adjacent aggregate; this expression is the
  * serving-path twin: one in-row loop, zero row multiplication, zero
  * shuffle, whole-stage-codegen friendly (measured 70.9 → 7-class s on
  * the 500k-point/977-cell probe — see SemanticDedupIndex). Bit-equal to
  * the HOF chain by construction (same sequential sum, same sqrt, same
  * tie-break; spec-pinned). Null semantics: null array, null element or
  * dimension mismatch → NULL (the cases where every HOF distance is
  * null and the argmin is undefined). */
case class ArgminCellExpr(child: Expression,
                          cents: Seq[Seq[Double]], cids: Seq[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty, "argmin_cell needs a non-empty centroid table")
  require(cents.forall(_.length == cents.head.length),
    "argmin_cell centroids must share one dimension")
  require(cids.length == cents.length && cids.distinct.length == cids.length,
    "argmin_cell needs one distinct cid per centroid")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"argmin_cell needs array<double|float>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_argmin_cell"

  @transient private lazy val cArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = cids.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val r = ArgminUtil.cell(input.asInstanceOf[ArrayData], cArr, idArr,
      elemIsFloat)
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("argminCents", cArr, "double[][]")
    val idRef = ctx.addReferenceObj("argminCids", idArr, "long[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.ArgminUtil.cell($a, $cRef, $idRef,
        $elemIsFloat);
      if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[TokensSimHashExpr]] — same plain-JVM contract as
  * [[MinHashUtil]]. */
object SimHashUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // token → top-60-bits memo: the hash is a pure function of the token
  // and vocabularies are Zipf-small relative to token streams, so md5
  // runs once per distinct token per thread. Bounded (cleared at the
  // limit) so adversarial vocabularies cannot grow the executor heap.
  private val memoLimit = 1 << 17
  private val memo =
    new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
      override def initialValue() =
        new java.util.HashMap[String, java.lang.Long](1 << 12)
    }

  /** 60-bit simhash straight from the token array in one pass: per token,
    * the first 15 md5 hex digits (= the top 60 bits of the first 8 digest
    * bytes) vote ±1 on each bit; bit j of the signature is set iff its
    * vote sum is positive. Token weight = occurrence count (no distinct);
    * null elements are skipped (array_join semantics, matching the other
    * fused kernels). Bit-identical to the explode + two-aggregation SQL
    * form and to the DuckDB oracle's
    * `('0x'||substr(md5(tok),1,15))::BIGINT` pipeline. */
  def sig(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
          bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = tokens.numElements()
    val d = md5.get()
    val m = memo.get()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        // toString copies out of the (possibly reused) row buffer, so the
        // memo key is stable. The digest reads the SAME String's UTF-8
        // bytes the key is built from — key and hash must be derived from
        // identical data, or two invalid-UTF-8 byte sequences collapsing
        // to one replacement-char String would silently share a hash.
        // (For valid UTF-8 — all parquet-sourced text — the round-trip is
        // byte-identical to the raw buffer.)
        val tok = tokens.getUTF8String(i).toString
        var h = 0L
        val cached = m.get(tok)
        if (cached != null) h = cached.longValue()
        else {
          d.reset()
          val dig = d.digest(tok.getBytes("UTF-8"))
          // first 15 hex digits == (first 8 bytes as unsigned 64) >>> 4
          var b = 0
          while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
          h = h >>> 4
          if (m.size >= memoLimit) m.clear()
          m.put(tok, java.lang.Long.valueOf(h))
        }
        var j = 0
        while (j < bits) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }
}

/** Fused tokens → 60-bit SimHash signature (see [[SimHashUtil.sig]]):
  * replaces the explode(tokens)×explode(60 bits) + two shuffled
  * aggregations form — the signature never leaves the row, so the only
  * shuffle left in the near-dup pipeline is the band equi-join. */
case class TokensSimHashExpr(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bits > 0 && bits <= 63,
    s"tokens_simhash needs bits in [1, 63], got $bits")


  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"tokens_simhash needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_tokens_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.sig(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashUtil.sig($a, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[WinnowExpr]] — same plain-JVM contract as the
  * other fused kernels. */
object WinnowUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Winnowing fingerprint set: character `g`-gram hashes (first 15 md5
    * hex digits = top 60 bits of the first 8 digest bytes), min per
    * sliding window of `w`, distinct selections in first-occurrence
    * order — value-identical to the HOF chain
    * `array_distinct(transform(windows, array_min ∘ slice))` over
    * `transform(sequence, md5-gram)` (spec-asserted), but ONE compiled
    * pass per document. The HOF form is O(len²)·references at plan
    * level: CollapseProject inlines the gram-array expression into every
    * window slice AND into every downstream reference, so each window
    * re-hashes every gram (measured: 27 min for 1.5M total chars at
    * sf0.1; this kernel does it in under a second). ASCII fast path
    * digests byte ranges in place; non-ASCII falls back to code-point
    * substrings, matching Spark/DuckDB `substr` character semantics. */
  def fps(text: org.apache.spark.unsafe.types.UTF8String,
          g: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = md5.get()
    val n = text.numChars()
    def h(dig: Array[Byte]): Long = {
      var x = 0L; var b = 0
      while (b < 8) { x = (x << 8) | (dig(b) & 0xffL); b += 1 }
      x >>> 4
    }
    val grams: Array[Long] =
      if (n < g) {
        d.reset(); Array(h(d.digest(text.getBytes)))
      } else if (text.numBytes() == n) {
        // ASCII: char i == byte i — digest ranges of one shared buffer
        val bytes = text.getBytes
        val out = new Array[Long](n - g + 1)
        var i = 0
        while (i <= n - g) {
          d.reset(); d.update(bytes, i, g); out(i) = h(d.digest()); i += 1
        }
        out
      } else {
        // code-point substrings (UTF8String.substring is code-point based,
        // the exact semantics of Spark substr / DuckDB substr)
        val out = new Array[Long](n - g + 1)
        var i = 0
        while (i <= n - g) {
          d.reset()
          out(i) = h(d.digest(text.substring(i, i + g).getBytes)); i += 1
        }
        out
      }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (grams.length >= w) {
      var j = 0
      while (j <= grams.length - w) {
        var m = grams(j); var k = 1
        while (k < w) { if (grams(j + k) < m) m = grams(j + k); k += 1 }
        seen.add(m); j += 1
      }
    } else {
      var m = grams(0); var k = 1
      while (k < grams.length) { if (grams(k) < m) m = grams(k); k += 1 }
      seen.add(m)
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Global minimum of the same gram-hash stream [[fps]] consumes —
    * `array_min` over the whole gram array without materializing it. */
  def minGram(text: org.apache.spark.unsafe.types.UTF8String,
              g: Int): Long = {
    val d = md5.get()
    val n = text.numChars()
    def h(dig: Array[Byte]): Long = {
      var x = 0L; var b = 0
      while (b < 8) { x = (x << 8) | (dig(b) & 0xffL); b += 1 }
      x >>> 4
    }
    if (n < g) { d.reset(); return h(d.digest(text.getBytes)) }
    var m = Long.MaxValue
    if (text.numBytes() == n) {
      val bytes = text.getBytes
      var i = 0
      while (i <= n - g) {
        d.reset(); d.update(bytes, i, g)
        val v = h(d.digest()); if (v < m) m = v
        i += 1
      }
    } else {
      var i = 0
      while (i <= n - g) {
        d.reset()
        val v = h(d.digest(text.substring(i, i + g).getBytes))
        if (v < m) m = v
        i += 1
      }
    }
    m
  }
}

/** Fused global-min gram fingerprint: the minimum of [[WinnowUtil]]'s
  * character-gram hash stream (= `array_min` over the gram array) in one
  * compiled pass — the interpreted HOF form pays a per-gram lambda +
  * substring + hex-conv (measured ~6 s at sf0.1 on one split; this is
  * <0.5 s). Value-identical to
  * `array_min(transform(sequence, md5-gram-hash))` (spec-asserted). */
case class MinGramExpr(child: Expression, g: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(g > 0, s"min_gram needs g > 0, got $g")


  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"min_gram needs string, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_min_gram"

  override protected def nullSafeEval(input: Any): Any =
    WinnowUtil.minGram(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], g)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowUtil.minGram($a, $g);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused sum of unsigned byte values of a binary column — replaces the
  * hex-render + per-byte substring/conv HOF chain (measured ~7 s at
  * sf0.1; this is milliseconds). Identical to summing
  * `('0x' || hex-pair)::BIGINT` per byte: a hex pair IS the byte. */
case class ByteSumExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"byte_sum needs binary, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_byte_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var acc = 0L; var i = 0
    while (i < bytes.length) { acc += bytes(i) & 0xffL; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
        long $acc = 0L;
        for (int $i = 0; $i < $a.length; $i++) { $acc += $a[$i] & 0xffL; }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused average-hash band signature over a binary column: `blocks`
  * contiguous byte-block sums in ONE pass, then per-band bit codes
  * (bit j of band k set iff block (k·perBand+j)'s mean byte exceeds the
  * whole-input mean: `blockSum·len > total·blockLen` in exact integers).
  * Replaces the 64-substring/64-byteSum composed Column tree, whose
  * ~2000-node projection was the measured hotspot of `mm_phash_dedup`
  * (the composed twin is kept as `Multimodal.aHashBandsComposed` with a
  * bit-equality spec). Block boundaries are `len·b/blocks` in exact
  * integer arithmetic — identical to the oracle's `//`. */
case class AHashBandsExpr(child: Expression, blocks: Int, bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(blocks > 0 && bands > 0 && blocks % bands == 0,
    s"ahash_bands needs bands to divide blocks, got ($blocks, $bands)")


  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ahash_bands needs binary, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_ahash_bands"

  override protected def nullSafeEval(input: Any): Any =
    AHashUtil.bands(input.asInstanceOf[Array[Byte]], blocks, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AHashUtil.bands($a, $blocks, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHashUtil {
  /** 128-bit product compare for NON-NEGATIVE operands: a1·b1 > a2·b2.
    * The mean comparison cross-multiplies blocksum·len vs total·blocklen —
    * both scale ~255·len²/blocks, which overflows a signed Long for
    * binary inputs around ≥ 1.2 GiB; this keeps the production kernel
    * exact at any input size (the composed-Column twin and the SQL oracle
    * stay in 64-bit — they only gate fixture-scale inputs). */
  private def mulCmpGt(a1: Long, b1: Long, a2: Long, b2: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a1, b1)
    val hi2 = Math.multiplyHigh(a2, b2)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a1 * b1, a2 * b2) > 0
  }

  /** One pass: block sums → total → band bit codes. */
  def bands(bytes: Array[Byte], blocks: Int, bands: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val len = bytes.length.toLong
    val bs = new Array[Long](blocks)
    var total = 0L
    var b = 0
    while (b < blocks) {
      val s = (len * b / blocks).toInt
      val e = (len * (b + 1) / blocks).toInt
      var i = s; var sum = 0L
      while (i < e) { sum += bytes(i) & 0xffL; i += 1 }
      bs(b) = sum; total += sum; b += 1
    }
    val perBand = blocks / bands
    val out = new Array[Any](bands)
    var k = 0
    while (k < bands) {
      var bits = 0L; var j = 0
      while (j < perBand) {
        val bb = k * perBand + j
        val blen = len * (bb + 1) / blocks - len * bb / blocks
        if (mulCmpGt(bs(bb), len, total, blen)) bits |= 1L << j
        j += 1
      }
      out(k) = bits; k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Fused int8 scalar quantization: struct(mn, mx, codes, code_sum) in
  * one pass. The HOF composition (`sqRange` + `sqQuantize`) references
  * `array_min(d)`/`array_max(d)` INSIDE the per-element transform lambda,
  * which re-scans the array per element — O(d²) per row (measured 1.6 s
  * at sf0.1 for 2000×64). Bit-identical affine map:
  * `code = floor((x−mn)/(mx−mn)·255 + 0.5)`, constant vectors → zeros. */
case class SqCodesExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("mn", DoubleType, nullable = false),
      StructField("mx", DoubleType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("code_sum", LongType, nullable = false)))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sq_codes needs array<float|double>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_sq_codes"

  private def isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    SqUtil.codes(a, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SqUtil.codes($a, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqUtil {
  /** One-pass min/max + affine codes + code sum. Element order and IEEE
    * ops match the HOF twin exactly. */
  def codes(a: ArrayData, isFloat: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    def get(i: Int): Double =
      if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val v = get(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val cs = new Array[Int](n)
    var sum = 0L
    if (mx != mn) {
      i = 0
      while (i < n) {
        val c = math.floor((get(i) - mn) / (mx - mn) * 255 + 0.5).toInt
        cs(i) = c; sum += c; i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      mn, mx,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(cs),
      sum)
  }

  /** Quantized cosine score vs a fixed query vector: quantize →
    * dequantize (`mn + code/255·(mx−mn)`) → cosine, one pass, three
    * index-order accumulators — bit-identical to
    * `cosine(sqDequantize(sqQuantize(v), sqRange(v)), q)`. */
  def score(a: ArrayData, isFloat: Boolean, q: Array[Double]): Double = {
    val n = a.numElements()
    def get(i: Int): Double =
      if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val v = get(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    var dot = 0.0; var xx = 0.0; var yy = 0.0
    i = 0
    while (i < n) {
      val dq =
        if (mx == mn) mn
        else {
          val c = math.floor((get(i) - mn) / (mx - mn) * 255 + 0.5).toInt
          mn + c.toDouble / 255 * (mx - mn)
        }
      val qv = q(i)
      dot += dq * qv; xx += dq * dq; yy += qv * qv
      i += 1
    }
    dot / (math.sqrt(xx) * math.sqrt(yy))
  }

  /** Quantized cosine from MATERIALIZED int8 codes + their (mn, mx)
    * range — the codes-sidecar serving kernel ([[graft.sources.QuantIndex]]):
    * identical dequantize (`mn + c/255·(mx−mn)`) and the same three
    * index-order accumulators as [[score]], so scoring stored codes is
    * bit-identical to scoring the full vector — a sidecar read can never
    * change a row (spec-gated). */
  def scoreFromCodes(codes: ArrayData, mn: Double, mx: Double,
                     q: Array[Double]): Double = {
    val n = codes.numElements()
    var dot = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val dq =
        if (mx == mn) mn
        else mn + codes.getInt(i).toDouble / 255 * (mx - mn)
      val qv = q(i)
      dot += dq * qv; xx += dq * dq; yy += qv * qv
      i += 1
    }
    dot / (math.sqrt(xx) * math.sqrt(yy))
  }

  /** Raw DEQUANTIZED dot product from materialized codes:
    * Σ (mn + cᵢ/255·(mx−mn))·qᵢ, one sequential accumulator — the
    * numerator of [[scoreFromCodes]] alone, un-normalized. The
    * EXACT-bound candidate stage ([[graft.sources.QuantIndex]]
    * `cosineCandidates`) brackets the true dot with
    * `dotFromCodes ± (Δ/2)·‖q‖₁` (per-coordinate quantization error
    * ≤ Δ/2 by the round-to-nearest code map) and divides by the STORED
    * true norm, so cosine bounds come from a codes-only scan. */
  def dotFromCodes(codes: ArrayData, mn: Double, mx: Double,
                   q: Array[Double]): Double = {
    val n = codes.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      val dq =
        if (mx == mn) mn
        else mn + codes.getInt(i).toDouble / 255 * (mx - mn)
      dot += dq * q(i)
      i += 1
    }
    dot
  }
}

/** Quantized-cosine score from materialized codes (see
  * [[SqUtil.scoreFromCodes]]): children are (codes: array<int>,
  * mn: double, mx: double); the query is a bound literal. Stage-2 of
  * codes-sidecar serving — the scan supplying it never reads the
  * embedding column. */
case class SqCodesScoreExpr(codes: Expression, mnE: Expression,
                            mxE: Expression, query: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = mnE
  override def third: Expression = mxE

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, mnE.dataType, mxE.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (c, a, b) => TypeCheckResult.TypeCheckFailure(
        s"sq_codes_score needs (array<int>, double, double), got " +
          s"(${c.catalogString}, ${a.catalogString}, ${b.catalogString})")
    }

  override def prettyName: String = "graft_sq_codes_score"

  @transient private lazy val qArr: Array[Double] = query.toArray

  override protected def nullSafeEval(c: Any, mn: Any, mx: Any): Any = {
    val a = c.asInstanceOf[ArrayData]
    if (a.numElements() != qArr.length) null
    else SqUtil.scoreFromCodes(a, mn.asInstanceOf[Double],
      mx.asInstanceOf[Double], qArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("sqQuery", qArr, "double[]")
    nullSafeCodeGen(ctx, ev, (c, mn, mx) => s"""
      if ($c.numElements() != $qRef.length) { ${ev.isNull} = true; }
      else { ${ev.value} =
        graft.functions.SqUtil.scoreFromCodes($c, $mn, $mx, $qRef); }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(codes = newFirst, mnE = newSecond, mxE = newThird)
}

/** Raw dequantized dot product from materialized codes (see
  * [[SqUtil.dotFromCodes]]): children are (codes: array<int>,
  * mn: double, mx: double); the query is a bound literal. Stage-1 of
  * EXACT-bound serving — the supplying scan never reads the embedding
  * column. */
case class SqCodesDotExpr(codes: Expression, mnE: Expression,
                          mxE: Expression, query: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = mnE
  override def third: Expression = mxE

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, mnE.dataType, mxE.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (c, a, b) => TypeCheckResult.TypeCheckFailure(
        s"sq_codes_dot needs (array<int>, double, double), got " +
          s"(${c.catalogString}, ${a.catalogString}, ${b.catalogString})")
    }

  override def prettyName: String = "graft_sq_codes_dot"

  @transient private lazy val qArr: Array[Double] = query.toArray

  override protected def nullSafeEval(c: Any, mn: Any, mx: Any): Any = {
    val a = c.asInstanceOf[ArrayData]
    if (a.numElements() != qArr.length) null
    else SqUtil.dotFromCodes(a, mn.asInstanceOf[Double],
      mx.asInstanceOf[Double], qArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("sqQuery", qArr, "double[]")
    nullSafeCodeGen(ctx, ev, (c, mn, mx) => s"""
      if ($c.numElements() != $qRef.length) { ${ev.isNull} = true; }
      else { ${ev.value} =
        graft.functions.SqUtil.dotFromCodes($c, $mn, $mx, $qRef); }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(codes = newFirst, mnE = newSecond, mxE = newThird)
}

/** Fused quantized-cosine prefilter score (see [[SqUtil.score]]). */
case class SqScoreExpr(child: Expression, query: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sq_score needs array<float|double>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_sq_score"

  private def isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val qArr: Array[Double] = query.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != qArr.length) null
    else SqUtil.score(a, isFloat, qArr)
  }

  // interpreted-only (CodegenFallback-free would need the query array in
  // generated code); the kernel itself is one JIT-compiled JVM loop, so
  // codegen adds nothing — declared via doGenCode calling a bound ref
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("sqQuery", qArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.numElements() != $qRef.length) { ${ev.isNull} = true; }
      else { ${ev.value} = graft.functions.SqUtil.score($a, $isFloat, $qRef); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused winnowing fingerprints (see [[WinnowUtil.fps]]). */
case class WinnowExpr(child: Expression, g: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(g > 0 && w > 0, s"winnow needs g > 0 and w > 0, got ($g, $w)")


  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow needs string, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    WinnowUtil.fps(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], g, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowUtil.fps($a, $g, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused word n-gram shingle construction: token array → array of
  * shingle strings (joined with ' '; whole token list when shorter than
  * n) in one compiled pass — replaces the interpreted
  * transform(sequence)/slice/array_join chain that dominated the Jaccard
  * verify stage. Output strings are byte-identical to the HOF form, so
  * oracle SQL comparing on shingle text is unaffected. */
case class ShinglesExpr(child: Expression, shingleN: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(shingleN > 0, s"shingles needs n > 0, got $shingleN")


  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingles needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleUtil.shingles($a, $shingleN);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleUtil {
  private val SPACE =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Join the [from, from+len) token window with ' ', SKIPPING null
    * elements — the exact semantics of `array_join(slice(...), " ")`, so
    * the output never violates the declared containsNull=false schema. */
  private[functions] def joinWindow(tokens: ArrayData, from: Int, len: Int)
      : org.apache.spark.unsafe.types.UTF8String = {
    import org.apache.spark.unsafe.types.UTF8String
    val parts = Seq.newBuilder[UTF8String]
    var k = 0; var first = true
    while (k < len) {
      if (!tokens.isNullAt(from + k)) {
        if (!first) parts += SPACE
        parts += tokens.getUTF8String(from + k)
        first = false
      }
      k += 1
    }
    val ps = parts.result()
    if (ps.isEmpty) UTF8String.EMPTY_UTF8 else UTF8String.concat(ps: _*)
  }

  def shingles(tokens: ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val cnt = tokens.numElements()
    if (cnt >= n) {
      val out = new Array[Any](cnt - n + 1)
      var i = 0
      while (i <= cnt - n) { out(i) = joinWindow(tokens, i, n); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](joinWindow(tokens, 0, cnt)))
    }
  }

  /** Distinct-shingle set statistics for a candidate PAIR in one pass:
    * [|distinct(A)|, |distinct(B)|, |distinct(A) ∩ distinct(B)|] — the
    * exact counts the inverted-index join + aggregations compute, without
    * materializing a shingle table. */
  def interStats(a: ArrayData, b: ArrayData, n: Int): Array[Long] = {
    import org.apache.spark.unsafe.types.UTF8String
    val sa = shingles(a, n)
    val setA = new java.util.HashSet[UTF8String](sa.numElements() * 2)
    var i = 0
    while (i < sa.numElements()) { setA.add(sa.getUTF8String(i)); i += 1 }
    val sb = shingles(b, n)
    val seenB = new java.util.HashSet[UTF8String](sb.numElements() * 2)
    var inter = 0L
    i = 0
    while (i < sb.numElements()) {
      val s = sb.getUTF8String(i)
      if (seenB.add(s) && setA.contains(s)) inter += 1
      i += 1
    }
    Array(setA.size.toLong, seenB.size.toLong, inter)
  }

  /** Overlapping token-window chunks: window i covers tokens
    * [i·step, min(i·step + size, n)), for i·step < n — the standard
    * LLM-training chunking (overlap = size − step). An empty token list
    * yields one empty chunk (the same short-input degradation as
    * [[shingles]]). One compiled pass; each token is copied into at most
    * ⌈size/step⌉ chunks. */
  def chunks(tokens: ArrayData, size: Int, step: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = tokens.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8))
    val count = (n + step - 1) / step
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val start = i * step
      out(i) = joinWindow(tokens, start, math.min(size, n - start))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Own-document shingle multiset statistics in one pass:
    * [total shingles, distinct shingles] — the inputs of the within-doc
    * repetition ratio (total − distinct)/total, a standard LLM-corpus
    * quality signal (template/boilerplate text repeats its n-grams). */
  def gramStats(a: ArrayData, n: Int): Array[Long] = {
    import org.apache.spark.unsafe.types.UTF8String
    val s = shingles(a, n)
    val set = new java.util.HashSet[UTF8String](s.numElements() * 2)
    var i = 0
    while (i < s.numElements()) { set.add(s.getUTF8String(i)); i += 1 }
    Array(s.numElements().toLong, set.size.toLong)
  }

  /** One-pass token statistics for a FIXED literal term list:
    * [len, tf_0, …, tf_{k-1}] — total token count plus the occurrence
    * count of each query term. The BM25 building block: computes in a
    * single compiled pass what the explode→filter→groupBy formulation
    * needs two corpus-wide tokenizations and a shuffle for. */
  def termStats(tokens: ArrayData,
                terms: Array[org.apache.spark.unsafe.types.UTF8String])
      : Array[Long] = {
    val out = new Array[Long](terms.length + 1)
    val cnt = tokens.numElements()
    out(0) = cnt.toLong
    var i = 0
    while (i < cnt) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        while (j < terms.length) {
          if (terms(j).equals(t)) out(j + 1) += 1
          j += 1
        }
      }
      i += 1
    }
    out
  }
}

/** Fused overlapping-window chunking (see [[ShingleUtil.chunks]]): the
  * array of token-window chunk strings in one compiled pass. The HOF
  * form (`transform(sequence(...), i -> array_join(slice(toks, ...)))`)
  * re-evaluates the token array per window — the r4 nested-HOF lesson;
  * this touches each token O(size/step) times total. */
case class ChunksExpr(child: Expression, size: Int, step: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(size > 0 && step > 0 && step <= size,
    s"chunking needs 0 < step <= size, got size=$size step=$step")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"chunks needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_chunks"

  override protected def nullSafeEval(a: Any): Any =
    ShingleUtil.chunks(a.asInstanceOf[ArrayData], size, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleUtil.chunks($a, $size, $step);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-document shingle-repetition statistics: struct(total, uniq)
  * of the `shingleN`-gram multiset (see [[ShingleUtil.gramStats]]) — one
  * compiled pass, no shingle array materialized in the plan, no
  * aggregation. The HOF twin (`size(shingles)` +
  * `size(array_distinct(shingles))`) references the shingle array twice,
  * which the plan re-evaluates per reference (the r4 winnow lesson);
  * bit-equality with it is spec-asserted. */
case class GramStatsExpr(child: Expression, shingleN: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(shingleN > 0, s"gram_stats needs n > 0, got $shingleN")


  override def dataType: DataType = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    StructType(Seq(
      StructField("total", LongType, nullable = false),
      StructField("uniq", LongType, nullable = false)))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"gram_stats needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_gram_stats"

  override protected def nullSafeEval(a: Any): Any = {
    val s = ShingleUtil.gramStats(a.asInstanceOf[ArrayData], shingleN)
    org.apache.spark.sql.catalyst.InternalRow(s(0), s(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("gs")
      s"""
        long[] $s = graft.functions.ShingleUtil.gramStats($a, $shingleN);
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[] { $s[0], $s[1] });
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-document query-term statistics: struct(len, tfs) over a
  * token array for a FIXED literal term list — len = |tokens|, tfs(i) =
  * occurrences of terms(i). One compiled pass per document (see
  * [[ShingleUtil.termStats]]): the BM25 scorer reads the corpus ONCE and
  * never explodes it — the explode→isin→groupBy formulation tokenizes the
  * corpus per plan branch (lens/stats/tf each re-derive the token array)
  * and shuffles doc×term rows; this keeps everything in-row so the only
  * shuffle left in BM25 is the 1-row corpus-stats aggregate. */
case class TermStatsExpr(child: Expression, terms: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(terms.nonEmpty, "term_stats needs at least one term")
  require(terms.distinct.size == terms.size,
    "term_stats needs DISTINCT terms — a duplicated term would double-count")

  override def dataType: DataType = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    StructType(Seq(
      StructField("len", LongType, nullable = false),
      StructField("tfs", ArrayType(LongType, containsNull = false),
        nullable = false)))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"term_stats needs array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "graft_term_stats"

  @transient private lazy val termsUtf8
      : Array[org.apache.spark.unsafe.types.UTF8String] =
    terms.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override protected def nullSafeEval(a: Any): Any = {
    val s = ShingleUtil.termStats(a.asInstanceOf[ArrayData], termsUtf8)
    org.apache.spark.sql.catalyst.InternalRow(s(0),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOfRange(s, 1, s.length)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termsUtf8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("ts")
      s"""
        long[] $s = graft.functions.ShingleUtil.termStats($a, $ref);
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[] { $s[0],
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              java.util.Arrays.copyOfRange($s, 1, $s.length)) });
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-PAIR Jaccard statistics over two token arrays: struct(n_a,
  * n_b, inter) of distinct `shingleN`-gram shingle sets (see
  * [[ShingleUtil.interStats]]). The verify stage of the two-stage
  * near-dup pipeline runs this per candidate pair — cost O(|a|+|b|) per
  * pair with NO shingle table, no shingle-keyed joins, no aggregation;
  * the right regime for LLM corpora where candidates are sparse relative
  * to the corpus. The inverted-index form (Dedup.jaccardVerify) remains
  * for the opposite regime and as the bit-equality twin. */
case class JaccardStatsExpr(left: Expression, right: Expression,
                            shingleN: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    StructType(Seq(
      StructField("n_a", LongType, nullable = false),
      StructField("n_b", LongType, nullable = false),
      StructField("inter", LongType, nullable = false)))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(org.apache.spark.sql.types.StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_stats needs (array<string>, array<string>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def prettyName: String = "graft_jaccard_stats"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val s = ShingleUtil.interStats(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], shingleN)
    org.apache.spark.sql.catalyst.InternalRow(s(0), s(1), s(2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("st")
      s"""
        long[] $s = graft.functions.ShingleUtil.interStats($a, $b, $shingleN);
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[] { $s[0], $s[1], $s[2] });
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
