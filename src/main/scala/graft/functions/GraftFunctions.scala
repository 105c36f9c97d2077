package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface of the engine's native expressions: `graft_cosine`,
  * `graft_dot`, `graft_l2`, `graft_tokens_minhash` become callable from
  * `spark.sql(...)` — either per-session ([[register]]) or cluster-wide
  * via `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * This is the engine's equivalent of the reference's pluggable model
  * registry surface: the query layer (SQL or DataFrame) names the
  * function, the implementation is a codegen Catalyst expression. */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Arity gate: a wrong argument count must surface as a clean
    * wrong-number-of-arguments error from the registry, not an
    * IndexOutOfBoundsException from inside a builder. */
  private def arity(name: String, n: Int,
                    build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${es.length}")
      build(es)
    }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float/double arrays",
      arity("graft_cosine", 2, es => CosineSimExpr(es(0), es(1)))),
    ("graft_dot", "graft_dot(a, b) - inner product of two float/double arrays",
      arity("graft_dot", 2, es => DotProductExpr(es(0), es(1)))),
    ("graft_l2", "graft_l2(a, b) - euclidean distance of two float/double arrays",
      arity("graft_l2", 2, es => L2DistExpr(es(0), es(1)))),
    ("graft_l1", "graft_l1(a, b) - manhattan (L1) distance of two float/double arrays",
      arity("graft_l1", 2, es => L1DistExpr(es(0), es(1)))),
    ("graft_tokens_minhash", "graft_tokens_minhash(tokens) - 16-hash MinHash signature of a token array (3-gram shingles)",
      arity("graft_tokens_minhash", 1, es => TokensMinHashExpr(es(0), 3, 16))),
    ("graft_tokens_simhash", "graft_tokens_simhash(tokens) - 60-bit SimHash signature of a token array",
      arity("graft_tokens_simhash", 1, es => TokensSimHashExpr(es(0), 60))),
    ("graft_shingles", "graft_shingles(tokens, n) - word n-gram shingle strings (whole list when shorter)",
      arity("graft_shingles", 2, es => ShinglesExpr(es(0), litInt("graft_shingles", "n", es(1))))),
    ("graft_winnow", "graft_winnow(text, g, w) - winnowing fingerprints (char g-grams, window w)",
      arity("graft_winnow", 3, es => WinnowExpr(es(0),
        litInt("graft_winnow", "g", es(1)), litInt("graft_winnow", "w", es(2))))),
    ("graft_chunks", "graft_chunks(tokens, size, step) - overlapping token-window chunk strings",
      arity("graft_chunks", 3, es => ChunksExpr(es(0),
        litInt("graft_chunks", "size", es(1)), litInt("graft_chunks", "step", es(2))))),
    ("graft_gram_stats", "graft_gram_stats(tokens, n) - struct(total, uniq) n-gram repetition stats",
      arity("graft_gram_stats", 2, es => GramStatsExpr(es(0), litInt("graft_gram_stats", "n", es(1))))),
    ("graft_byte_sum", "graft_byte_sum(bin) - unsigned byte sum of a binary column",
      arity("graft_byte_sum", 1, es => ByteSumExpr(es(0)))),
    ("graft_ahash_bands", "graft_ahash_bands(bin) - 64-block/4-band average-hash signature of a binary column",
      arity("graft_ahash_bands", 1, es => AHashBandsExpr(es(0), 64, 4))),
    ("graft_min_gram", "graft_min_gram(text, g) - min 60-bit hash over char g-grams",
      arity("graft_min_gram", 2, es => MinGramExpr(es(0), litInt("graft_min_gram", "g", es(1))))),
    ("graft_term_stats", "graft_term_stats(tokens, term, ...) - struct(len, tfs): token count + per-literal-term tf in one pass",
      es => {
        if (es.length < 2) throw new IllegalArgumentException(
          s"graft_term_stats expects (tokens, term, ...), got ${es.length}")
        TermStatsExpr(es.head,
          es.tail.map(litStr("graft_term_stats", "term", _)))
      }))

  /** Literal-int argument gate: structural parameters (shingle size,
    * window, chunk step) must be foldable ints — a clean error beats a
    * ClassCastException from inside the expression. */
  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  /** Literal-string argument gate (term lists etc.). */
  private def litStr(fn: String, arg: String, e: Expression): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a string literal, got $other")
  }

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point: the full engine surface — SQL
  * functions AND the optimizer rule — so a production session configured
  * only with `spark.sql.extensions=graft.functions.GraftExtensions` gets
  * both (a functions-only injection would leave value-vs-interval theta
  * joins planning as nested loops). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
    // runs in the fixed-point operator-optimization batch; the rule is
    // idempotent there by construction (see RangeJoinRule scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
