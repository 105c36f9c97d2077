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
    ("graft_tokens_minhash", "graft_tokens_minhash(tokens) - 16-hash MinHash signature of a token array (3-gram shingles)",
      arity("graft_tokens_minhash", 1, es => TokensMinHashExpr(es(0), 3, 16))),
    ("graft_tokens_simhash", "graft_tokens_simhash(tokens) - 60-bit SimHash signature of a token array",
      arity("graft_tokens_simhash", 1, es => TokensSimHashExpr(es(0), 60))))

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
}
