package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide wiring contract: a session whose ONLY graft
  * configuration is `spark.sql.extensions=graft.functions.GraftExtensions`
  * (no `GraftFunctions.register`, no `extraOptimizations`) must get the
  * WHOLE engine surface — the SQL functions AND the range-join optimizer
  * rule. The shared test context carries that config (GraftSpec), so a
  * fresh session built here takes Spark's real classloading path
  * (`applyExtensions` reads the class list from the SparkContext conf and
  * instantiates it reflectively at session construction). Exercising the
  * injected-rule path also gates the rule's idempotence inside the
  * fixed-point operator-optimization batch — a non-idempotent rewrite
  * would exceed the optimizer's max iterations there, which errors. */
class ExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("spark.sql.extensions=GraftExtensions alone wires the functions " +
       "AND the range-join rewrite into a fresh session") {
    val base = spark // force the shared session (and SparkContext) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // a brand-new session on the shared context: never saw register(),
      // never saw extraOptimizations — everything it resolves comes from
      // the injected extensions
      val s2 = SparkSession.builder().getOrCreate()
      assert(s2 ne base, "builder returned the shared session instead " +
        "of constructing a fresh one")

      // 1. injected functions resolve with no register() call
      val c = s2.sql(
        "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))")
        .head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12, s"graft_cosine gave $c")

      // 2. the injected optimizer rule fires: a value-vs-interval theta
      // join plans as the bucketed equi-join, same rows as the model
      import s2.implicits._
      val points = (0 until 500)
        .map(i => (i.toLong, (i % 100).toDouble)).toDF("pid", "v")
      val ivRows = Seq((1L, 10.0, 20.0), (2L, 50.0, 60.0))
      val ivs = ivRows.toDF("qid", "lo", "hi")
      val j = points.join(ivs,
        points("v") >= ivs("lo") && points("v") < ivs("hi"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("__rj_pb"),
        s"injected rule did not fire:\n$opt")
      val phys = j.queryExecution.executedPlan.toString
      assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"),
        s"bucketable rows not planned as an equi-join:\n$phys")
      // with literal (all-bucketable) intervals, constant folding prunes
      // the guarded rest branch entirely: NO nested loop remains anywhere
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"nested loop survived the rewrite:\n$phys")
      val got = j.select("pid", "qid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        i <- 0 until 500
        v = (i % 100).toDouble
        (q, lo, hi) <- ivRows
        if v >= lo && v < hi
      } yield (i.toLong, q)).toSet
      assert(got == want, s"rewrite changed the result: got ${got.size} " +
        s"rows, expected ${want.size}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
