package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints exactly ONE JSON line with per-query and
  * total wall seconds.
  *
  * A full registry pass at sf0.001 runs first, untimed: it pays the
  * one-time JVM/codegen/parquet-footer warmup so the timed numbers
  * measure the queries, not JIT compilation (the first query of round 1
  * absorbed ~8s of warmup). Query order is name-sorted for run-to-run
  * comparability. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // Evaluate the query AS DECLARED: df.count() plans a NEW aggregate
    // over the logical plan, letting Catalyst prune every computed column
    // a narrow query doesn't need for counting — projection-only queries
    // then "benchmark" an empty scan (discovered when a query that
    // count()-timed at 0.4 s took minutes under the correctness gate's
    // full materialization). toRdd executes the declared physical plan,
    // all columns, no driver-side collect.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).queryExecution.toRdd.foreach(_ => ())

    // Untimed warmup at the smallest SF (JIT, codegen cache, IO paths).
    ordered.foreach { case (name, fn) =>
      try run(fn, "/root/testdata/sf0.001")
      catch { case e: Throwable =>
        System.err.println(s"[bench-warmup] $name: ${e.getMessage}")
      }
    }

    // System 1/5/15-min load before and after the timed pass: a contended
    // box inflates every number ±15%+, and without this context each
    // suspicious total costs a judge re-run to adjudicate (r9/r10 both
    // did). [-1] when /proc/loadavg is unreadable (non-Linux).
    def loadavg(): Seq[Double] =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq(-1.0) }
    val loadBefore = loadavg()

    // min of two timed iterations per query: run-to-run spread on a busy
    // box is ±15%, and the minimum is the standard robust estimator of
    // the query's true cost. Failed iterations are EXCLUDED from the min
    // (a fast failure must not masquerade as a fast query); a query with
    // no successful iteration reports -1 so the JSON carries the failure.
    val results = ordered.map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          run(fn, sfDir)
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    // Per-query seconds at 3 decimals: the r4 line (71 queries ×
    // 9-decimal doubles) outgrew the driver's stdout tail window and the
    // line's head — including "value":<total> — fell outside the captured
    // tail, so the driver recorded parsed:null. 3 decimals halve the
    // line; ms resolution is far below the ±15% busy-box spread anyway.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // failures stay visible as -1 in the per-query map but must not
    // deflate the total (summing the sentinel would understate wall time)
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    // Full-detail line FIRST, short total-only line LAST: whichever line
    // the driver's tail-window parse lands on carries the total, so the
    // 2x budget gate is machine-verifiable even if the detail line is
    // clipped. Both lines together are ~1.8 KB.
    val load = (loadBefore ++ loadavg()).map(r3).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load":$load}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":{},"sf":"$sfDir","load":$load,"detail":"previous line"}""")
    spark.stop()
  }
}
