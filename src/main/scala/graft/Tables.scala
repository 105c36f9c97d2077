package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader. One parquet file per table (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — Spark has no ns timestamp
      // type (PARQUET_TYPE_ILLEGAL without this), so read it as a BIGINT of
      // epoch nanoseconds and derive µs timestamps / buckets explicitly.
      // DuckDB side: epoch_ns(ts) yields the identical BIGINT.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  // The memo must run each build thunk at most once per key, but a build
  // is a whole Spark write job — far too long (and potentially re-entrant
  // into another memoized dir) to run inside computeIfAbsent, which holds
  // the map bin lock for the duration (an unrelated key hashing to the
  // same bin would block, and CHM forbids re-entrant compute functions).
  // So the map holds a FutureTask per key: putIfAbsent decides the single
  // winner atomically, the build runs OUTSIDE any map lock, and losers
  // (or re-entrant builds of a DIFFERENT key) just await the task.
  private val memoCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.FutureTask[String]]()

  /** Memoized per-fixture/per-pid temp materialization (the derived-
    * layout discipline shared by the IVF-index and tenant-layout
    * queries): `build` runs ONCE per (prefix, fixture dir) per JVM into a
    * temp dir keyed by the md5 of the fixture path (hashCode could
    * collide across paths) + the JVM's pid (two concurrent processes on
    * one fixture must not overwrite each other's live layout); the dir is
    * removed on JVM exit so per-pid dirs don't accumulate across runs.
    * Contents must be deterministic — the memo is gate-safe only because
    * rebuilding would produce identical bytes. */
  def memoTempDir(prefix: String, dir: String)(build: String => Unit)
      : String = {
    val task = new java.util.concurrent.FutureTask[String](() => {
      val pathHash = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString
      val target = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_${prefix}_${pathHash}_${ProcessHandle.current().pid()}")
        .toString
      build(target)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(target))
      }))
      target
    })
    val winner =
      Option(memoCache.putIfAbsent((prefix, dir), task)).getOrElse(task)
    if (winner eq task) task.run() // single winner builds, outside the map
    try winner.get()
    catch { // unwrap so callers see the build's own failure, and a failed
      // build doesn't poison the key forever
      case e: java.util.concurrent.ExecutionException =>
        memoCache.remove((prefix, dir), winner)
        throw e.getCause
    }
  }
}
