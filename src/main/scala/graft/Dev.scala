package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev REPL-substitute: `Dev <what> [args...]`.
  *   schema <sfDir>            — print schema+sample of every fixture table
  *   explain <queryName> <sfDir> — formatted physical plan of a declared query
  *   run <queryName> <sfDir>   — run + show a declared query
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "schema" :: dir :: Nil =>
        Tables.all.foreach { t =>
          println(s"=== $t")
          val df = Tables.load(spark, dir, t)
          df.printSchema(); df.show(3, truncate = 60)
        }
      case "explain" :: name :: dir :: Nil =>
        Queries.queries(name)(spark, dir).explain("formatted")
      case "run" :: name :: dir :: Nil =>
        Queries.queries(name)(spark, dir).show(50, truncate = 60)
      case other => sys.error(s"unknown args: $other")
    }
    spark.stop()
  }
}
