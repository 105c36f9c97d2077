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
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
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
      case "dump" :: name :: dir :: out :: Nil =>
        // single-query slice of Verify: result parquet + its oracle SQL,
        // for scripts/compare_oracle.py without a full-registry run
        Queries.queries(name)(spark, dir).coalesce(1)
          .write.mode("overwrite").parquet(s"$out/$name")
        val sql = Queries.all.find(_.name == name).flatMap(_.oracle)
        sql.foreach { s0 =>
          def q(s: String): String = "\"" + s.flatMap {
            case '"'  => "\\\""
            case '\\' => "\\\\"
            case '\n' => "\\n"
            case '\r' => "\\r"
            case '\t' => "\\t"
            case c if c < ' ' => f"\\u${c.toInt}%04x"
            case c => c.toString
          } + "\""
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$out/oracle_sql.json"),
            s"{${q(name)}: ${q(s0)}}")
        }
      case "time" :: name :: dir :: n =>
        val iters = n.headOption.map(_.toInt).getOrElse(3)
        val fn = Queries.queries(name)
        // full-plan evaluation, same as Bench: count() plans a fresh
        // aggregate and Catalyst prunes computed columns — narrow queries
        // would "time" an empty scan (the exact bug the r4 bench fixed)
        def eval(dir: String): Unit =
          fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
        eval("/root/testdata/sf0.001") // warmup
        (1 to iters).foreach { i =>
          val t0 = System.nanoTime()
          eval(dir)
          println(f"[$name] iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case "ccprof" :: dir :: Nil =>
        import org.apache.spark.sql.functions._
        def t[A](what: String)(f: => A): A = {
          val t0 = System.nanoTime()
          val r = f
          println(f"[$what] ${(System.nanoTime() - t0) / 1e9}%.2f s")
          r
        }
        // warmup
        Queries.queries("dedup_cluster")(spark, "/root/testdata/sf0.001").count()
        (1 to 2).foreach { _ =>
          val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
          val planted = d.unionAll(d.filter(col("doc_id") % 100 === 0)
              .select((col("doc_id") + 100000).as("doc_id"), col("text")))
            .repartition(spark.sparkContext.defaultParallelism)
          val cands = graft.operators.Dedup.lshCandidates(
            graft.operators.Dedup.lshBandsFused(planted, "doc_id", "text",
              16, 3, 4), "doc_id")
          t("candidates")(cands.count())
          val cc = t("cc-build")(
            graft.operators.Dedup.connectedComponents(cands, rounds = 3))
          t("cc-count")(cc.count())
          val sizes = cc.groupBy("lbl").agg(count(lit(1)).as("csize"))
          t("sizes-join")(cc.join(sizes, "lbl").count())
        }
      case "graphquality" :: dir :: Nil =>
        // build quality: per-node overlap of graph neighbors vs exact
        // top-M, averaged over a 100-node sample
        import org.apache.spark.sql.functions._
        val emb = Tables.load(spark, dir, "embeddings").persist()
        val adj = spark.read.parquet(GraphAnnQueries.graphIndexDir(spark, dir))
        val sample = emb.filter(col("vec_id") % 20 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val m = adj.groupBy("src").count().agg(max("count")).head().getLong(0).toInt
        val exactNbr = emb.crossJoin(broadcast(sample))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("__s", graft.functions.VectorOps.cosine(
            col("embedding"), col("qv")))
          .groupBy("qid")
          .agg(graft.plans.TopKByScore.topK(col("__s"), col("vec_id"), m)
            .as("__tk"))
          .select(col("qid"), explode(col("__tk.id")).as("nbr"))
        // LEFT join from the sample so zero-overlap nodes count as 0 —
        // an inner join would drop them from avg AND make min unable to
        // report 0, the exact failure this diagnostic exists to catch
        val hits = sample.select("qid").join(
            exactNbr.join(adj.select(col("src").as("qid"),
                col("dst").as("nbr")), Seq("qid", "nbr"))
              .groupBy("qid").count(),
            Seq("qid"), "left")
          .select(col("qid"), coalesce(col("count"), lit(0L)).as("count"))
        val stats = hits.agg(avg("count"), min("count")).head()
        println(f"graph quality: avg exact-neighbor overlap " +
          f"${stats.getDouble(0)}%.2f / $m, min ${stats.getLong(1)}")
      case "graphrecall" :: dir :: Nil =>
        // recall@10 + candidate budget: beam search vs IVF, per query id
        import org.apache.spark.sql.functions._
        val emb = Tables.load(spark, dir, "embeddings").persist()
        val adj = spark.read.parquet(GraphAnnQueries.graphIndexDir(spark, dir))
          .persist()
        val cents = AnnQueries.trainedCentroids(spark, dir, 8, 2)
        val assigned = emb.join(graft.operators.Ann.argminAssign(
          emb, "vec_id", "embedding", cents, "cid", "cv"), "vec_id").persist()
        val nVec = emb.count()
        Seq(0L, 101L, 202L, 303L, 404L, 777L, 1234L)
          .filter(_ < nVec).foreach { qid =>
          val q = emb.filter(col("vec_id") === qid)
            .select(col("embedding").cast("array<double>"))
            .head().getSeq[Double](0)
          val exact = graft.operators.Knn.knn(emb, "embedding", q, 10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val sweep = Seq((10, 5), (20, 8), (40, 10)).map { case (b, r) =>
            val (g, c) = graft.operators.GraphAnn.beamSearchProbe(
              emb, "vec_id", "embedding", adj, q, b, r, 10)
            val h = g.select("id").collect().map(_.getLong(0)).toSet
            f"b=$b r=$r: ${(h & exact).size}/10 ($c)"
          }
          val (g, gCands) = graft.operators.GraphAnn.beamSearchProbe(
            emb, "vec_id", "embedding", adj, q, 10, 5, 10)
          val gHits = g.select("id").collect().map(_.getLong(0)).toSet
          println(s"  sweep qid=$qid  " + sweep.mkString("  "))
          val ivfRes = Seq(1, 2).map { np =>
            val probes = graft.operators.Ann.probeClusters(
              cents, "cid", "cv", q, np).collect().map(_.getLong(0))
            val cand = assigned.filter(col("cluster").isin(probes: _*))
            val n = cand.count()
            val hits = cand.withColumn("score", graft.functions.VectorOps
                .cosine(col("embedding"), typedLit(q)))
              .orderBy(desc("score"), col("vec_id")).limit(10)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            (np, (hits & exact).size, n)
          }
          println(f"qid=$qid%5d graph: ${(gHits & exact).size}/10 " +
            f"($gCands cands)  " + ivfRes.map { case (np, r, n) =>
              f"ivf np=$np: $r/10 ($n cands)" }.mkString("  "))
        }
      case other => sys.error(s"unknown args: $other")
    }
    spark.stop()
  }
}
