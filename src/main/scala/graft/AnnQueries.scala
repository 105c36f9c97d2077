package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.functions.VectorOps

/** Declared approximate-nearest-neighbor queries (the 100 TB similarity-
  * search path; brute-force exact kNN is `v_knn`). Both the IVF and LSH
  * pipelines are fully deterministic, so the DuckDB oracle replays the
  * identical algorithm — these are exact-match checks of an approximate
  * ALGORITHM, not recall checks. */
object AnnQueries {

  private val cosineSqlAB =
    """list_inner_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))
       / (sqrt(list_inner_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[])))
          * sqrt(list_inner_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))))"""

  private def cosSql(a: String, b: String) =
    cosineSqlAB.format(a, b, a, a, b, b)

  /** IVF: 8 deterministic centroids (vec_id < 8), nprobe=2, top-10 cosine
    * within probed cells. */
  val annIvf = Q("ann_ivf",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Ann.ivfSearch(emb, "vec_id", "embedding", centroids, "cid", "cv",
          q, nprobe = 2, k = 10)
        .select(col("vec_id"), col("cluster"),
          floor(col("score") * 1e6 + lit(0.5)).cast("long").as("score_micro"))
    },
    Some(s"""
      WITH c AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 8),
      q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id = 0),
      assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv),
                          c.cid) AS rn
        FROM embeddings e CROSS JOIN c),
      amin AS (SELECT vec_id, cid AS cluster FROM assign WHERE rn = 1),
      probes AS (
        SELECT cid FROM c CROSS JOIN q
        ORDER BY list_distance(cv, qv), cid LIMIT 2),
      cand AS (
        SELECT e.vec_id, a.cluster,
               ${cosSql("e.embedding", "(SELECT qv FROM q)")} AS score
        FROM embeddings e
        JOIN amin a ON a.vec_id = e.vec_id
        WHERE a.cluster IN (SELECT cid FROM probes))
      SELECT vec_id, cluster,
             CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM cand ORDER BY score DESC, vec_id LIMIT 10"""))

  private val NumPlanes = 8
  private lazy val planes = Ann.hyperplanes(NumPlanes, 64)

  private[graft] def planeSqlLit(p: Seq[Double]): String =
    p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** LSH bucket id SQL expression for a column named `c` over `pls` —
    * DuckDB replay of Ann.lshBucket(c, pls). */
  private[graft] def bucketSqlFor(c: String, pls: Seq[Seq[Double]]): String =
    pls.zipWithIndex.map { case (pl, p) =>
      s"(CASE WHEN list_inner_product(CAST($c AS DOUBLE[]), ${planeSqlLit(pl)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def bucketSql(c: String): String = bucketSqlFor(c, planes)

  /** LSH probe: top-10 cosine within the query vector's 8-bit bucket. */
  val annLsh = Q("ann_lsh",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .withColumn("bucket", Ann.lshBucket(col("embedding"), planes))
      val qRow = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"), col("bucket"))
        .head()
      val (qv, qb) = (qRow.getSeq[Double](0), qRow.getLong(1))
      emb.filter(col("bucket") === qb)
        .withColumn("score", VectorOps.cosine(col("embedding"), typedLit(qv)))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("bucket"),
          floor(col("score") * 1e6 + lit(0.5)).cast("long").as("score_micro"))
    },
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
        FROM embeddings),
      q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, bucket AS qb
            FROM b WHERE vec_id = 0)
      SELECT vec_id, bucket,
             CAST(floor(${cosSql("embedding", "(SELECT qv FROM q)")}
               * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM b WHERE bucket = (SELECT qb FROM q)
      ORDER BY ${cosSql("embedding", "(SELECT qv FROM q)")} DESC, vec_id
      LIMIT 10"""))

  /** LSH bucket histogram — the data-distribution sanity check an LSH
    * index build needs (skewed buckets → more planes). */
  val annLshStats = Q("ann_lsh_stats",
    (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .withColumn("bucket", Ann.lshBucket(col("embedding"), planes))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
    Some(s"""
      SELECT ${bucketSql("embedding")} AS bucket, COUNT(*) AS n
      FROM embeddings GROUP BY 1 ORDER BY bucket"""))

  def queries: Seq[Q] = Seq(annIvf, annLsh, annLshStats)
}
