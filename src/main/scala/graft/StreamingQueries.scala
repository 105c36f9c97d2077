package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declared streaming-semantics queries in their batch-equivalent form
  * (SURVEY.md §7 step 5: DuckDB cannot run streams, so the declared
  * queries are the batch twins; the live streaming variants are in
  * graft.streaming.Stream and exercised by StreamSpec). `events.ts` is
  * epoch-ns BIGINT end-to-end (ns exactness, SURVEY.md §7). */
object StreamingQueries {

  /** 30-min session gap in MICROseconds: events.ts is epoch-ns in the
    * parquet, but DuckDB reads ns timestamps at µs precision (truncating),
    * so the declared query works in µs on both sides (`ts DIV 1000` here
    * == `epoch_us(ts)` there — verified floor-equivalent). */
  private val GapUs = 1800000000L

  /** Sessionization: per-user sessions split on >30-min inactivity gaps —
    * the flatMapGroupsWithState workload in its deterministic batch form
    * (lag + running sum of session-start flags, one shuffle on user_id). */
  val qSessionize = Q("q_sessionize",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("tsu", expr("ts DIV 1000"))
      val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      ev.withColumn("prev_ts", lag("tsu", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("tsu") - col("prev_ts") > GapUs, 1).otherwise(0))
        .withColumn("session_idx",
          sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min("tsu").as("start_us"),
          max("tsu").as("end_us"),
          sum(col("value").cast("decimal(20,2)")).cast("double")
            .as("sum_value"))
        .orderBy("user_id", "session_idx")
    },
    Some(s"""
      WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsn, value FROM events),
      l AS (
        SELECT *, lag(tsn) OVER (PARTITION BY user_id
                                 ORDER BY tsn, event_id) AS prev
        FROM x),
      f AS (
        SELECT *, CASE WHEN prev IS NULL OR tsn - prev > $GapUs
                       THEN 1 ELSE 0 END AS new_sess
        FROM l),
      se AS (
        SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                           ORDER BY tsn, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    AS session_idx
        FROM f)
      SELECT user_id, session_idx, COUNT(*) AS n_events,
             MIN(tsn) AS start_us, MAX(tsn) AS end_us,
             CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS sum_value
      FROM se GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

  /** Streaming dedup in batch form: keep the FIRST event per
    * (user_id, event_type) by event time — what
    * dropDuplicatesWithinWatermark computes on a bounded stream. */
  val qStreamDedup = Q("q_stream_dedup",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("tsu", expr("ts DIV 1000")) // µs, same truncation as oracle
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("tsu", "event_id")
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_first"),
          sum(col("value").cast("decimal(20,2)")).cast("double")
            .as("sum_first_value"))
        .orderBy("event_type")
    },
    Some("""
      WITH r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_us(ts), event_id) AS rn
        FROM events)
      SELECT event_type, COUNT(*) AS n_first,
             CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE)
               AS sum_first_value
      FROM r WHERE rn = 1
      GROUP BY event_type ORDER BY event_type"""))

  /** STREAM-STREAM interval join in its batch-twin form: view→click
    * attribution pairs from the SAME `Stream.attributionJoin` code path
    * the live streaming variant runs (watermarks are no-ops on batch
    * inputs — one function, two engines; StreamSpec asserts the live
    * watermarked join emits the identical pair set). Pairs aggregate to
    * per-user counts and exact-µs lag stats so the output stays bounded
    * while still pinning every matched pair. */
  val qStreamJoin = Q("q_stream_join",
    (s, dir) => {
      val pairs = graft.streaming.Stream.attributionJoin(
        Tables.load(s, dir, "events"))
      pairs.groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          min("lag_us").as("min_lag_us"),
          sum("lag_us").as("sum_lag_us"))
        .orderBy("user_id")
    },
    Some("""
      WITH v AS (
        SELECT user_id, event_id AS view_id, epoch_us(ts) AS vus
        FROM events WHERE event_type = 'view'),
      c AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT v.user_id, c.cus - v.vus AS lag_us
        FROM v JOIN c ON c.user_id = v.user_id
          AND c.cus > v.vus AND c.cus <= v.vus + 600000000)
      SELECT user_id, COUNT(*) AS n_pairs, MIN(lag_us) AS min_lag_us,
             CAST(SUM(lag_us) AS BIGINT) AS sum_lag_us
      FROM p GROUP BY user_id ORDER BY user_id"""))

  def queries: Seq[Q] = Seq(qSessionize, qStreamDedup, qStreamJoin)
}
