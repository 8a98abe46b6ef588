package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sliding and session windows over the events stream table — beyond
  * the reference's tumbling-only surface (SURVEY.md §2.4 note: "No
  * sliding or session windows anywhere"), but table-stakes for the
  * engine that replaces it. Both run identically on batch and
  * streaming DataFrames (`window(slide)` / `session_window` are
  * Structured-Streaming-native).
  *
  * Scale notes: a sliding window of width W and slide S replicates
  * every event W/S times BEFORE the shuffle — keep W/S small or
  * pre-aggregate to tumbling S-buckets first and roll up (the cascade
  * trick, StreamingOhlcv.cascadeBars). Session windows shuffle by key
  * and merge adjacent sessions in the state store; skewed users → the
  * Skew utilities.
  */
object Windows {

  /** 10-minute windows sliding every 5 — each event lands in exactly 2. */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("mx"))

  /** Top-3 users per 10-minute sliding window — the windowed top-k
    * composition: per-(window, user) counts partial-aggregate map-side,
    * then the bounded TopKByScore Aggregator caps what crosses the
    * final shuffle at k × partitions per window (a per-window
    * row_number would funnel every user count through one reducer per
    * window — the shape PlanShapeSpec bans for similarity top-k, banned
    * here for the same reason). */
  def slidingTopUsers(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val topk = udaf(new graft.functions.TopKByScore(3))
    counts.groupBy(col("w"))
      // counts < 2^53: the double round-trip through the buffer is exact
      .agg(topk(col("user_id"), col("n").cast("double")).as("top"))
      .select(col("w.start").as("window_start"), posexplode(col("top")))
      .select(col("window_start"), (col("pos") + lit(1)).as("rnk"),
        col("col.vec_id").as("user_id"), col("col.cosine").cast("long").as("n_events"))
  }

  /** Per-user sessions with a 30-minute inactivity gap: session_end =
    * last event + gap (Spark session_window semantics). */
  def userSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // integer-cents sum: order-independent and exact (a raw double
        // sum's last bits depend on partition merge order)
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_sliding_counts" -> ((s, d) => slidingCounts(s, d)),
    "win_sliding_topk" -> ((s, d) => slidingTopUsers(s, d)),
    "win_user_sessions" -> ((s, d) => userSessions(s, d)))

  val oracle: Map[String, String] = Map(
    // every event belongs to the two 5-min-aligned starts covering it
    "win_sliding_counts" ->
      """WITH x AS (SELECT event_type, value,
        |    to_timestamp((epoch_us(ts) // 300000000) * 300 - k * 300)::TIMESTAMP AS window_start
        |  FROM events, (SELECT unnest([0, 1]) AS k))
        |SELECT window_start, window_start + INTERVAL 10 MINUTE AS window_end,
        |  event_type, count(*)::BIGINT AS n, max(value) AS mx
        |FROM x GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,
    // same two-start expansion, then rank user counts inside each window
    "win_sliding_topk" ->
      """WITH x AS (SELECT user_id,
        |    to_timestamp((epoch_us(ts) // 300000000) * 300 - k * 300)::TIMESTAMP AS window_start
        |  FROM events, (SELECT unnest([0, 1]) AS k)),
        |c AS (SELECT window_start, user_id, count(*)::BIGINT AS n_events
        |  FROM x GROUP BY 1, 2),
        |r AS (SELECT window_start, user_id, n_events,
        |    row_number() OVER (PARTITION BY window_start ORDER BY n_events DESC, user_id) AS rnk
        |  FROM c)
        |SELECT window_start, rnk, user_id, n_events
        |FROM r WHERE rnk <= 3 ORDER BY window_start, rnk""".stripMargin,
    // gaps-and-islands replay of session_window(ts, 30 min)
    "win_user_sessions" ->
      """WITH o AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, count(*)::BIGINT AS n_events,
        |  sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT / 100.0 AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)
}
