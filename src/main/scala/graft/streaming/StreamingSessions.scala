package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming session windows — the one windowing mode whose state is
  * data-dependent (a session's extent isn't known until the gap
  * elapses): Spark's `session_window` merges adjacent state as events
  * arrive and finalizes a (user, session) row only once the watermark
  * passes the session end, so append mode emits each session exactly
  * once. Same aggregate arithmetic as the batch
  * `Windows.userSessions` (integer-cents sum — order-independent and
  * exact), which is what lets the spec assert stream ≡ batch on the
  * same replay.
  *
  * Scale shape: one hash shuffle on user_id into the session state
  * store; state per (user, open session) only, watermark-evicted. */
object StreamingSessions {

  def userSessions(events: DataFrame, gap: String = "30 minutes",
      slack: String = "5 seconds"): DataFrame =
    events.withWatermark("ts", slack)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
}
