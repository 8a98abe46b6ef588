package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user-stamped event on the stream (epoch-micro event time). */
final case class UserEvent(user_id: Long, event_id: Long, tus: Long,
    event_type: String)

/** One observed src→dst transition for a user. */
final case class TransitionEdge(user_id: Long, src_type: String,
    dst_type: String)

/** Streaming twin of `Behavior.transitions` — the per-user Markov
  * edge stream as keyed state.
  *
  * Per user the state is EXACTLY the last event seen (one row,
  * forever — no per-history growth, no watermark coupling); each
  * trigger sorts only its OWN batch's rows for the user by
  * (tus, event_id) and emits one [[TransitionEdge]] per adjacent
  * pair, bridging across triggers through the carried last event.
  * Emitted edges are append-only facts; the (src, dst) counting that
  * `Behavior.transitions` finishes with runs downstream (foreachBatch
  * upsert or a batch job over the edge log).
  *
  * Ordering contract: within a trigger, arrival order is repaired by
  * the sort; ACROSS triggers the fold assumes each user's events
  * arrive in (tus, event_id) order — the per-key ordering a
  * partitioned log (Kafka keyed by user) provides. A cross-trigger
  * straggler would pair with the wrong neighbor, exactly like any
  * last-value stream fold; BehaviorSpec proves batch parity on an
  * in-order split, including the cross-trigger bridge pair.
  */
/** One incremental experiment-counter update: how many NEW users and
  * NEW conversions this trigger contributed to a variant. */
final case class AbDelta(variant: String, d_users: Long, d_conv: Long)

/** Per-user A/B monitor state: counted into n_users yet; converted
  * yet. Two booleans per user — O(1) state per key, forever. */
final case class AbSeen(counted: Boolean, converted: Boolean)

/** One (event_type, ISO day) arrival for the streaming Holt fold. */
final case class TypedDay(event_type: String, day: String)

/** Streaming Holt state per event_type: the open day's count plus the
  * carried (level, trend) — O(1) per key, forever. */
final case class HoltCarry(day: String, n: Long, level: Long, trend: Long,
    seeded: Boolean, open: Boolean)

object StreamingBehavior {

  /** The scalar replay of `Behavior`'s md5 variant split (first hex
    * digit of md5(user_id || ":ab") < '8' → A). */
  private[graft] def abVariant(uid: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$uid:ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (hex.charAt(0) < '8') "A" else "B"
  }

  /** Streaming twin of `Behavior.abLift`'s counting core — the live
    * experiment monitor. Keyed first-seen/first-conversion state emits
    * one [[AbDelta]] the trigger a user first appears and the trigger
    * they first convert; a downstream running sum (foreachBatch upsert
    * or the dashboard's own accumulator) is then EXACTLY batch
    * `abLift`'s (n_users, n_conv) per variant at every point in time,
    * under ANY micro-batch chopping — first-seen gating makes the
    * deltas replay-idempotent per user, so totals never double-count
    * (BehaviorSpec proves chopping invariance against the batch twin).
    * The Wilson/z algebra is a per-trigger O(1) driver-side fold over
    * the two counters — deliberately downstream, like
    * `Behavior.transitions`' count step. */
  def abDeltas(ev: Dataset[UserEvent]): Dataset[AbDelta] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[AbSeen, AbDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[AbSeen]) =>
          val s0 = state.getOption.getOrElse(AbSeen(counted = false, converted = false))
          val sawConv = rows.exists(_.event_type == "purchase")
          val dU = if (!s0.counted) 1L else 0L
          val dC = if (!s0.converted && sawConv) 1L else 0L
          state.update(AbSeen(counted = true, converted = s0.converted || sawConv))
          if (dU == 0L && dC == 0L) Iterator.empty
          else Iterator(AbDelta(abVariant(uid), dU, dC))
      }
  }

  /** Streaming twin of `Behavior.holtDaily` — the live capacity
    * forecaster. Keyed per event_type, the state is exactly the OPEN
    * day (day, running count) plus the Holt (level, trend, seeded)
    * carried from closed days; a day CLOSES when a later day's first
    * row arrives, emitting one `HoltPoint` with the identical integer
    * fold the batch op runs (seed, then l += b + δ div 4,
    * b += (δ div 4) div 8). Emissions are append-only day-close
    * facts; the still-open day emits nothing until a later day closes
    * it — so on an in-order replay the emitted rows equal batch
    * `holtDaily` MINUS each type's final (open) day, pinned by spec.
    * Ordering contract: per-type day order across triggers, the same
    * in-order assumption as [[transitionEdges]] (within a trigger the
    * sort repairs arrival order; a cross-trigger straggler folds into
    * the open day). */
  def holtDayCloses(ev: Dataset[TypedDay]): Dataset[graft.operators.Behavior.HoltPoint] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.event_type)
      .flatMapGroupsWithState[HoltCarry, graft.operators.Behavior.HoltPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t: String, rows: Iterator[TypedDay], state: GroupState[HoltCarry]) =>
          var st = state.getOption.getOrElse(
            HoltCarry("", 0L, 0L, 0L, seeded = false, open = false))
          val out = Array.newBuilder[graft.operators.Behavior.HoltPoint]
          def close(): Unit = {
            if (st.open) {
              val (l, b) =
                if (!st.seeded) (st.n, 0L)
                else {
                  val dd = st.n - st.level - st.trend
                  (st.level + st.trend + dd / 4, st.trend + (dd / 4) / 8)
                }
              out += graft.operators.Behavior.HoltPoint(
                t, st.day, st.n, l, b, l + 7 * b)
              st = HoltCarry(st.day, 0L, l, b, seeded = true, open = false)
            }
          }
          rows.toArray.sortBy(_.day).foreach { r =>
            if (!st.open) st = st.copy(day = r.day, n = 1L, open = true)
            else if (r.day > st.day) {
              close(); st = st.copy(day = r.day, n = 1L, open = true)
            } else st = st.copy(n = st.n + 1L) // same day, or late: fold in
          }
          state.update(st)
          out.result().iterator
      }
  }

  def transitionEdges(ev: Dataset[UserEvent]): Dataset[TransitionEdge] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserEvent, TransitionEdge](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserEvent]) =>
          val batch = rows.toArray.sortBy(e => (e.tus, e.event_id))
          var last = state.getOption
          val out = Array.newBuilder[TransitionEdge]
          batch.foreach { e =>
            last.foreach(l => out += TransitionEdge(uid, l.event_type, e.event_type))
            last = Some(e)
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
