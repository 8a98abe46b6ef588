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
