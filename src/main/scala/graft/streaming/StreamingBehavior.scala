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
object StreamingBehavior {

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
