package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.Sketches

/** A keyed (key, value) pair on the stream. */
final case class KeyedValue(key: String, value: String)

/** Running distinct-count estimate for one key. */
final case class DistinctEstimate(key: String, n_estimate: Long)

/** Streaming cardinality — per-key HLL registers as keyed state.
  *
  * `dropDuplicates` on a stream keeps every seen value in the state
  * store; over an unbounded stream that state grows without limit and
  * watermark eviction changes the answer. The sketch inverts the
  * trade: per key the state is EXACTLY Sketches.HllM bytes (one byte
  * per register) forever, and the estimate covers the whole stream
  * history, at HLL accuracy instead of exactness.
  *
  * The registers are updated with the SAME hash and estimated with the
  * SAME integer arithmetic as the batch column-algebra form
  * (Sketches.hllEstimateBy) — a streaming run over the same rows emits
  * bit-identical estimates to the batch query (spec-proven), so a
  * lambda architecture's serving layer can mix both without seams.
  *
  * Scale: one shuffle on the key (the groupByKey), then state-local
  * updates; no per-value state growth, no watermark coupling. Update
  * mode emits the refreshed estimate each trigger.
  */
object StreamingSketch {

  /** Running distinct-`value` estimate per key. */
  def distinctByKey(kv: Dataset[KeyedValue]): Dataset[DistinctEstimate] = {
    import kv.sparkSession.implicits._
    kv.groupByKey(_.key)
      .mapGroupsWithState[Array[Byte], DistinctEstimate](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[Array[Byte]]) =>
          val reg = state.getOption.getOrElse(new Array[Byte](Sketches.HllM))
          rows.foreach(r => Sketches.hllUpdate(reg, r.value))
          state.update(reg)
          DistinctEstimate(key, Sketches.hllEstimate(reg))
      }
  }
}
