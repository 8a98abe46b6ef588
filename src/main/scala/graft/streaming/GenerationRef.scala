package graft.streaming

import org.apache.spark.sql.Column

/** Swappable generation identity for the rollable admitting gates:
  * holds the (tag, corpusFilter) pair that names the index generation a
  * gate probes AND merges into. Each micro-batch reads the handle
  * exactly ONCE at batch start via [[advance]], so its probe and its
  * admission-merge always target the same generation, and a handoff
  * takes effect at the next batch boundary — never mid-batch.
  *
  * Two handoff modes:
  *  - [[swap]] flips immediately — correct only when the caller has
  *    already folded every admission made since the new generation's
  *    build snapshot into it AND no batch can land between that
  *    catch-up and the flip (a paused drill; a continuously-arriving
  *    topology cannot guarantee it).
  *  - [[requestSwap]] + [[advance]] closes that window: the flip and
  *    its catch-up run INSIDE the gate's own foreachBatch, after the
  *    previous batch's merge has fully committed (micro-batches are
  *    serialized per query), so the catch-up provably sees every
  *    admission the old generation ever took. This is what
  *    [[graft.operators.Rollover.cutover]] uses — no caller
  *    hand-merges. */
final class GenerationRef(initialTag: String, initialFilter: Column) {
  private val ref =
    new java.util.concurrent.atomic.AtomicReference((initialTag, initialFilter))
  private val pending = new java.util.concurrent.atomic.AtomicReference[
    (String, Column, () => Unit)](null)

  /** The current (tag, corpusFilter) — a plain read, no promotion. */
  def get(): (String, Column) = ref.get()

  /** Gate-side read at batch start: promote a pending swap first —
    * run its catch-up (fold admissions that landed in the old
    * generation since the cutover snapshot into the new one), then
    * flip — and return the generation this batch must use. Runs under
    * the batch's own serialization, so the catch-up races with no
    * in-flight merge. */
  def advance(): (String, Column) = {
    val p = pending.getAndSet(null)
    if (p != null) { p._3(); ref.set((p._1, p._2)) }
    ref.get()
  }

  /** Schedule a swap to `tag` at the next batch boundary; `catchUp`
    * runs exactly once, inside that batch, before any probe of the new
    * generation. The old generation keeps serving (and must not be
    * dropped) until the promotion lands — observable as
    * `get()._1 == tag`. */
  def requestSwap(tag: String, corpusFilter: Column)(
      catchUp: () => Unit): Unit =
    pending.set((tag, corpusFilter, catchUp))

  /** Immediate flip — see the class doc for when this is sound.
    * Subsequent batches probe and merge into the new generation. */
  def swap(tag: String, corpusFilter: Column): Unit =
    ref.set((tag, corpusFilter))
}
