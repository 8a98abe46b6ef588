package graft.streaming

import org.apache.spark.sql.Column

/** Swappable generation identity for the rollable admitting gates:
  * holds the (tag, corpusFilter) pair that names the index generation a
  * gate probes AND merges into. Each micro-batch reads the handle
  * exactly ONCE at batch start, so its probe and its admission-merge
  * always target the same generation, and a [[swap]] takes effect at
  * the next batch boundary — never mid-batch. That is the whole
  * handoff contract: an admitting stream keeps emitting verdicts
  * against generation G while G+1 retrains; once G+1 is built and
  * caught up (the batches admitted into G since the retrain snapshot
  * merged in), `swap` flips the handle and the old generation becomes
  * droppable ([[graft.operators.IndexStore.drop]]). RolloverSpec
  * drills the sequence and asserts one-verdict-per-doc totality across
  * the swap. */
final class GenerationRef(initialTag: String, initialFilter: Column) {
  private val ref =
    new java.util.concurrent.atomic.AtomicReference((initialTag, initialFilter))

  /** The current (tag, corpusFilter) — read once per micro-batch. */
  def get(): (String, Column) = ref.get()

  /** Point the gate at a new generation; subsequent batches probe and
    * merge into it. The caller is responsible for having built the new
    * generation AND caught it up with batches admitted since its build
    * snapshot (merge the kept frames in) BEFORE swapping — otherwise
    * documents admitted in the gap are forgotten. */
  def swap(tag: String, corpusFilter: Column): Unit =
    ref.set((tag, corpusFilter))
}
