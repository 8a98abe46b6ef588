package graft.streaming

import org.apache.spark.sql.Column

/** Swappable generation identity for the rollable admitting gates:
  * holds the (tag, corpusFilter) pair that names the index generation a
  * gate probes AND merges into. Each micro-batch reads the handle
  * exactly ONCE at batch start via [[advance]], so its probe and its
  * admission-merge always target the same generation, and a handoff
  * takes effect at the next batch boundary — never mid-batch.
  *
  * Handoffs go through [[requestSwap]] + [[advance]]: the flip and its
  * catch-up run INSIDE the gate's own foreachBatch, after the previous
  * batch's merge has fully committed (micro-batches are serialized per
  * query), so the catch-up provably sees every admission the old
  * generation ever took — an immediate caller-side flip could never
  * close the batch-admits-into-G-after-the-catch-up window, which is
  * why no such API exists. [[graft.operators.Rollover.cutover]] is the
  * one scheduler — no caller hand-merges.
  *
  * ONE ADMITTING STREAM PER HANDLE. The promotion catch-up runs under
  * a single stream's batch serialization; a second stream sharing the
  * handle can be mid-batch on the old generation while the first
  * promotes, and its admissions land in the old log after the catch-up
  * read it. Those rows are never silently lost — they sit in the old
  * generation's log, and retiring it through
  * [[graft.operators.Rollover.dropGeneration]] with `foldInto` set to
  * the successor folds `old log − new log` before anything drops — but
  * the clean topology is one handle (and one cutover) per admitting
  * stream. */
final class GenerationRef(initialTag: String, initialFilter: Column) {
  private val ref =
    new java.util.concurrent.atomic.AtomicReference((initialTag, initialFilter))
  private val pendingRef = new java.util.concurrent.atomic.AtomicReference[
    (String, Column, () => Unit)](null)

  /** The current (tag, corpusFilter) — a plain read, no promotion. */
  def get(): (String, Column) = ref.get()

  /** The scheduled-but-unpromoted swap's tag, if one is pending —
    * [[graft.operators.Rollover.cutover]] fails fast on it (an
    * overlapping cutover would orphan the unpromoted generation and
    * could lose its admissions). */
  def pendingTag: Option[String] = Option(pendingRef.get()).map(_._1)

  /** Gate-side read at batch start: promote a pending swap first —
    * run its catch-up (fold admissions that landed in the old
    * generation since the cutover snapshot into the new one), then
    * flip — and return the generation this batch must use. Runs under
    * the batch's own serialization, so the catch-up races with no
    * in-flight merge. The pending entry is cleared only AFTER the
    * catch-up succeeds: a transient catch-up failure fails the batch,
    * and the replayed batch retries the promotion (the catch-up's
    * merges are idempotent) instead of silently abandoning it with the
    * gate pinned to the old generation. */
  def advance(): (String, Column) = {
    val p = pendingRef.get()
    if (p != null) {
      p._3()
      ref.set((p._1, p._2))
      pendingRef.compareAndSet(p, null)
    }
    ref.get()
  }

  /** Schedule a swap to `tag` at the next batch boundary; `catchUp`
    * runs inside that batch, before any probe of the new generation
    * (exactly once on success; a failed attempt fails the batch and is
    * retried by the replay). The old generation keeps serving (and
    * must not be dropped) until the promotion lands — observable as
    * `get()._1 == tag`.
    *
    * Scheduling is a compareAndSet from empty: a second swap scheduled
    * over an unpromoted one throws HERE, atomically, rather than
    * overwriting it — [[graft.operators.Rollover.cutover]]'s entry
    * check is check-then-act across its whole (long) build, so two
    * concurrent cutovers can both pass it, and without this guard the
    * loser's built generation (tables plus seeded log) would be
    * silently orphaned with no error. */
  def requestSwap(tag: String, corpusFilter: Column)(
      catchUp: () => Unit): Unit =
    if (!pendingRef.compareAndSet(null, (tag, corpusFilter, catchUp))) {
      val t = Option(pendingRef.get()).map(_._1).getOrElse("<promoted>")
      throw new IllegalStateException(
        s"swap to $tag scheduled over an unpromoted swap to $t — " +
          "wait for a batch to promote it (gen.get()._1 == tag) first")
    }
}
