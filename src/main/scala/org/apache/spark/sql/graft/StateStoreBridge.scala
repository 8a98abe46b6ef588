package org.apache.spark.sql.graft

/** Bench-only bridge into the executor-local state-store registry
  * (package-private to org.apache.spark.sql, hence this package).
  *
  * Why it exists: every bench streaming sample runs against a FRESH
  * checkpoint, so the provider instances of prior samples/warmups are
  * dead weight that only the 60 s maintenance tick would unload — and
  * a tick landing MID-sample snapshots/evicts exactly while the clock
  * runs (the documented 30-50% single-sample dip; see SURVEY §10 and
  * the r14 finding that DEFERRING maintenance instead leaks RocksDB
  * instances and costs the composed engine ~45%). [[unloadAll]] lets
  * the bench clear dead providers OFF-CLOCK between samples: the
  * maintenance tick then has nothing stale to do inside the measured
  * window, without touching the maintenance interval itself.
  *
  * Never used by library code — a production query's providers are
  * its working set; unloading them would force a rebuild on the next
  * batch. */
object StateStoreBridge {
  def unloadAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
