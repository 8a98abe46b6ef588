package graft.operators

import java.lang.ref.SoftReference

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped (session, dir)-keyed memo for expensive subplans
  * shared across queries — the materialize-once-per-generation shape of
  * a production run, keyed exactly like Tables.registerAll. Holders
  * hand out localCheckpoint-backed frames (materialized,
  * lineage-truncated); every memoized frame is deterministic
  * exact-integer content, so consumers agree whether they read the
  * memo or a rebuild.
  *
  * The value is held through a SoftReference: a DataFrame strongly
  * references its own SparkSession, so a plain WeakHashMap value would
  * pin its key forever and a stopped session's checkpoint blocks would
  * leak for the JVM lifetime. Soft values break that cycle under
  * memory pressure — a cleared entry costs one rebuild, never a wrong
  * answer — and once cleared, the dead session's key is weakly
  * reachable and collectable like the scaladoc always claimed. */
private[operators] final class DirMemo {
  private val m =
    new java.util.WeakHashMap[SparkSession, (String, SoftReference[DataFrame])]()
  def apply(spark: SparkSession, dir: String)(compute: => DataFrame): DataFrame =
    m.synchronized {
      val hit = Option(m.get(spark)).flatMap { case (d, ref) =>
        if (d == dir) Option(ref.get()) else None
      }
      hit.getOrElse {
        val df = compute
        m.put(spark, (dir, new SoftReference(df)))
        df
      }
    }
}
