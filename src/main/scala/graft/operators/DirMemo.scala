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
/** DirMemo's (session, dir) keying for small NON-frame values
  * (centroid arrays, greedy picks): weak session keys like DirMemo's,
  * but dir-keyed inner maps and strong values — the payloads are a
  * few KB, carry no SparkSession reference, and two dirs' racing
  * computes must both survive (a single-slot stash racing DirMemo's
  * discard-the-loser convention can strand a consumer with the wrong
  * dir's value). */
private[operators] final class SessionDirMemo[A] {
  private val m = new java.util.WeakHashMap[
    org.apache.spark.sql.SparkSession, scala.collection.concurrent.TrieMap[String, A]]()
  private def map(spark: SparkSession) = m.synchronized {
    Option(m.get(spark)).getOrElse {
      val mm = scala.collection.concurrent.TrieMap.empty[String, A]
      m.put(spark, mm); mm
    }
  }
  def apply(spark: SparkSession, dir: String)(compute: => A): A =
    map(spark).getOrElseUpdate(dir, compute)
  def put(spark: SparkSession, dir: String, a: A): Unit = map(spark).put(dir, a)
  def get(spark: SparkSession, dir: String): Option[A] = map(spark).get(dir)
}

private[operators] final class DirMemo {
  private val m =
    new java.util.WeakHashMap[SparkSession, (String, SoftReference[DataFrame])]()
  private def lookup(spark: SparkSession, dir: String): Option[DataFrame] =
    m.synchronized {
      Option(m.get(spark)).flatMap { case (d, ref) =>
        if (d == dir) Option(ref.get()) else None
      }
    }

  /** `compute` runs an eager localCheckpoint job, so it must NOT run
    * under the map lock — a second session's cheap hit would serialize
    * behind the first session's build. Double-checked put instead: two
    * racing misses may both build, and the loser's frame is discarded
    * in favor of the installed winner (the frames are deterministic, so
    * which one survives is unobservable — a rare duplicate job, never a
    * wrong answer). */
  def apply(spark: SparkSession, dir: String)(compute: => DataFrame): DataFrame =
    lookup(spark, dir).getOrElse {
      val df = compute
      m.synchronized {
        Option(m.get(spark)).flatMap { case (d, ref) =>
          if (d == dir) Option(ref.get()) else None
        }.getOrElse { m.put(spark, (dir, new SoftReference(df))); df }
      }
    }
}
