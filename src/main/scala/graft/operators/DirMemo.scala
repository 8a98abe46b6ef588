package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped (session, dir)-keyed memo for expensive subplans
  * shared across queries — the materialize-once-per-generation shape of
  * a production run, keyed exactly like Tables.registerAll. Holders
  * hand out localCheckpoint-backed frames (materialized,
  * lineage-truncated), so every consumer reads identical bits and
  * result hashes are unchanged; WeakHashMap lets a stopped session's
  * entry be collected. */
private[operators] final class DirMemo {
  private val m = new java.util.WeakHashMap[SparkSession, (String, DataFrame)]()
  def apply(spark: SparkSession, dir: String)(compute: => DataFrame): DataFrame =
    m.synchronized {
      Option(m.get(spark)) match {
        case Some((d, df)) if d == dir => df
        case _ =>
          val df = compute
          m.put(spark, (dir, df))
          df
      }
    }
}
