package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotProduct
import graft.operators.Similarity

/** SemDeDup (and the whole coarse-quantizer tier) reuses the persisted
  * ANN generation's books when one exists: the books table is the same
  * quantizer the session memo holds, made durable — so a session that
  * finds a generation on disk must NOT rerun Lloyd's, and the loaded
  * centroids must be bit-identical to freshly trained ones (doubles
  * round-trip parquet exactly; training is order-independent
  * exact-integer sums). `dedup_semdedup`'s oracle hash is unchanged by
  * construction — this spec pins the skip and the parity. The "later
  * session" is a real `newSession()` (fresh DirMemo keys, shared
  * catalog — the cross-session shape the persistence exists for). */
class PersistedBooksReuseSpec extends SparkSpec {

  test("a new session's SemDeDup serves from the persisted books; no Lloyd's rerun") {
    // the default generation may or may not already exist in this
    // shared test JVM — ensure is a catalog hit or exactly one build
    val existed = {
      val sfx = graft.operators.IndexStore.suffix(sf0001, "", lit(true))
      spark.catalog.tableExists(s"graft_pq_books_$sfx")
    }
    val before = Similarity.lloydRuns.get()
    val (booksT, _) = Similarity.ensurePqIndex(spark, sf0001)
    val afterBuild = Similarity.lloydRuns.get()
    assert(afterBuild == before + (if (existed) 0 else 1),
      s"unexpected training count around ensurePqIndex (existed=$existed)")

    // a LATER SESSION: fresh memos, shared catalog — the full SemDeDup
    // chain must load the generation's books, training nothing
    val s2 = spark.newSession()
    val verdict = Similarity.semDeDup(s2, sf0001)
    assert(verdict.count() > 0)
    assert(Similarity.lloydRuns.get() == afterBuild,
      "a new session retrained Lloyd's despite the persisted generation")

    // loaded centroids == freshly trained centroids, bit for bit
    val emb = Tables.embeddings(spark, sf0001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
      .localCheckpoint()
    val fresh = Similarity.kmeansCentroids(emb) // deliberate retrain
    val loaded = Similarity.loadBooks(spark, booksT)._1
    assert(loaded.length == fresh.length && loaded.nonEmpty)
    loaded.zip(fresh).foreach { case ((lc, lv), (fc, fv)) =>
      assert(lc == fc, s"cell id mismatch: $lc vs $fc")
      assert(java.util.Arrays.equals(lv, fv),
        s"centroid $lc not bit-identical after parquet round-trip")
    }
  }
}
