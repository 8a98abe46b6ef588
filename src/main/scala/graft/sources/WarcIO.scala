package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** WARC-style archive I/O — the wire format a web-crawl pipeline
  * actually starts from (CommonCrawl ships WARC): records framed as
  *
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Record-ID: <urn:graft:doc:ID>\r\n
  *   Content-Length: N\r\n
  *   \r\n
  *   <N chars of payload>\r\n\r\n
  *
  * Production WARCs are gzip members and therefore NOT splittable —
  * the unit of parallelism is the FILE (CommonCrawl ships ~64k files
  * per crawl precisely so clusters can scale by file count). The
  * reader honors that shape: one task per file, records STREAMED off
  * the file's channel by Content-Length framing with O(one record)
  * buffering — a ~1 GB archive member never materializes in task
  * memory. The
  * writer shards deterministically (hash-placed, id-sorted within
  * shard) so re-runs and other engines produce byte-identical
  * archives — same discipline as SourceHealth.shardOrder.
  *
  * Payload lengths are counted in characters (the synthetic corpus is
  * ASCII, chars == bytes); a production build counts UTF-8 bytes and
  * slices on byte offsets. The roundtrip query validates the declared
  * Content-Length against the parsed payload per record, so a framing
  * bug cannot pass silently. */
object WarcIO {

  private val RecordSep = "WARC/1.0\r\n"

  /** Write `docs` (doc_id, text) as up to `files` WARC shard files
    * under `path` — byte-deterministic: records are hash-placed by
    * their doc_id residue (a pure function of the data, so rewrites
    * and other engines reproduce identical shard bytes) and id-sorted
    * within each shard. Residues can hash-collide into one partition,
    * so fewer than `files` non-empty shards is possible. */
  def write(docs: DataFrame, path: String, files: Int): Unit =
    docs
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(files, pmod(col("doc_id"), lit(files.toLong)))
      .sortWithinPartitions(col("doc_id"))
      .select(concat(
        lit(RecordSep),
        lit("WARC-Type: response\r\n"),
        lit("WARC-Record-ID: <urn:graft:doc:"), col("doc_id"), lit(">\r\n"),
        lit("Content-Length: "), length(col("text")), lit("\r\n"),
        lit("\r\n"),
        col("text"), lit("\r")).as("value"))
      .write.mode("overwrite").text(path)

  private val HeaderEnd = "\r\n\r\n"

  /** KMP failure table — the marker scan must not buffer the stream,
    * and a naive restart-on-mismatch scanner mis-handles patterns with
    * self-overlap (the \r\n\r\n header terminator has one). */
  private def kmpTable(p: String): Array[Int] = {
    val f = new Array[Int](p.length)
    var k = 0
    for (i <- 1 until p.length) {
      while (k > 0 && p.charAt(i) != p.charAt(k)) k = f(k - 1)
      if (p.charAt(i) == p.charAt(k)) k += 1
      f(i) = k
    }
    f
  }

  /** Consume `r` until `pat` has been fully read; returns false at
    * EOF-without-match. When `sink` is non-null it receives the chars
    * preceding the match (the matched pattern itself is removed). */
  private def scanTo(r: java.io.Reader, pat: String, tbl: Array[Int],
      sink: java.lang.StringBuilder): Boolean = {
    var k = 0
    var c = r.read()
    while (c >= 0) {
      val ch = c.toChar
      if (sink != null) sink.append(ch)
      while (k > 0 && ch != pat.charAt(k)) k = tbl(k - 1)
      if (ch == pat.charAt(k)) {
        k += 1
        if (k == pat.length) {
          if (sink != null) sink.setLength(sink.length - pat.length)
          return true
        }
      }
      c = r.read()
    }
    false
  }

  /** Sequential record walk over one file's STREAM — the parse
    * discipline a real WARC reader uses: scan forward to the next
    * record marker from the current cursor, read headers to the blank
    * line, consume exactly Content-Length payload chars, repeat.
    * Because the cursor only ever searches for markers BETWEEN records
    * (never inside a declared payload), a payload containing the
    * marker bytes — or any other framing text — parses losslessly; a
    * naive split-on-marker parse fails exactly there (WarcSpec pins
    * it). Buffering is O(one record): the scanner holds only the KMP
    * state, the current header block, and the current payload — never
    * the file (WarcSpec pins that too; CommonCrawl members are ~1 GB,
    * a whole-file String would double that in char[]). */
  private[graft] def parseRecords(reader: java.io.Reader): Iterator[(Long, Long, String)] =
    new Iterator[(Long, Long, String)] {
      private val markerTbl = kmpTable(RecordSep)
      private val hdrTbl = kmpTable(HeaderEnd)
      private var nextRec: (Long, Long, String) = null
      private def advance(): Unit = {
        nextRec = null
        if (!scanTo(reader, RecordSep, markerTbl, null)) return
        val hdrBuf = new java.lang.StringBuilder
        if (!scanTo(reader, HeaderEnd, hdrTbl, hdrBuf)) return
        val headers = hdrBuf.toString
        def hdr(name: String): Option[String] =
          headers.split("\r\n").find(_.startsWith(name + ": "))
            .map(_.substring(name.length + 2))
        val len = hdr("Content-Length").map(_.trim.toLong).getOrElse(-1L)
        val id = hdr("WARC-Record-ID")
          .flatMap("<urn:graft:doc:([0-9]+)>".r.findFirstMatchIn(_))
          .map(_.group(1).toLong).getOrElse(-1L)
        val want = math.max(0L, len).toInt
        val buf = new Array[Char](want)
        var got = 0
        var n = 0
        while (got < want &&
          { n = reader.read(buf, got, want - got); n >= 0 }) got += n
        nextRec = (id, len, new String(buf, 0, got))
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (Long, Long, String) = {
        val r = nextRec; advance(); r
      }
    }

  /** String convenience for specs and small fragments — same walk,
    * through a StringReader. */
  private[graft] def parseRecords(content: String): Iterator[(Long, Long, String)] =
    parseRecords(new java.io.StringReader(content))

  /** Read a WARC shard directory back to (doc_id, declared_length,
    * payload): one task per file (production WARCs are non-splittable
    * gzip members), records STREAMED off each file's channel by the
    * sequential Content-Length walk above — a shard never materializes
    * as one in-memory String, so task memory is bounded by the largest
    * record, not the largest file. The payload is always cut to its
    * DECLARED length — a separator-trim fallback would mask framing
    * bugs; the declared slice surfaces them as length mismatches. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(pds.open(),
            java.nio.charset.StandardCharsets.UTF_8), 64 * 1024)
        // Exhaustion closes eagerly below, but a short-circuiting
        // consumer (limit/take) or a parse failure never drives hasNext
        // to false — the completion listener covers those paths.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        val it = parseRecords(reader)
        new Iterator[(Long, Long, String)] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): (Long, Long, String) = it.next()
        }
      }
      .toDF("doc_id", "declared_length", "payload")
  }

  /** Roundtrip drill as an oracle-checked query: shard the documents
    * table to WARC once per (dir) generation, read it back through the
    * framing parser, and emit per-record digests + the length
    * validation — the oracle recomputes the same digests straight off
    * the parquet, so any framing/parse defect breaks hash parity. */
  /** Cheap corpus fingerprint of `dir`'s documents table: data file
    * count + max mtime + total bytes. A regenerated corpus at the same
    * path changes it, invalidating the cached archive — a _SUCCESS
    * marker alone persists across JVM runs and would silently serve
    * stale shards. */
  private def corpusFingerprint(dir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    val files = walk(new java.io.File(dir, "documents.parquet"))
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
    val maxM = if (files.isEmpty) 0L else files.map(_.lastModified).max
    s"${files.size}:$maxM:${files.map(_.length).sum}"
  }

  /** Write-once-per-generation archive of `dir`'s documents table;
    * returns its path. The archive is deterministic, so a shard set
    * whose fingerprint matches the current corpus is exactly what this
    * run would write. Path is keyed on basename PLUS a full-path hash
    * (two dirs sharing a basename must not collide), and creation is
    * serialized — check-then-write against a shared /tmp path would
    * let two concurrent callers corrupt it. */
  private val archiveLock = new Object
  private[graft] def ensureArchive(spark: SparkSession, dir: String): String = {
    val base = dir.split('/').filter(_.nonEmpty).lastOption.getOrElse("root")
      .replaceAll("[^A-Za-z0-9]", "_")
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    val path = s"/tmp/graft_warc/${base}_$h"
    archiveLock.synchronized {
      val fp = corpusFingerprint(dir)
      val fpFile = new java.io.File(path, "_FINGERPRINT")
      val cached =
        if (fpFile.exists())
          new String(java.nio.file.Files.readAllBytes(fpFile.toPath),
            java.nio.charset.StandardCharsets.UTF_8).trim
        else ""
      if (cached != fp) {
        write(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
          path, files = 8)
        java.nio.file.Files.write(fpFile.toPath,
          fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    path
  }

  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureArchive(spark, dir)
    read(spark, path)
      .select(col("doc_id"), col("declared_length"),
        (length(col("payload")) === col("declared_length")).as("length_ok"),
        md5(col("payload")).as("payload_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_warc_roundtrip" -> ((s, d) => roundtrip(s, d)))

  val oracle: Map[String, String] = Map(
    "src_warc_roundtrip" ->
      """SELECT doc_id, length(text)::BIGINT AS declared_length,
        |  true AS length_ok, md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin)
}
