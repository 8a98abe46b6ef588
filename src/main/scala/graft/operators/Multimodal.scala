package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing for training-data pipelines (extension,
  * SURVEY.md §7.1(7)): media as opaque `binary` payloads plus typed
  * metadata, with decode / feature-extract / frame-sample stages.
  *
  * The image decode is REAL (JDK ImageIO parsing BMP fixture bytes,
  * dims read from the decoded bitmap), so is the audio decode (JDK
  * javax.sound.sampled parsing RIFF/WAVE fixtures — header facts and
  * PCM samples from the codec), and so is the video path: a RIFF/AVI
  * walk (ids, sizes, padding read from the container) demuxes
  * MJPEG-in-AVI fixtures into per-frame chunks that the JDK JPEG codec
  * decodes — dims/frame-count are decoded facts, mean luma a true
  * lossy round trip. Undecodable bytes fall back to clearly-marked
  * deterministic stubs (the seam a deployment fills with its codec).
  * Everything around the codec seam is the real engine surface a
  * 100 TB media pipeline needs:
  *
  *  - schema: `(doc_id, media_type, payload binary, meta struct)` —
  *    payload stays opaque bytes end-to-end, never a string detour;
  *  - partition-parallel batched execution: `mapPartitions` over a
  *    typed Dataset, draining each partition in fixed-size batches
  *    (the JVM analog of Arrow-batched mapInPandas: the decoder is
  *    amortized per batch, not invoked per row, and memory is bounded
  *    by batch size × payload size, not partition size);
  *  - feature extraction is real compute (byte-class histogram over the
  *    raw payload) and the frame sampler is real arithmetic over byte
  *    offsets — both oracle-verified;
  *  - no shuffle anywhere: every stage is a narrow per-partition map,
  *    so the pipeline scales with input splits.
  *
  * Payloads here are the documents' UTF-8 bytes standing in for encoded
  * media (testdata has no binary table); the operator surface does not
  * depend on what the bytes mean.
  */
object Multimodal {

  /** Typed media record — the pipeline's wire schema. */
  final case class MediaMeta(source: String, n_bytes: Long)
  final case class MediaRecord(doc_id: Long, media_type: String,
      payload: Array[Byte], meta: MediaMeta)

  /** Decoded media header (the stub decoder's output). */
  final case class DecodedMedia(doc_id: Long, media_type: String,
      n_bytes: Long, width: Long, height: Long)

  /** Extracted per-payload features (real byte-level compute). */
  final case class MediaFeatures(doc_id: Long, n_alpha: Long, n_digit: Long,
      n_space: Long, n_other: Long)

  val BatchSize = 64
  val FrameBytes = 64
  val FrameStride = 4

  /** documents → typed media table: payload = raw UTF-8 bytes. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        // octet_length, not length: metadata carries the PAYLOAD's byte
        // count (frame planning does ranged reads from it) — character
        // count diverges on any non-ASCII text
        struct(col("source"), octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))
      // deterministic hash spread BEFORE the codec stages: the demo
      // corpus is one parquet split, which would run every decode on a
      // single core — at 100 TB the file count provides this
      // parallelism for free, locally the one narrow shuffle of ids +
      // payloads buys core-count codec throughput
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[MediaRecord]
  }

  /** Partition-parallel batched execution: drain the partition in
    * BatchSize groups. The batch boundary is the amortization hook — a
    * real codec opens its context once per batch here (this container
    * has no codecs, so `f` receives the whole batch and the stub maps
    * per record). */
  private def inBatches[T](it: Iterator[MediaRecord])(f: Seq[MediaRecord] => Iterator[T]): Iterator[T] =
    it.grouped(BatchSize).flatMap(f)

  /** Fixture dims: derived from the first payload bytes so the oracle
    * can replay them. The image fixtures below are ENCODED with these
    * dims; the decoder then reads them back from the real bitmap
    * header, so for images the emitted values are decoded facts, with
    * this arithmetic living only in the fixture builder (and oracle). */
  private def fixtureDims(payload: Array[Byte]): (Long, Long) = {
    val b0 = if (payload.length > 0) payload(0) & 0xffL else 0L
    val b1 = if (payload.length > 1) payload(1) & 0xffL else 0L
    (16L + b0 % 64, 16L + b1 % 64) // (width, height)
  }

  /** Deterministic BMP fixture for an image row: a REAL encoded bitmap
    * (JDK ImageIO, offline-available) with [[fixtureDims]] dimensions
    * and gray pixels = payload bytes cycled. The corpus has no binary
    * media, so image rows synthesize this stand-in — but the bytes ARE
    * a decodable image, which is what lets the decode stage run a real
    * codec instead of a stub. */
  private[graft] def bmpFixture(payload: Array[Byte]): Array[Byte] = {
    val (w, h) = fixtureDims(payload)
    val img = new java.awt.image.BufferedImage(
      w.toInt, h.toInt, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    var i = 0
    while (y < h.toInt) {
      var x = 0
      while (x < w.toInt) {
        val v = if (payload.length == 0) 0 else payload(i % payload.length) & 0xff
        raster.setSample(x, y, 0, v)
        i += 1
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** REAL image decode: JDK ImageIO parsing actual BMP bytes — width/
    * height/pixels come from the decoded bitmap, not from arithmetic
    * over the input. Returns null for undecodable bytes (ImageIO's
    * contract), which the caller maps to the stub fallback. */
  private def decodeImage(bmp: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))

  /** Batched partition-parallel decode: drains each partition in
    * BatchSize groups (Arrow-batch analog). Image rows run the REAL
    * ImageIO codec against their BMP fixture bytes (decoded dims, not
    * computed ones); audio/video rows — codecs this container lacks —
    * keep the deterministic stub fallback, the honest seam a real
    * deployment fills with its own codec. */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      inBatches(it) { batch =>
        batch.iterator.map { m =>
          val (w, h) =
            if (m.media_type == "image") {
              val img = decodeImage(bmpFixture(m.payload))
              if (img == null) fixtureDims(m.payload) // undecodable → stub
              else (img.getWidth.toLong, img.getHeight.toLong)
            } else if (m.media_type == "video") {
              // real path: demux the AVI, decode frame 0's JPEG
              try {
                val img = decodeImage(demuxAvi(aviFixture(m.payload)).head)
                if (img == null) fixtureDims(m.payload)
                else (img.getWidth.toLong, img.getHeight.toLong)
              } catch {
                case scala.util.control.NonFatal(_) => fixtureDims(m.payload)
              }
            } else fixtureDims(m.payload) // audio dims are not a concept: stub
          DecodedMedia(m.doc_id, m.media_type, m.meta.n_bytes, w, h)
        }
      }
    }
  }

  // ---------------------------------------------------------------- video

  /** Frames per video fixture — oracle-replayable arithmetic, like
    * [[fixtureDims]]: the fixture is ENCODED with this count and the
    * demuxer reads it back from the real container. */
  private[graft] def videoFrameCount(nBytes: Long): Int = (1 + nBytes % 4).toInt

  /** One decoded video frame: dims from the decoded JPEG, mean luma
    * from its pixels (a real lossy-codec round trip — spec-checked to
    * ±2 of the encoded constant, excluded from the DuckDB oracle). */
  final case class VideoFrame(doc_id: Long, frame_no: Long,
      width: Long, height: Long, mean_luma: Long)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def aviChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    cc(id) ++ le32(data.length) ++ data ++ pad
  }
  private def aviList(listType: String, children: Array[Byte]): Array[Byte] =
    cc("LIST") ++ le32(4 + children.length) ++ cc(listType) ++ children

  /** Deterministic MJPEG-in-AVI fixture for a video row: a REAL RIFF/AVI
    * container (avih + strl headers, MJPG stream, movi list) whose
    * '00dc' chunks each hold a REAL JDK-encoded JPEG — frame f is a
    * constant-gray [[fixtureDims]] image at luma payload[f] (cycled).
    * As with [[bmpFixture]]/[[wavFixture]], the corpus has no binary
    * media so video rows synthesize a stand-in — but the bytes ARE a
    * demuxable AVI of decodable JPEGs, which is what lets the video
    * stage run a real container walk + image codec instead of a stub. */
  private[graft] def aviFixture(payload: Array[Byte]): Array[Byte] = {
    val (w, h) = fixtureDims(payload)
    val n = videoFrameCount(payload.length.toLong)
    val jpegs = (0 until n).map { f =>
      val v = if (payload.length == 0) 0 else payload(f % payload.length) & 0xff
      val img = new java.awt.image.BufferedImage(
        w.toInt, h.toInt, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h.toInt) {
        var x = 0
        while (x < w.toInt) { raster.setSample(x, y, 0, v); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val maxJpeg = jpegs.map(_.length).max
    val strh = aviChunk("strh",
      cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(n) ++
        le32(maxJpeg) ++ le32(-1) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w.toInt) ++ le16(h.toInt))
    val strf = aviChunk("strf", // BITMAPINFOHEADER, biCompression='MJPG'
      le32(40) ++ le32(w.toInt) ++ le32(h.toInt) ++ le16(1) ++ le16(24) ++
        cc("MJPG") ++ le32(w.toInt * h.toInt * 3) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val avih = aviChunk("avih",
      le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(n) ++
        le32(0) ++ le32(1) ++ le32(maxJpeg) ++ le32(w.toInt) ++ le32(h.toInt) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = aviList("hdrl", avih ++ aviList("strl", strh ++ strf))
    val movi = aviList("movi",
      jpegs.map(j => aviChunk("00dc", j)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rdCc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** REAL container demux: walk the RIFF chunk structure (ids + sizes
    * read from the file, even-byte padding honored), find the 'movi'
    * list, and return each video chunk's ('00dc'/'00db') payload —
    * the per-frame JPEG byte ranges a ranged-read pipeline would fetch.
    * Throws on non-AVI bytes (caller maps to the stub fallback). */
  private[graft] def demuxAvi(avi: Array[Byte]): Seq[Array[Byte]] = {
    require(avi.length >= 12 && rdCc(avi, 0) == "RIFF" && rdCc(avi, 8) == "AVI ",
      "not a RIFF/AVI file")
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = rdCc(avi, off)
        val sz = rdLe32(avi, off + 4)
        if (id == "LIST") {
          val listType = rdCc(avi, off + 8)
          walk(off + 12, off + 8 + sz, inMovi || listType == "movi")
        } else if (inMovi && (id.endsWith("dc") || id.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(avi, off + 8, off + 8 + sz)
        }
        off += 8 + sz + (sz % 2) // chunks are even-aligned
      }
    }
    walk(12, avi.length, inMovi = false)
    frames.result()
  }

  /** REAL video decode: demux the AVI container, decode every MJPEG
    * frame with the JDK image codec, report decoded dims and the mean
    * decoded luma (Σ pixels / count, integer division). Dims and frame
    * count are decoded facts that happen to equal the fixture plan
    * (which is what the oracle replays); mean luma is a true lossy
    * round trip, so it is spec-asserted (±2 of the encoded constant)
    * rather than oracle-hashed. Undecodable bytes fall back to the
    * planned arithmetic — the honest stub seam, as with image/audio.
    *
    * Scale: narrow batched mapPartitions, no shuffle; at 100 TB the
    * demux walk is header-sized reads and each frame decode is an
    * independent CPU task inside the partition. */
  def videoFrames(media: Dataset[MediaRecord]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").mapPartitions { it =>
      inBatches(it) { batch =>
        batch.iterator.flatMap { m =>
          try {
            demuxAvi(aviFixture(m.payload)).iterator.zipWithIndex.map {
              case (jpeg, f) =>
                val img = decodeImage(jpeg)
                val raster = img.getRaster
                val (w, h) = (img.getWidth, img.getHeight)
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
                  y += 1
                }
                VideoFrame(m.doc_id, f.toLong, w.toLong, h.toLong,
                  sum / (w.toLong * h))
            }
          } catch {
            case scala.util.control.NonFatal(_) => // stub seam: planned values
              val (w, h) = fixtureDims(m.payload)
              (0 until videoFrameCount(m.payload.length.toLong)).iterator.map {
                f =>
                  val v = if (m.payload.length == 0) 0L
                    else (m.payload(f % m.payload.length) & 0xff).toLong
                  VideoFrame(m.doc_id, f.toLong, w, h, v)
              }
          }
        }
      }
    }
  }

  /** One decoded-audio analysis window: exact integer energy. */
  final case class AudioWindow(doc_id: Long, sample_rate: Long,
      n_samples: Long, window_idx: Long, sum_sq: Long)

  val AudioRate = 8000f
  val AudioWindowSamples = 16

  /** Deterministic WAV fixture for an audio row: a REAL RIFF/WAVE file
    * (JDK javax.sound.sampled, offline-available) — 16-bit mono PCM at
    * 8 kHz, one sample per payload byte, centered and scaled:
    * s_i = (byte_i − 128) · 256. As with [[bmpFixture]], the corpus has
    * no binary media, so audio rows synthesize a stand-in — but the
    * bytes ARE a decodable WAV, which is what lets the audio stage run
    * a real codec instead of the stub. */
  private[graft] def wavFixture(payload: Array[Byte]): Array[Byte] = {
    val pcm = new Array[Byte](payload.length * 2)
    var i = 0
    while (i < payload.length) {
      val s = ((payload(i) & 0xff) - 128) * 256
      pcm(2 * i) = (s & 0xff).toByte // little-endian lo
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(AudioRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, payload.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode + windowed energy over the decoded samples:
    * AudioSystem parses the actual WAV header (sample rate, channel
    * count, frame length all read from the file, not assumed), the
    * 16-bit PCM frames decode to samples, and each full 16-sample
    * window reports its exact integer energy Σ s². The decoded samples
    * are what's analyzed — a codec round trip, not arithmetic on the
    * input. Payload bytes that fail to parse as WAV fall back to the
    * synthesis arithmetic (the honest stub seam, as with images).
    *
    * Scale: narrow batched mapPartitions like every stage here; output
    * ≈ samples/16 rows, no shuffle. */
  def audioEnergy(media: Dataset[MediaRecord]): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "audio").mapPartitions { it =>
      inBatches(it) { batch =>
        batch.iterator.flatMap { m =>
          val (rate, samples) =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(wavFixture(m.payload)))
              val fmt = ais.getFormat
              val n = ais.getFrameLength.toInt
              val raw = ais.readAllBytes()
              val ss = new Array[Long](n)
              var i = 0
              while (i < n) {
                val lo = raw(2 * i) & 0xff
                val hi = raw(2 * i + 1) // sign byte (little-endian 16-bit)
                ss(i) = (hi.toLong << 8) | lo
                i += 1
              }
              (fmt.getSampleRate.toLong, ss)
            } catch {
              case _: Exception => // undecodable → stub synthesis math
                (AudioRate.toLong,
                  m.payload.map(b => (((b & 0xff) - 128) * 256).toLong))
            }
          (0 until samples.length / AudioWindowSamples).iterator.map { w =>
            var sq = 0L
            var i = w * AudioWindowSamples
            val end = i + AudioWindowSamples
            while (i < end) { sq += samples(i) * samples(i); i += 1 }
            AudioWindow(m.doc_id, rate, samples.length.toLong, w.toLong, sq)
          }
        }
      }
    }
  }

  /** Windowed audio energy over the media table's audio rows. */
  def audioEnergyMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioEnergy(mediaTable(spark, dir)).toDF()
  }

  /** VAD energy gate: ≈ the fixture corpus's median window energy, so
    * voiced/silent actually splits the data. */
  private[graft] val VadThreshold = 2200000000L
  /** Shortest run of consecutive voiced windows that counts as speech. */
  private[graft] val VadMinWindows = 2L

  /** Voice-activity segmentation over the decoded audio — the energy
    * windows of [[audioEnergy]] gated at [[VadThreshold]], stitched
    * into runs of consecutive window indices (gaps-and-islands:
    * window_idx − row_number is constant within a run), runs shorter
    * than [[VadMinWindows]] discarded, and a per-clip segment report
    * (count, voiced windows, longest run, first start). This is the
    * speech-detection pass an audio-corpus pipeline runs before
    * transcription — clips with no speech never reach the expensive
    * model.
    *
    * Scale shape: the decode stage is the narrow batched map (zero
    * shuffle, output ≈ samples/16 rows); the islands window and both
    * aggregates all hash on doc_id — ONE exchange reused by all three
    * (Catalyst collapses the matching partitionings), and every group
    * is one clip's windows, bounded by clip length, never corpus-sized. */
  def audioVad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("window_idx"))
    audioEnergyMeta(spark, dir)
      .filter(col("sum_sq") >= VadThreshold)
      .select(col("doc_id"), col("window_idx"))
      .withColumn("grp", col("window_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("n_windows"), min(col("window_idx")).as("seg_start"))
      .filter(col("n_windows") >= VadMinWindows)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("n_windows")).as("voiced_windows"),
        max(col("n_windows")).as("longest_segment"),
        min(col("seg_start")).as("first_segment_start"))
  }

  /** Real feature extraction: byte-class histogram over raw payloads. */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      inBatches(it)(_.iterator.map { m =>
        var a = 0L; var d = 0L; var s = 0L; var o = 0L
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xff
          if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) a += 1
          else if (b >= '0' && b <= '9') d += 1
          else if (b == ' ') s += 1
          else o += 1
          i += 1
        }
        MediaFeatures(m.doc_id, a, d, s, o)
      })
    }
  }

  /** Resized media record: payload downsampled, original dims kept. */
  final case class ResizedMedia(doc_id: Long, media_type: String,
      orig_bytes: Long, resized_bytes: Long, checksum: Long)

  val ResizeFactor = 4

  /** Resize: deterministic 1-in-ResizeFactor byte downsample — the
    * stand-in for an image/audio resample (a real codec changes ONLY
    * the per-record byte transform; the batched partition-parallel
    * plumbing and the byte-length accounting are what the engine
    * owns). Emits a checksum of the resized payload so the transform
    * is actually exercised, not just planned. */
  def resize(media: Dataset[MediaRecord]): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      inBatches(it)(_.iterator.map { m =>
        val out = new Array[Byte]((m.payload.length + ResizeFactor - 1) / ResizeFactor)
        var i = 0
        while (i < out.length) {
          out(i) = m.payload(i * ResizeFactor)
          i += 1
        }
        var sum = 0L
        var j = 0
        while (j < out.length) { sum = (sum * 31 + (out(j) & 0xff)) % 2147483647L; j += 1 }
        ResizedMedia(m.doc_id, m.media_type, m.payload.length.toLong,
          out.length.toLong, sum)
      })
    }
  }

  /** Frame sampling: every FrameStride-th FrameBytes-chunk of the
    * payload, with its offset and true length — pure column arithmetic
    * (no decode needed to plan which byte ranges to fetch; on object
    * storage this becomes ranged reads). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"))
      .filter(col("n_bytes") > 0) // empty payload → no frames (div truncates
      // toward zero, so (0-1) div 64 = 0 would fabricate one)
      .select(col("doc_id"), col("n_bytes"),
        posexplode(sequence(lit(0L),
          expr(s"(n_bytes - 1) div $FrameBytes"), lit(FrameStride.toLong))))
      .select(col("doc_id"), col("col").as("frame_no"),
        (col("col") * FrameBytes).as("byte_offset"),
        least(lit(FrameBytes.toLong), col("n_bytes") - col("col") * FrameBytes).as("frame_len"))

  /** Perceptual-hash geometry: 60 bits (4 pigeonhole blocks × 15 —
    * staying under the BIGINT sign bit in both engines, like
    * SimHash31) over the first 60 resized bytes. */
  val PhashBits = 60
  private val PhashBlocks = 4
  private val PhashBlockBits = 15

  /** Average-hash (aHash) over the decoded-and-resized payload: bit i
    * set when resized byte i exceeds the mean of the considered bytes —
    * the classic perceptual image fingerprint (resize → threshold
    * against the mean), computed on the same downsample [[resize]]
    * ships. A real deployment hashes actual decoded pixels; the
    * byte-level arithmetic and everything downstream are unchanged. */
  private def aHash(payload: Array[Byte]): Long = {
    val n = math.min(PhashBits,
      (payload.length + ResizeFactor - 1) / ResizeFactor)
    if (n == 0) return 0L
    var sum = 0L
    var i = 0
    while (i < n) { sum += payload(i * ResizeFactor) & 0xffL; i += 1 }
    val mean = sum / n
    var h = 0L
    i = 0
    while (i < n) {
      if ((payload(i * ResizeFactor) & 0xffL) > mean) h |= 1L << i
      i += 1
    }
    h
  }

  final case class PHashed(doc_id: Long, phash: Long)

  /** Near-duplicate media pairs by perceptual hash: Hamming(aHash) ≤ 3
    * via the pigeonhole block join (same discipline as the SimHash text
    * dedup — 3 differing bits cannot touch all 4 blocks, so every true
    * pair shares at least one exact 15-bit block). Scale shape: the
    * hash is a narrow batched map (zero shuffle), candidates come from
    * an equi-join on (block, key) — never an all-pairs comparison —
    * and the exact Hamming check runs only on block-collided pairs. */
  def phashNearDups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = mediaTable(spark, dir).mapPartitions { it =>
      inBatches(it)(_.iterator.map(m => PHashed(m.doc_id, aHash(m.payload))))
    }.toDF()
      .localCheckpoint() // both join sides read this narrow (id, hash) frame
    val blocks = hashed.select(col("doc_id"), col("phash"),
      explode(sequence(lit(0), lit(PhashBlocks - 1))).as("blk"))
      .select(col("doc_id"), col("phash"), col("blk"),
        expr(s"shiftright(phash, CAST(blk * $PhashBlockBits AS INT))")
          .bitwiseAND(lit((1L << PhashBlockBits) - 1)).as("key"))
    val a = blocks.select(col("blk"), col("key"),
      col("doc_id").as("doc_a"), col("phash").as("pa"))
    val b = blocks.select(col("blk"), col("key"),
      col("doc_id").as("doc_b"), col("phash").as("pb"))
    a.join(b, Seq("blk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "pa", "pb").distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(pa ^ pb)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
  }

  // -------------------------------------------------------------- queries

  def decodeMeta(spark: SparkSession, dir: String): DataFrame =
    decode(mediaTable(spark, dir)).toDF()

  def featureHistogram(spark: SparkSession, dir: String): DataFrame =
    features(mediaTable(spark, dir)).toDF()

  def resizeMeta(spark: SparkSession, dir: String): DataFrame =
    resize(mediaTable(spark, dir)).toDF()

  /** Per-frame video decode over the media table's video rows — the
    * oracle hashes the decoded facts whose plan it can replay (frame
    * count, dims); mean_luma is the lossy-codec round trip, asserted in
    * MultimodalSpec instead. */
  def videoFrameMeta(spark: SparkSession, dir: String): DataFrame =
    videoFrames(mediaTable(spark, dir)).toDF()
      .select("doc_id", "frame_no", "width", "height")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_energy" -> ((s, d) => audioEnergyMeta(s, d)),
    "mm_audio_vad" -> ((s, d) => audioVad(s, d)),
    "mm_phash_neardups" -> ((s, d) => phashNearDups(s, d)),
    "mm_resize" -> ((s, d) => resizeMeta(s, d)),
    "mm_decode_meta" -> ((s, d) => decodeMeta(s, d)),
    "mm_feature_histogram" -> ((s, d) => featureHistogram(s, d)),
    "mm_video_frames" -> ((s, d) => videoFrameMeta(s, d)),
    "mm_frame_sample" -> ((s, d) => frameSample(s, d)))

  /** Oracle validity domain: these SQL replicas compare per-CHARACTER
    * arithmetic (ascii()/regexp over text) against the engine's
    * per-BYTE arithmetic over the UTF-8 payload — equivalent only for
    * ASCII corpora (which the testdata is, verified). The engine's
    * byte semantics are the correct ones for a media pipeline. */
  val oracle: Map[String, String] = Map(
    // replays the PCM synthesis (sample = (byte − 128)·256) and the
    // 16-sample window energy; the engine's values additionally round-
    // trip through a real WAV encode/decode, which must be lossless
    "mm_audio_energy" ->
      s"""WITH a AS (SELECT doc_id, list_transform(string_split(text, ''),
         |      c -> (ascii(c) - 128) * 256) AS s
         |  FROM documents WHERE doc_id % 3 = 1),
         |w AS (SELECT doc_id, len(s)::BIGINT AS n_samples,
         |    (u.i - 1) // $AudioWindowSamples AS window_idx,
         |    s[u.i::INT] AS v
         |  FROM a, UNNEST(range(1, len(s) + 1)) AS u(i))
         |SELECT doc_id, ${AudioRate.toLong} AS sample_rate, n_samples,
         |  window_idx::BIGINT AS window_idx, sum(v * v)::BIGINT AS sum_sq
         |FROM w GROUP BY 1, 2, 3, 4 HAVING count(*) = $AudioWindowSamples
         |ORDER BY doc_id, window_idx""".stripMargin,
    // the energy oracle's windows, gated and stitched into islands
    // (window_idx − row_number constant per run) exactly as the engine
    "mm_audio_vad" ->
      s"""WITH a AS (SELECT doc_id, list_transform(string_split(text, ''),
         |      c -> (ascii(c) - 128) * 256) AS s
         |  FROM documents WHERE doc_id % 3 = 1),
         |w AS (SELECT doc_id,
         |    (u.i - 1) // $AudioWindowSamples AS window_idx,
         |    s[u.i::INT] AS v
         |  FROM a, UNNEST(range(1, len(s) + 1)) AS u(i)),
         |en AS (SELECT doc_id, window_idx::BIGINT AS window_idx,
         |    sum(v * v)::BIGINT AS sum_sq
         |  FROM w GROUP BY 1, 2 HAVING count(*) = $AudioWindowSamples),
         |vc AS (SELECT doc_id, window_idx,
         |    window_idx - row_number() OVER (PARTITION BY doc_id
         |      ORDER BY window_idx) AS grp
         |  FROM en WHERE sum_sq >= $VadThreshold),
         |seg AS (SELECT doc_id, grp, count(*)::BIGINT AS n_windows,
         |    min(window_idx)::BIGINT AS seg_start
         |  FROM vc GROUP BY 1, 2 HAVING count(*) >= $VadMinWindows)
         |SELECT doc_id, count(*)::BIGINT AS n_segments,
         |  sum(n_windows)::BIGINT AS voiced_windows,
         |  max(n_windows)::BIGINT AS longest_segment,
         |  min(seg_start)::BIGINT AS first_segment_start
         |FROM seg GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // replays aHash (downsample → mean threshold → 60 bits) and the
    // pigeonhole block join in list algebra
    "mm_phash_neardups" ->
      s"""WITH rs AS (SELECT doc_id,
         |    list_transform(range(0, least($PhashBits, (octet_length(encode(text)) + ${ResizeFactor - 1}) // $ResizeFactor)),
         |      i -> ascii(substr(text, (i * $ResizeFactor + 1)::INT, 1))::BIGINT) AS rb
         |  FROM documents),
         |m AS (SELECT doc_id, rb,
         |    list_reduce(list_prepend(0::BIGINT, rb), (a, b) -> a + b)
         |      // greatest(len(rb), 1) AS mean FROM rs),
         |h AS (SELECT doc_id,
         |    list_reduce(list_prepend(0::BIGINT, list_transform(range(0, len(rb)),
         |      i -> CASE WHEN rb[(i + 1)::INT] > mean
         |           THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END)),
         |      (a, b) -> a + b) AS phash
         |  FROM m),
         |bk AS (SELECT doc_id, phash, blk,
         |    (phash >> (blk * $PhashBlockBits)::INT) & ${(1L << PhashBlockBits) - 1} AS key
         |  FROM (SELECT doc_id, phash, unnest(range(0, $PhashBlocks)) AS blk FROM h)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.phash AS pa, b.phash AS pb
         |  FROM bk a JOIN bk b ON a.blk = b.blk AND a.key = b.key
         |    AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, bit_count(xor(pa, pb))::BIGINT AS hamming
         |FROM cand WHERE bit_count(xor(pa, pb)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    // replays the byte downsample: every ResizeFactor-th char, rolled
    // into the same 31-ary checksum
    "mm_resize" ->
      s"""SELECT doc_id,
         |  (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS media_type,
         |  octet_length(encode(text))::BIGINT AS orig_bytes,
         |  ((octet_length(encode(text)) + ${ResizeFactor - 1}) // $ResizeFactor)::BIGINT AS resized_bytes,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(range(0, (octet_length(encode(text)) + ${ResizeFactor - 1}) // $ResizeFactor),
         |      i -> ascii(substr(text, (i * $ResizeFactor + 1)::INT, 1))::BIGINT)),
         |    (a, c) -> (a * 31 + c) % 2147483647) AS checksum
         |FROM documents ORDER BY doc_id""".stripMargin,
    // replays the stub codec arithmetic over the first two bytes
    "mm_decode_meta" ->
      """SELECT doc_id,
        |  (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS media_type,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  16 + ascii(substr(text, 1, 1)) % 64 AS width,
        |  16 + ascii(substr(text, 2, 1)) % 64 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_feature_histogram" ->
      """SELECT doc_id,
        |  length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT AS n_alpha,
        |  length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
        |  length(regexp_replace(text, '[^ ]', '', 'g'))::BIGINT AS n_space,
        |  (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::BIGINT AS n_other
        |FROM documents ORDER BY doc_id""".stripMargin,
    // replays the fixture PLAN (frame count and dims the AVI was encoded
    // with); the engine's values are decoded facts from the real demux +
    // JPEG codec, which must agree with the plan exactly
    "mm_video_frames" ->
      """SELECT doc_id, u.f::BIGINT AS frame_no,
        |  16 + ascii(substr(text, 1, 1)) % 64 AS width,
        |  16 + ascii(substr(text, 2, 1)) % 64 AS height
        |FROM documents,
        |  UNNEST(range(0, 1 + octet_length(encode(text)) % 4)) AS u(f)
        |WHERE doc_id % 3 = 2
        |ORDER BY doc_id, frame_no""".stripMargin,
    "mm_frame_sample" ->
      s"""SELECT doc_id, frame_no, frame_no * $FrameBytes AS byte_offset,
         |  least($FrameBytes, n_bytes - frame_no * $FrameBytes)::BIGINT AS frame_len
         |FROM (SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
         |        unnest(range(0, (octet_length(encode(text)) - 1) // $FrameBytes + 1,
         |        $FrameStride)) AS frame_no
         |      FROM documents WHERE octet_length(encode(text)) > 0)
         |ORDER BY doc_id, frame_no""".stripMargin)
}
