package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries opaque binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf0001)
    val r = m.toDF()
    assert(r.schema("payload").dataType.typeName == "binary")
    val first = m.filter(col("doc_id") === 0L).head()
    assert(first.payload.length == first.meta.n_bytes)
    assert(Set("image", "audio", "video").contains(first.media_type))
  }

  test("batched decode emits one header per record, bounded dims") {
    val media = Multimodal.mediaTable(spark, sf0001)
    val dec = Multimodal.decode(media).collect()
    assert(dec.length == media.count())
    dec.foreach { d =>
      assert(d.width >= 16 && d.width < 80)
      assert(d.height >= 16 && d.height < 80)
    }
  }

  test("image rows decode through a REAL ImageIO codec: dims and pixels from the bitmap") {
    // the fixture is a genuine BMP: ImageIO must parse it, report the
    // encoded dims from the header, and round-trip the pixel bytes
    val payload = "the quick brown fox".getBytes("UTF-8")
    val bmp = Multimodal.bmpFixture(payload)
    // BMP magic: a decoder, not arithmetic, has to get past this
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "ImageIO failed to decode the fixture")
    assert(img.getWidth == 16 + (payload(0) & 0xff) % 64)
    assert(img.getHeight == 16 + (payload(1) & 0xff) % 64)
    // pixels = payload bytes cycled row-major: decoded raster must match
    var i = 0
    (0 until img.getHeight).foreach { y =>
      (0 until img.getWidth).foreach { x =>
        assert(img.getRaster.getSample(x, y, 0) == (payload(i % payload.length) & 0xff))
        i += 1
      }
    }
    // and the Dataset-level decode agrees with a direct ImageIO read
    val media = Multimodal.mediaTable(spark, sf0001)
    val imgRows = Multimodal.decode(media.filter(col("media_type") === "image"))
      .collect()
    assert(imgRows.nonEmpty)
    val payloads = media.filter(col("media_type") === "image")
      .collect().map(m => m.doc_id -> m.payload).toMap
    imgRows.take(25).foreach { d =>
      val direct = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.bmpFixture(payloads(d.doc_id))))
      assert(d.width == direct.getWidth && d.height == direct.getHeight)
    }
  }

  test("feature histogram partitions every byte into exactly one class") {
    val media = Multimodal.mediaTable(spark, sf0001)
    val sizes = media.toDF().select(col("doc_id"), col("meta.n_bytes").as("n"))
    val feats = Multimodal.features(media).toDF()
    val bad = feats.join(sizes, "doc_id")
      .filter(col("n_alpha") + col("n_digit") + col("n_space") + col("n_other") =!= col("n"))
      .count()
    assert(bad == 0)
  }

  test("phash near-dups: pigeonhole join finds every Hamming<=3 pair the naive scan finds") {
    import org.apache.spark.sql.functions._
    val got = Multimodal.phashNearDups(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, h) => assert(a < b && h >= 0 && h <= 3) }
    // no duplicates despite multi-block collisions
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
    // completeness: a driver-side all-pairs scan over the same hashes
    // (test scale only — the banned shape the block join replaces)
    val media = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val payload = r.getString(1).getBytes("UTF-8")
        val n = math.min(60, (payload.length + 3) / 4)
        val bytes = (0 until n).map(i => payload(i * 4) & 0xffL)
        val mean = if (n == 0) 0L else bytes.sum / n
        val h = (0 until n).foldLeft(0L)((acc, i) =>
          if (bytes(i) > mean) acc | (1L << i) else acc)
        r.getLong(0) -> h
      }
    val naive = for {
      (a, ha) <- media; (b, hb) <- media
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb).toLong)
    assert(got.toSet == naive.toSet, s"got ${got.length}, naive ${naive.length}")
  }

  test("frame sample covers the payload at the configured stride") {
    val fs = Multimodal.frameSample(spark, sf0001)
    val r = fs.filter(col("doc_id") === 0L).collect()
    assert(r.nonEmpty)
    assert(r.head.getAs[Long]("frame_no") == 0L)
    r.foreach { row =>
      val len = row.getAs[Long]("frame_len")
      assert(len > 0 && len <= Multimodal.FrameBytes)
      assert(row.getAs[Long]("frame_no") % Multimodal.FrameStride == 0)
      assert(row.getAs[Long]("byte_offset") ==
        row.getAs[Long]("frame_no") * Multimodal.FrameBytes)
    }
  }

  test("audio rows decode through a REAL WAV codec: header facts and lossless PCM") {
    import spark.implicits._
    // a payload with known bytes: samples (b-128)*256, windows of 16
    val payload = (0 until 40).map(i => (i * 7 % 256).toByte).toArray
    val rec = Multimodal.MediaRecord(1L, "audio", payload,
      Multimodal.MediaMeta("t", payload.length.toLong))
    val got = Multimodal.audioEnergy(Seq(rec).toDS()).collect().sortBy(_.window_idx)
    // 40 samples → 2 full 16-sample windows, the 8-sample tail dropped
    assert(got.length == 2)
    got.foreach { w =>
      assert(w.sample_rate == 8000L, "sample rate must come from the decoded header")
      assert(w.n_samples == 40L, "frame length must come from the decoded header")
    }
    def sq(from: Int): Long = (from until from + 16)
      .map(i => ((payload(i) & 0xff) - 128).toLong * 256)
      .map(s => s * s).sum
    assert(got(0).sum_sq == sq(0) && got(1).sum_sq == sq(16),
      "decoded PCM must be bit-identical to the synthesized samples")
    // the WAV fixture is a real RIFF file
    val wav = Multimodal.wavFixture(payload)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("video rows decode through a REAL AVI demux + JPEG codec") {
    import spark.implicits._
    val payload = (0 until 37).map(i => (i * 11 % 256).toByte).toArray
    // the fixture is a real RIFF/AVI container
    val avi = Multimodal.aviFixture(payload)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    // the demux walks the container structure, not fixture arithmetic:
    // every extracted chunk is an independently decodable JPEG
    val frames = Multimodal.demuxAvi(avi)
    assert(frames.length == Multimodal.videoFrameCount(payload.length.toLong))
    frames.foreach { jpeg =>
      assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8, "JPEG SOI")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      assert(img != null && img.getWidth > 0)
    }
    // non-AVI bytes must be rejected by the demux, not mis-parsed
    intercept[IllegalArgumentException] {
      Multimodal.demuxAvi("definitely not an avi container".getBytes)
    }

    val rec = Multimodal.MediaRecord(2L, "video", payload,
      Multimodal.MediaMeta("t", payload.length.toLong))
    val got = Multimodal.videoFrames(Seq(rec).toDS()).collect().sortBy(_.frame_no)
    assert(got.length == frames.length)
    got.foreach { f =>
      // dims are decoded facts that must agree with the encode plan
      assert(f.width == 16 + (payload(0) & 0xff) % 64)
      assert(f.height == 16 + (payload(1) & 0xff) % 64)
      // the lossy round trip: decoded mean luma within JPEG tolerance
      // of the constant the frame was encoded at
      val encoded = (payload(f.frame_no.toInt % payload.length) & 0xff).toLong
      assert(math.abs(f.mean_luma - encoded) <= 2L,
        s"frame ${f.frame_no}: decoded mean ${f.mean_luma}, encoded $encoded")
    }
  }
}
