package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic media schema + batch image feature extraction") {
    val media = Multimodal.syntheticMedia(spark, 100).toDF().repartition(4)
    assert(media.schema.fieldNames.toSet ==
      Set("media_id", "kind", "data", "width", "height", "duration_ms"))
    val feats = Multimodal.decodeImageFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 100)
    rows.foreach { f =>
      assert(f.channels == 3)
      assert(f.feature.length == 8)
      assert(f.width >= 32 && f.height >= 32)
    }
    // deterministic: re-run produces identical features
    val again = Multimodal.decodeImageFeatures(media).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("real ImageIO decode reads a hand-built PNG's actual pixels") {
    // 2x3 image with hand-picked pixels, encoded by the JDK PNG writer:
    // the decode path must recover EXACT per-channel sums and dimensions
    val px = Array(
      (255, 0, 0), (0, 255, 0),
      (0, 0, 255), (10, 20, 30),
      (200, 100, 50), (1, 2, 3))
    val img = new java.awt.image.BufferedImage(
      2, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    px.zipWithIndex.foreach { case ((r, g, b), i) =>
      img.setRGB(i % 2, i / 2, (r << 16) | (g << 8) | b) }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    import spark.implicits._
    val media = Seq((7L, bos.toByteArray)).toDF("media_id", "data")
    val st = Multimodal.decodePixelStats(media).collect().head
    assert(st.format == "png" && st.width == 2 && st.height == 3)
    assert(st.channels == 3 && st.n_pixels == 6)
    assert(st.sum_r == px.map(_._1).sum)
    assert(st.sum_g == px.map(_._2).sum)
    assert(st.sum_b == px.map(_._3).sum)
    // the feature path decodes the same pixels: mean channels match
    val f = Multimodal.decodeImageFeatures(media).collect().head
    assert(f.width == 2 && f.height == 3 && f.channels == 3)
    assert(math.abs(f.feature(0) - px.map(_._1).sum / 6f / 255f) < 1e-6)
    assert(math.abs(f.feature(1) - px.map(_._2).sum / 6f / 255f) < 1e-6)
    assert(math.abs(f.feature(2) - px.map(_._3).sum / 6f / 255f) < 1e-6)
    // luma histogram bins are fractions summing to 1
    assert(math.abs(f.feature.drop(4).sum - 1f) < 1e-6)
    // undecodable bytes survive as unknown, never a crash
    val bad = Seq((8L, Array[Byte](1, 2, 3, 4, 5))).toDF("media_id", "data")
    assert(Multimodal.decodePixelStats(bad).collect().head.format == "unknown")
  }

  test("formula-pixel media round-trips: encode (png+bmp) -> decode -> sums") {
    val stats = Multimodal.decodePixelStats(
      Multimodal.syntheticPixelMedia(spark, 24).toDF()).collect()
    assert(stats.length == 24)
    stats.foreach { st =>
      val i = st.media_id
      val w = 8 + (i % 5).toInt * 4; val h = 8 + (i % 3).toInt * 4
      assert(st.format == (if (i % 4 == 3) "bmp" else "png"), s"img $i")
      assert(st.width == w && st.height == h && st.channels == 3, s"img $i")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (i * 7 + x * 3 + y * 5) % 256
        sg += (i * 11 + x + y * 2) % 256
        sb += (i * 13 + x * 3 + y) % 256
      }
      assert(st.sum_r == sr && st.sum_g == sg && st.sum_b == sb, s"img $i")
    }
  }

  test("video frame sampling emits 1->N rows at the requested fps") {
    val media = Multimodal.syntheticMedia(spark, 20, kind = "video").toDF()
    val frames = Multimodal.sampleFrames(media, fps = 2.0).cache()
    val perVideo = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // duration 1000 + (i%10)*500 ms at 2 fps (every 500 ms)
    (0 until 20).foreach { i =>
      val dur = 1000 + (i % 10) * 500
      assert(perVideo(i.toLong) == math.ceil(dur / 500.0).toLong)
    }
    assert(frames.filter(col("frame_idx") === 0).count() == 20)
    frames.unpersist()
  }

  test("mediaStats aggregates header metadata without shuffling blobs") {
    val media = Multimodal.syntheticMedia(spark, 50).toDF()
    val r = Multimodal.mediaStats(media).head()
    assert(r.getAs[String]("kind") == "image")
    assert(r.getAs[Long]("n") == 50)
    assert(r.getAs[Long]("total_bytes") == 50L * 80)
  }

  test("probeImage parses PNG/GIF/BMP/JPEG headers from raw bytes") {
    import java.nio.{ByteBuffer, ByteOrder}
    // PNG: signature + IHDR(len, type, w=640, h=480)
    val png = ByteBuffer.allocate(26)
      .putInt(0x89504e47).putInt(0x0d0a1a0a)
      .putInt(13).put("IHDR".getBytes).putInt(640).putInt(480)
      .array()
    assert(Multimodal.probeImage(png).contains(("png", 640, 480)))
    // GIF89a: w=320, h=200 little-endian
    val gif = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
      .put("GIF89a".getBytes).putShort(320.toShort).putShort(200.toShort)
      .array()
    assert(Multimodal.probeImage(gif).contains(("gif", 320, 200)))
    // BMP: "BM" + 12 filler, BITMAPINFOHEADER(40) w=123 h=-77 (top-down)
    val bmp = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
      .put('B'.toByte).put('M'.toByte).put(new Array[Byte](12))
      .putInt(40).putInt(123).putInt(-77)
      .array()
    assert(Multimodal.probeImage(bmp).contains(("bmp", 123, 77)))
    // JPEG: SOI, APP0 (skipped), SOF0 with height=600 width=800
    val jpg = ByteBuffer.allocate(2 + 18 + 12)
      .putShort(0xffd8.toShort)
      .putShort(0xffe0.toShort).putShort(16).put(new Array[Byte](14))
      .putShort(0xffc0.toShort).putShort(17).put(8.toByte)
      .putShort(600.toShort).putShort(800.toShort)
      .array()
    assert(Multimodal.probeImage(jpg).contains(("jpeg", 800, 600)))
    // junk bytes -> None, never a crash
    assert(Multimodal.probeImage(Array.fill[Byte](40)(7)).isEmpty)
    assert(Multimodal.probeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.probeImage(null).isEmpty)
  }

  test("imageMetadata maps the prober over a binary column (unknowns survive)") {
    import spark.implicits._
    val png = java.nio.ByteBuffer.allocate(26)
      .putInt(0x89504e47).putInt(0x0d0a1a0a)
      .putInt(13).put("IHDR".getBytes).putInt(64).putInt(32).array()
    val df = Seq((1L, png), (2L, Array.fill[Byte](20)(3)))
      .toDF("media_id", "data")
    val metas = Multimodal.imageMetadata(df).collect()
      .map(m => m.media_id -> ((m.format, m.width, m.height))).toMap
    assert(metas(1L) == (("png", 64, 32)))
    assert(metas(2L) == (("unknown", 0, 0)))
  }

  test("probeAudio parses WAV/FLAC/MP3 headers from raw bytes") {
    import java.nio.{ByteBuffer, ByteOrder}
    // WAV: RIFF/WAVE, fmt_ (stereo 44.1kHz 16-bit), data chunk of exactly
    // one second at the declared byte rate
    val wav = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(36 + 176400).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(176400)
      .putShort(4).putShort(16)
      .put("data".getBytes).putInt(176400)
      .array()
    assert(Multimodal.probeAudio(wav).contains(("wav", 2, 44100, 16, 1000L)))
    // FLAC: STREAMINFO with rate=48000, stereo, 16-bit, 480000 samples (10s)
    val flac = ByteBuffer.allocate(42)
      .put("fLaC".getBytes)
      .put(0.toByte).put(0.toByte).put(0.toByte).put(34.toByte) // block hdr
      .put(new Array[Byte](10))                                 // block/frame sizes
      .put(0x0b.toByte).put(0xb8.toByte).put(0x02.toByte)       // rate|ch|bits
      .put(0xf0.toByte)                                         // bits|samples hi
      .putInt(480000)                                           // samples lo 32
      .array()
    assert(Multimodal.probeAudio(flac).contains(("flac", 2, 48000, 16, 10000L)))
    // MP3: empty ID3v2 tag, then an MPEG-1 Layer III frame header at
    // 128 kbps / 44.1 kHz stereo; 1600 payload bytes -> 100 ms estimate
    val mp3 = ByteBuffer.allocate(1610)
      .put("ID3".getBytes).put(new Array[Byte](7)) // ver+flags+syncsafe size 0
      .put(0xff.toByte).put(0xfb.toByte).put(0x90.toByte).put(0x00.toByte)
      .array()
    assert(Multimodal.probeAudio(mp3).contains(("mp3", 2, 44100, 0, 100L)))
    // junk / truncated -> None, never a crash
    assert(Multimodal.probeAudio(Array.fill[Byte](40)(7)).isEmpty)
    assert(Multimodal.probeAudio("RIFFxxxxWAVE".getBytes).isEmpty) // no fmt_
    assert(Multimodal.probeAudio(Array.empty[Byte]).isEmpty)
    assert(Multimodal.probeAudio(null).isEmpty)
    // corrupt chunk size 0xFFFFFFF8: must neither spin nor walk backwards
    val badWav = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
      .put("junk".getBytes).putInt(0xfffffff8)
      .array()
    assert(Multimodal.probeAudio(badWav).isEmpty)
    // corrupt fmt sample rate 0xFFFFFFFF: unparseable, not a negative rate
    val badRate = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(2).putInt(0xffffffff).putInt(176400)
      .putShort(4).putShort(16)
      .put("data".getBytes).putInt(0)
      .array()
    assert(Multimodal.probeAudio(badRate).isEmpty)
    // ID3v2.4 footer flag (0x10): the 10-byte trailing footer is part of
    // the tag size and must be skipped before the frame header
    val footered = ByteBuffer.allocate(10 + 10 + 4 + 1586)
      .put("ID3".getBytes).put(4.toByte).put(0.toByte).put(0x10.toByte)
      .put(new Array[Byte](3)).put(10.toByte) // syncsafe size 10 = footer
      .put(new Array[Byte](10 + 10))          // tag body + footer
      .array()
    // place the frame header right after tag(10) + body(10) + footer(10)
    footered(30) = 0xff.toByte; footered(31) = 0xfb.toByte
    footered(32) = 0x90.toByte; footered(33) = 0x00.toByte
    assert(Multimodal.probeAudio(footered).exists(_._1 == "mp3"))
  }

  test("audioMetadata maps the prober over a binary column (unknowns survive)") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    val wav = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000)
      .putShort(2).putShort(16)
      .put("data".getBytes).putInt(64000)
      .array()
    val df = Seq((1L, wav), (2L, Array.fill[Byte](20)(3)))
      .toDF("media_id", "data")
    val metas = Multimodal.audioMetadata(df).collect()
      .map(m => m.media_id ->
        ((m.format, m.channels, m.sample_rate, m.bits_per_sample, m.duration_ms))).toMap
    assert(metas(1L) == (("wav", 1, 16000, 16, 2000L)))
    assert(metas(2L) == (("unknown", 0, 0, 0, 0L)))
  }

  test("probeVideo parses MP4 box trees and Matroska EBML headers") {
    import java.nio.ByteBuffer
    // minimal-but-consistent MP4: ftyp(isom) + moov[ mvhd(v0, timescale
    // 1000, duration 5000) + trak[ tkhd(v0, 640x360 in 16.16) ] ]
    val mp4 = {
      val b = ByteBuffer.allocate(152) // big-endian by default
      b.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      b.putInt(136).put("moov".getBytes)
      b.putInt(28).put("mvhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(5000)
      b.putInt(100).put("trak".getBytes)
      b.putInt(92).put("tkhd".getBytes).put(new Array[Byte](76))
        .putInt(640 << 16).putInt(360 << 16)
      b.array()
    }
    assert(Multimodal.probeVideo(mp4).contains(("mp4/isom", 640, 360, 5000L)))
    // moov-less MP4 still identifies by brand; dims/duration stay 0
    val bare = ByteBuffer.allocate(16)
      .putInt(16).put("ftyp".getBytes).put("mp42".getBytes).putInt(0).array()
    assert(Multimodal.probeVideo(bare).contains(("mp4/mp42", 0, 0, 0L)))
    // EBML header with DocType "webm"
    val webm = Array[Int](0x1a, 0x45, 0xdf, 0xa3, 0x87,
      0x42, 0x82, 0x84, 'w', 'e', 'b', 'm').map(_.toByte)
    assert(Multimodal.probeVideo(webm).contains(("webm", 0, 0, 0L)))
    // DocType-less EBML falls back to the spec default
    val mkv = Array[Int](0x1a, 0x45, 0xdf, 0xa3, 0x84,
      0x42, 0x86, 0x81, 0x01, 0, 0, 0).map(_.toByte) // padded past min length
    assert(Multimodal.probeVideo(mkv).contains(("matroska", 0, 0, 0L)))
    // junk / truncated -> None, never a crash
    assert(Multimodal.probeVideo(Array.fill[Byte](40)(7)).isEmpty)
    assert(Multimodal.probeVideo(Array[Byte](0, 1)).isEmpty)
  }

  test("probeVideo survives adversarial bytes (fuzz + truncated-box edges)") {
    import java.nio.ByteBuffer
    // truncated mvhd v1 at the exact end of the buffer: 24-byte payload
    // advertises version 1 (which needs 32) — must parse nothing, not read
    // past the array
    val truncV1 = {
      val b = ByteBuffer.allocate(56)
      b.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      b.putInt(40).put("moov".getBytes)
      b.putInt(32).put("mvhd".getBytes)
        .put(1.toByte).put(new Array[Byte](23)) // v1, then too-short payload
      b.array()
    }
    assert(Multimodal.probeVideo(truncV1).contains(("mp4/isom", 0, 0, 0L)))
    // EBML element whose declared size escapes the buffer / wraps an Int
    val hugeEbml = Array[Int](0x1a, 0x45, 0xdf, 0xa3, 0x8a,
      0x42, 0x82, 0x01, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    assert(Multimodal.probeVideo(hugeEbml).isDefined) // default doctype, no spin
    // randomized fuzz over both magic paths: never throws, whatever comes back
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val a = Array.fill[Byte](12 + rnd.nextInt(52))(rnd.nextInt(256).toByte)
      Multimodal.probeVideo(a)
      val mp4 = a.clone(); "ftyp".getBytes.copyToArray(mp4, 4)
      Multimodal.probeVideo(mp4)
      val ebml = a.clone()
      Array[Int](0x1a, 0x45, 0xdf, 0xa3).map(_.toByte).copyToArray(ebml, 0)
      Multimodal.probeVideo(ebml)
    }
  }

  test("videoMetadata maps the prober over a binary column (unknowns survive)") {
    import spark.implicits._
    import java.nio.ByteBuffer
    val bare = ByteBuffer.allocate(16)
      .putInt(16).put("ftyp".getBytes).put("avc1".getBytes).putInt(0).array()
    val df = Seq((1L, bare), (2L, Array.fill[Byte](20)(3)))
      .toDF("media_id", "data")
    val metas = Multimodal.videoMetadata(df).collect()
      .map(m => m.media_id -> ((m.format, m.width, m.height, m.duration_ms))).toMap
    assert(metas(1L) == (("mp4/avc1", 0, 0, 0L)))
    assert(metas(2L) == (("unknown", 0, 0, 0L)))
  }

  test("merge strategies: TakeBest / Average / Weighted") {
    import spark.implicits._
    val results = Seq(
      (1L, "hnsw", 0.9, 0.1), (1L, "ivf", 0.7, 0.3),
      (2L, "hnsw", 0.5, 0.5), (2L, "ivf", 0.8, 0.2)
    ).toDF("id", "source", "score", "distance")
    val best = ResultMerger.merge(results, ResultMerger.TakeBest)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(best(1L) == (0.9, 0.1) && best(2L) == (0.8, 0.2))
    val avgd = ResultMerger.merge(results, ResultMerger.Average)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(avgd(1L) - 0.8) < 1e-9)
    val w = ResultMerger.merge(results,
        ResultMerger.Weighted(Map("hnsw" -> 3.0, "ivf" -> 1.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(w(1L) - (0.9 * 3 + 0.7) / 4) < 1e-9)
    // the reference merge's final sort-desc-by-score + truncate(k)
    // (search_integration.rs:291-294): k=1 keeps only the best-fused id
    val top1 = ResultMerger.merge(results, ResultMerger.TakeBest, k = Some(1))
      .collect()
    assert(top1.length == 1 && top1.head.getLong(0) == 1L &&
      top1.head.getDouble(1) == 0.9)
  }

  test("real PCM16 decode: hand-built stereo WAV, channel de-interleave, junk survives") {
    import spark.implicits._
    // 3 stereo frames with hand-picked samples incl. negatives: ch0 =
    // [1000, -2000, 3000], ch1 = [-1, 2, -3]
    val ch0 = Array[Short](1000, -2000, 3000)
    val ch1 = Array[Short](-1, 2, -3)
    val dataLen = 3 * 2 * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4)
      .putShort(4).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until 3).foreach { f => buf.putShort(ch0(f)); buf.putShort(ch1(f)) }
    val junk = Array.tabulate[Byte](60)(i => (i * 37).toByte)
    val media = Seq((0L, buf.array()), (1L, junk)).toDF("media_id", "data")
    val out = Multimodal.decodePcmStats(media).collect()
      .map(s => s.media_id -> s).toMap
    val ok = out(0L)
    assert(ok.format == "wav" && ok.channels == 2 && ok.sample_rate == 44100)
    assert(ok.n_samples == 3 && ok.sum_ch0 == 2000L && ok.sum_ch1 == -2L)
    assert(ok.sum_abs == 6000L + 6L)
    assert(out(1L).format == "unknown" && out(1L).n_samples == 0L)
  }

  test("real AVI decode: hand-checked frame sums, bottom-up rows, junk survives") {
    import spark.implicits._
    // video 0 from the generator: w=6, h=4, nf=2, stride 20 (2 pad bytes/row)
    val media = Multimodal.syntheticAviMedia(spark, 3).toDF()
    val out = Multimodal.decodeVideoFrameStats(media).collect()
      .map(s => s.media_id -> s).toMap
    val v0 = out(0L)
    assert(v0.format == "avi/dib" && v0.width == 6 && v0.height == 4)
    assert(v0.n_frames == 2 && v0.duration_ms == 80)
    // replay the generator formula in the test (independent of the oracle)
    var er = 0L; var eg = 0L; var eb = 0L; var el0 = 0L
    for (f <- 0 until 2; y <- 0 until 4; x <- 0 until 6) {
      val r = (x * 3 + y * 5 + f) % 256
      val g = (x + y * 2 + f * 3) % 256
      val b = (x * 3 + y + f * 7) % 256
      er += r; eg += g; eb += b
      if (y == 0) el0 += (r * 299 + g * 587 + b * 114) / 1000
    }
    assert(v0.sum_r == er && v0.sum_g == eg && v0.sum_b == eb)
    // the row-order trap is armed: image row 0 is stored LAST bottom-up,
    // so a top-down decoder would have summed storage row 0 = image row 3
    var elTop = 0L
    for (f <- 0 until 2; x <- 0 until 6) {
      val y = 3
      val r = (x * 3 + y * 5 + f) % 256
      val g = (x + y * 2 + f * 3) % 256
      val b = (x * 3 + y + f * 7) % 256
      elTop += (r * 299 + g * 587 + b * 114) / 1000
    }
    assert(el0 != elTop, "fixture must distinguish row orders")
    assert(v0.sum_luma_row0 == el0)
    // junk and truncation survive as unknown, never a crash
    val truncated = media.filter(col("media_id") === 1).select("data")
      .head.getAs[Array[Byte]](0).take(40)
    val junk = Seq((9L, Array.tabulate[Byte](32)(i => (i * 73).toByte)),
        (10L, truncated))
      .toDF("media_id", "data")
    val badOut = Multimodal.decodeVideoFrameStats(junk).collect()
      .map(s => s.media_id -> s.format).toMap
    assert(badOut(9L) == "unknown" && badOut(10L) == "unknown")
    // and the header prober reads the same avih the decoder gates on
    val blob = media.filter(col("media_id") === 2).select("data")
      .head.getAs[Array[Byte]](0)
    assert(Multimodal.probeVideo(blob).contains(("avi", 16, 4, 160L)))
  }

  test("audio-first AVI binds strf to the vids stream, not the first strf") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-built AVI with stream order auds, vids — the common layout the
    // first-strf binding misread: the audio strf's WAVEFORMAT bytes landed
    // where biBitCount lives (16 != 24) and every video frame was rejected
    val w = 2; val h = 2; val stride = (3 * w + 3) & ~3 // 8
    val frame = Array.tabulate[Byte](stride * h)(i => (i * 7 + 3).toByte)
    def ch(buf: ByteBuffer, s: String) = buf.put(s.getBytes("US-ASCII"))
    val audStrl = 4 + (8 + 56) + (8 + 40) // strh + 40-byte audio strf
    val vidStrl = 4 + (8 + 56) + (8 + 40)
    val hdrl = 4 + (8 + 56) + (8 + audStrl) + (8 + vidStrl)
    val movi = 4 + (8 + frame.length)
    val riff = 4 + (8 + hdrl) + (8 + movi)
    val buf = ByteBuffer.allocate(8 + riff).order(ByteOrder.LITTLE_ENDIAN)
    ch(buf, "RIFF"); buf.putInt(riff); ch(buf, "AVI ")
    ch(buf, "LIST"); buf.putInt(hdrl); ch(buf, "hdrl")
    ch(buf, "avih"); buf.putInt(56)
    buf.putInt(40000).putInt(0).putInt(0).putInt(0)
    buf.putInt(1).putInt(0).putInt(2).putInt(0) // totalFrames=1, streams=2
    buf.putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    ch(buf, "LIST"); buf.putInt(audStrl); ch(buf, "strl") // AUDIO first
    ch(buf, "strh"); buf.putInt(56); ch(buf, "auds")
    buf.put(new Array[Byte](52))
    ch(buf, "strf"); buf.putInt(40) // WAVEFORMATEX + cbSize padding
    buf.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2)
    buf.putShort(16) // wBitsPerSample = 16 at payload offset 14
    buf.put(new Array[Byte](40 - 16)) // cbSize + extra bytes up to 40
    ch(buf, "LIST"); buf.putInt(vidStrl); ch(buf, "strl") // then VIDEO
    ch(buf, "strh"); buf.putInt(56); ch(buf, "vids"); ch(buf, "DIB ")
    buf.put(new Array[Byte](48))
    ch(buf, "strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h)
    buf.putShort(1).putShort(24).putInt(0).putInt(frame.length)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    ch(buf, "LIST"); buf.putInt(movi); ch(buf, "movi")
    ch(buf, "00db"); buf.putInt(frame.length); buf.put(frame)
    val out = Multimodal.decodeVideoFrameStats(
        Seq((7L, buf.array())).toDF("media_id", "data"))
      .collect().head
    assert(out.format == "avi/dib" && out.width == w && out.height == h)
    assert(out.n_frames == 1, s"audio strf shadowed the video one: $out")
    // sums from the raw frame bytes (bottom-up BGR rows, stride-padded)
    var er = 0L; var eg = 0L; var eb = 0L
    for (row <- 0 until h; x <- 0 until w) {
      eb += frame(row * stride + 3 * x) & 0xff
      eg += frame(row * stride + 3 * x + 1) & 0xff
      er += frame(row * stride + 3 * x + 2) & 0xff
    }
    assert(out.sum_r == er && out.sum_g == eg && out.sum_b == eb)
  }

  test("AVI frame sampling emits real DIB payloads at the frame clock") {
    // video 2: w=16 (stride 48, no padding), h=4, nf=4 frames at 25 fps
    val media = Multimodal.syntheticAviMedia(spark, 3).toDF()
      .filter(col("media_id") === 2)
    // fps = frame rate -> every frame, real ts from the 40 ms clock
    val all = Multimodal.sampleFrames(media, fps = 25.0).collect()
      .sortBy(_.frame_idx)
    assert(all.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    assert(all.map(_.ts_ms).toSeq == Seq(0, 40, 80, 120))
    // each payload is the actual raw frame: stride*h bytes whose first
    // pixel matches the generator formula (B of (x=0, stored row 0 =
    // image row h-1=3) of frame f for video i=2)
    all.foreach { fr =>
      assert(fr.data.length == 48 * 4)
      val expB = (2 * 13 + 0 + 3 + fr.frame_idx * 7) % 256
      assert((fr.data(0) & 0xff) == expB, s"frame ${fr.frame_idx}")
    }
    // fps below the frame rate subsamples (every other frame at 12.5)
    val half = Multimodal.sampleFrames(media, fps = 12.5).collect()
    assert(half.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
  }

  test("merge strategy Rrf: rank-based fusion, calibration-free") {
    import spark.implicits._
    // source A ranks 1,2,3 (by distance asc); source B ranks 3,2 —
    // heterogeneous distance scales on purpose (B's are 100x larger):
    // RRF must ignore magnitudes entirely
    val results = Seq(
      (1L, "a", 0.0, 0.1), (2L, "a", 0.0, 0.2), (3L, "a", 0.0, 0.3),
      (3L, "b", 0.0, 10.0), (2L, "b", 0.0, 20.0)
    ).toDF("id", "source", "score", "distance")
    val fused = ResultMerger.merge(results, ResultMerger.Rrf(60))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(fused(1L) - 1.0 / 61) < 1e-12)
    assert(math.abs(fused(2L) - (1.0 / 62 + 1.0 / 62)) < 1e-12)
    assert(math.abs(fused(3L) - (1.0 / 63 + 1.0 / 61)) < 1e-12)
    // doc 3: rank 3 in a + rank 1 in b beats doc 1's single rank-1
    assert(fused(3L) > fused(1L) && fused(2L) > fused(1L))
  }
}
