package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("media table exposes binary payload + typed metadata") {
    val df = Multimodal.mediaTable(spark, sf)
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.count() == 500)
  }

  test("partition-local decode is deterministic and complete") {
    val a = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.toSeq == b.toSeq, "decode must be deterministic")
    a.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.brightness >= 0.0 && f.brightness <= 1.0)
      assert(f.width >= 16 && f.height >= 16 && f.n_frames >= 1)
    }
  }

  test("decode pipeline adds no shuffle (stays in the scan stage)") {
    val ds = Multimodal.decodeFeatures(spark, sf)
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should be shuffle-free:\n$plan")
  }

  /** A real w x h PNG of one solid color, encoded with the JDK's own writer. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real mono 16-bit PCM WAV: a sine of the given amplitude, encoded by the JDK. */
  private def wav(rateHz: Int, seconds: Double, amplitude: Double): Array[Byte] = {
    val n = (rateHz * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amplitude * 32767.0 * math.sin(2 * math.Pi * 440.0 * i / rateHz)).toInt
      pcm(2 * i) = (s & 0xff).toByte           // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real audio kernel decodes genuine WAV bytes: rate, frames, duration, RMS") {
    import spark.implicits._
    val media = Seq(
      (1L, wav(8000, 0.5, 0.5)),   // sine at half amplitude: RMS ~ 0.5/sqrt(2)
      (2L, wav(16000, 0.25, 0.0)), // silence: RMS ~ 0
      (3L, "definitely not audio".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val got = Multimodal.decodeAudios(media).collect().map(f => f.doc_id -> f).toMap
    assert(got.keySet == Set(1L, 2L), s"corrupt payload must be dropped: ${got.keySet}")
    assert(got(1L).sample_rate == 8000 && got(1L).n_channels == 1)
    assert(got(1L).n_frames == 4000, s"0.5s at 8kHz: ${got(1L).n_frames}")
    assert(math.abs(got(1L).duration_s - 0.5) < 1e-6)
    assert(math.abs(got(1L).rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${got(1L).rms}")
    assert(got(2L).rms < 1e-6, s"silence rms ${got(2L).rms}")
    assert(got(2L).sample_rate == 16000 && got(2L).n_frames == 4000)
  }

  test("real image kernel decodes genuine PNG bytes: true dims, luminance, corrupt-drop") {
    import spark.implicits._
    val media = Seq(
      (1L, png(32, 20, 0xffffff)),             // white: luminance ~ 1.0
      (2L, png(8, 40, 0x000000)),              // black: luminance ~ 0.0
      (3L, png(100, 50, 0xff0000)),            // pure red: luminance ~ 0.299
      (4L, "not an image at all".getBytes("UTF-8")) // must be dropped, not fail the stage
    ).toDF("doc_id", "payload")

    val got = Multimodal.decodeImages(media).collect().map(f => f.doc_id -> f).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"corrupt payload must be dropped: ${got.keySet}")
    assert(got(1L).width == 32 && got(1L).height == 20)
    assert(got(2L).width == 8 && got(2L).height == 40)
    assert(got(3L).width == 100 && got(3L).height == 50)
    assert(math.abs(got(1L).brightness - 1.0) < 0.01, s"white: ${got(1L).brightness}")
    assert(got(2L).brightness < 0.01, s"black: ${got(2L).brightness}")
    assert(math.abs(got(3L).brightness - 0.299) < 0.01, s"red: ${got(3L).brightness}")
    assert(got(1L).n_bytes == png(32, 20, 0xffffff).length, "n_bytes is the encoded size")

    // same zero-shuffle plan shape as the stub path
    val plan = Multimodal.decodeImages(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"image decode should be shuffle-free:\n$plan")
  }

  // ---- minimal real video containers, built byte-by-byte in-test ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** Spec-shaped MP4: ftyp + moov(mvhd v0 + video trak + audio trak) + mdat. */
  private def mp4(timescale: Long, duration: Long, w: Int, h: Int): Array[Byte] = {
    val mvhd = Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ new Array[Byte](80) // rate..next_track_ID
    def tkhd(tw: Int, th: Int) = Array[Byte](0, 0, 0, 0) ++ new Array[Byte](72) ++
      be32(tw.toLong << 16) ++ be32(th.toLong << 16) // 16.16 fixed-point dims at offset 76
    val moov = mp4Box("moov", mp4Box("mvhd", mvhd) ++
      mp4Box("trak", mp4Box("tkhd", tkhd(w, h))) ++
      mp4Box("trak", mp4Box("tkhd", tkhd(0, 0)))) // audio track: zero dims
    mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(512)) ++ moov ++
      mp4Box("mdat", Array.fill[Byte](64)(0x55))
  }

  /** Spec-shaped Matroska: EBML header + Segment(Info(scale, duration) + Tracks). */
  private def mkv(durationTicks: Float, w: Int, h: Int): Array[Byte] = {
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 0x7f); id ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    val info = el(Array[Byte](0x15, 0x49, 0xa9.toByte, 0x66), // Info
      el(Array[Byte](0x2a, 0xd7.toByte, 0xb1.toByte), Array[Byte](0x0f, 0x42, 0x40)) ++ // 1e6 ns
      el(Array[Byte](0x44, 0x89.toByte), be32(java.lang.Float.floatToIntBits(durationTicks) & 0xffffffffL)))
    val video = el(Array[Byte](0xe0.toByte),
      el(Array[Byte](0xb0.toByte), Array[Byte](((w >> 8) & 0xff).toByte, (w & 0xff).toByte)) ++
      el(Array[Byte](0xba.toByte), Array[Byte](((h >> 8) & 0xff).toByte, (h & 0xff).toByte)))
    val tracks = el(Array[Byte](0x16, 0x54, 0xae.toByte, 0x6b), el(Array[Byte](0xae.toByte), video))
    Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte, 0x80.toByte) ++ // empty EBML header
      el(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67), info ++ tracks)  // Segment
  }

  test("real video kernel parses MP4 boxes and Matroska EBML: dims, duration, tracks") {
    import spark.implicits._
    val media = Seq(
      (1L, mp4(timescale = 1000, duration = 5000, w = 640, h = 360)),
      (2L, mkv(durationTicks = 7500f, w = 1920, h = 1080)),
      (3L, "not a video container".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val got = Multimodal.decodeVideoMetas(media).collect().map(f => f.doc_id -> f).toMap
    assert(got.keySet == Set(1L, 2L), s"non-video payload must be dropped: ${got.keySet}")
    assert(got(1L).container == "mp4" && got(1L).width == 640 && got(1L).height == 360)
    assert(math.abs(got(1L).duration_s - 5.0) < 1e-9, s"mvhd 5000/1000: ${got(1L).duration_s}")
    assert(got(1L).n_tracks == 2, "video + zero-dim audio track both counted")
    assert(got(2L).container == "mkv" && got(2L).width == 1920 && got(2L).height == 1080)
    assert(math.abs(got(2L).duration_s - 7.5) < 1e-6, s"7500 ms: ${got(2L).duration_s}")
    assert(got(2L).n_tracks == 1)
    // truncated/corrupt containers drop, never throw
    val cut = mp4(1000, 5000, 640, 360).take(40)
    assert(Multimodal.decodeVideoMeta(9L, cut).forall(_.n_tracks == 0))
    val plan = Multimodal.decodeVideoMetas(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"video metadata should be shuffle-free:\n$plan")
  }

  // ---- MJPEG-in-AVI: a genuine end-to-end frame decode fixture --------------------

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("ISO-8859-1") ++ le32(payload.length) ++ payload ++ pad
  }

  private def riffList(form: String, children: Array[Byte]): Array[Byte] =
    riffChunk("LIST", form.getBytes("ISO-8859-1") ++ children)

  /** Minimal structurally-valid AVI: RIFF('AVI ' LIST('hdrl' avih) LIST('movi' 00dc*)). */
  private def aviMjpeg(frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = riffChunk("avih", le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ new Array[Byte](36))
    val movi = riffList("movi", frames.map(riffChunk("00dc", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ riffList("hdrl", avih) ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
  }

  test("real MJPEG frame decode: true pixels per frame, sampling, non-AVI drop") {
    import spark.implicits._
    // 6 frames ramping black -> white: mean luma must increase monotonically
    val levels = Seq(0, 51, 102, 153, 204, 255)
    val avi = aviMjpeg(levels.map(l => jpeg(48, 32, (l << 16) | (l << 8) | l)))
    val media = Seq(
      (1L, avi),
      (2L, "not an avi at all".getBytes("UTF-8")),
      (3L, avi.take(60)) // truncated container: best-effort, never throws
    ).toDF("doc_id", "payload")

    val all = Multimodal.decodeVideoFrames(media).collect()
      .filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(all.length == 6, s"6 intra-coded frames expected, got ${all.length}")
    assert(all.forall(f => f.width == 48 && f.height == 32), "true decoded dims")
    // JPEG is lossy but monotone ramps survive: each frame measurably brighter
    all.sliding(2).foreach { case Array(a, b) =>
      assert(b.mean_luma > a.mean_luma + 20,
        s"luma ramp must rise: ${a.mean_luma} -> ${b.mean_luma}")
    }
    assert(all.head.mean_luma < 20 && all.last.mean_luma > 235,
      s"black/white endpoints: ${all.head.mean_luma} / ${all.last.mean_luma}")
    assert(!Multimodal.decodeVideoFrames(media).collect().exists(_.doc_id == 2L))

    // every-2nd sampling keeps frames 0, 2, 4 only
    val sampled = Multimodal.decodeVideoFrames(media, everyNth = 2).collect()
      .filter(_.doc_id == 1L).map(_.frame_idx).sorted
    assert(sampled.toSeq == Seq(0, 2, 4))

    // decode stays in the scan stage — frames never enter an exchange
    val plan = Multimodal.decodeVideoFrames(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame decode should be shuffle-free:\n$plan")
  }
}
