package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{conv, hex, octet_length, substring, when}
import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("decodeAll: binary plumbing produces deterministic records") {
    val recs = Multimodal.decodeAll(spark, sfDir).collect()
    assert(recs.length == 500)
    val r = recs.minBy(_.doc_id)
    assert(r.n_bytes > 0)
    assert(r.width >= 16 && r.width < 80)
    assert(r.height >= 16 && r.height < 80)
    assert(r.payload.length <= 16)
    // deterministic: same input -> same output
    val again = Multimodal.decodeAll(spark, sfDir).collect().minBy(_.doc_id)
    assert(again.width == r.width && again.height == r.height)
    assert(java.util.Arrays.equals(again.payload, r.payload))
  }

  test("stub decoder dimension derivation") {
    val rec = Multimodal.StubDecoder.decode(7L, "img", Array.fill[Byte](100)(1))
    assert(rec.n_bytes == 100)
    assert(rec.width == 16 + (100 % 64))
    assert(rec.height == 16 + ((100 / 64) % 64))
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("ImageDecoder: REAL decode of generated PNG and JPEG through the Spark stage") {
    import spark.implicits._
    val white = pngBytes(20, 10, 0xFFFFFF)   // luma 255
    val black = pngBytes(5, 8, 0x000000)     // luma 0
    val gray = jpegBytes(12, 12, 0x808080)   // luma ~128 (jpeg lossy)
    val notImage = "just some text".getBytes("UTF-8")
    val df = Seq((1L, white), (2L, black), (3L, gray), (4L, notImage))
      .toDF("doc_id", "blob")
    val got = Multimodal.decodeImages(df).collect().map(r => r.doc_id -> r).toMap

    assert(got(1L).media_type == "image/png")
    assert(got(1L).width == 20 && got(1L).height == 10)
    assert(got(1L).mean_luma.exists(l => math.abs(l - 255.0) < 1e-6))
    assert(got(1L).thumb_png.nonEmpty)
    // the thumbnail itself decodes as an 8x8 PNG
    val thumb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L).thumb_png))
    assert(thumb.getWidth == 8 && thumb.getHeight == 8)

    assert(got(2L).media_type == "image/png")
    assert(got(2L).mean_luma.exists(l => math.abs(l) < 1e-6))

    assert(got(3L).media_type == "image/jpeg")
    assert(got(3L).width == 12 && got(3L).height == 12)
    assert(got(3L).mean_luma.exists(l => math.abs(l - 128.0) < 8.0), s"jpeg luma ${got(3L).mean_luma}")

    // non-image routes to the stub branch: no luma, stub dims
    assert(got(4L).media_type == "application/octet-stream")
    assert(got(4L).mean_luma.isEmpty)
    assert(got(4L).width == 16 + (notImage.length % 64))
  }

  private def wavBytes(sampleRate: Float, amplitude: Short, nFrames: Int): Array[Byte] = {
    // mono PCM16 sine wave at 440 Hz
    val pcm = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nFrames).foreach { i =>
      val v = (amplitude * math.sin(2 * math.Pi * 440.0 * i / sampleRate)).toShort
      bb.putShort(i * 2, v)
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioDecoder: REAL decode of a generated WAV through the Spark stage") {
    import spark.implicits._
    val wav = wavBytes(8000f, 10000, 8000) // 1 second, amp 10000
    val df = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "blob")
    val got = Multimodal.decodeAudio(df).collect().map(r => r.doc_id -> r).toMap

    val a = got(1L)
    assert(a.media_type == "audio/wav")
    assert(a.sample_rate.contains(8000.0))
    assert(a.channels.contains(1))
    assert(a.n_frames.contains(8000L))
    assert(a.duration_sec.exists(d => math.abs(d - 1.0) < 1e-9))
    // RMS of a full-period sine with amplitude A is A/sqrt(2)
    assert(a.rms.exists(r => math.abs(r - 10000.0 / math.sqrt(2)) < 100.0),
      s"rms ${a.rms}")

    val b = got(2L)
    assert(b.media_type == "application/octet-stream")
    assert(b.sample_rate.isEmpty && b.rms.isEmpty)
  }

  test("frame sampling: stride-4 grid over the payload, exact tail frame") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_frames").toString
    // 1100 units -> 5 frames (ceil 1100/256), sampled idx {0, 4};
    // frame 4 starts at 1024 and holds the 76-unit tail
    val t = "x" * 1100
    Seq((0L, t, "en", "s", t.length.toLong), (1L, "y" * 100, "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Multimodal.q66FrameSample(spark, d).collect()
    val d0 = r.filter(_.getAs[Long]("doc_id") == 0L)
      .map(x => (x.getAs[Long]("frame_idx"), x.getAs[Long]("frame_offset"), x.getAs[Long]("frame_len")))
    assert(d0.toSeq == Seq((0L, 0L, 256L), (4L, 1024L, 76L)))
    val d1 = r.filter(_.getAs[Long]("doc_id") == 1L)
      .map(x => (x.getAs[Long]("frame_idx"), x.getAs[Long]("frame_len")))
    assert(d1.toSeq == Seq((0L, 100L)))
    assert(r.forall(_.getAs[String]("frame_fp").matches("[0-9a-f]{32}")))
  }

  test("content sniffing by magic bytes") {
    assert(Multimodal.ImageDecoder.mediaTypeOf(pngBytes(2, 2, 0)) == "image/png")
    assert(Multimodal.ImageDecoder.mediaTypeOf(jpegBytes(2, 2, 0)) == "image/jpeg")
    assert(Multimodal.ImageDecoder.mediaTypeOf("BMxxxx".getBytes) == "image/bmp")
    assert(Multimodal.ImageDecoder.mediaTypeOf("GIF89a".getBytes) == "image/gif")
    assert(Multimodal.ImageDecoder.mediaTypeOf("hello".getBytes) == "application/octet-stream")
  }

  /** A 64x64 horizontal-gradient PNG; `patch` overwrites an 8x8 corner
    * block with a constant — a small local edit, the "rescaled/retouched
    * copy" a perceptual hash must survive.
    */
  private def gradientPng(patch: Boolean, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 64).foreach { y =>
      (0 until 64).foreach { x =>
        val v = if (invert) 255 - x * 4 else x * 4
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    if (patch) (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, 0xFF0000)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("q238 REAL branch: Hamming banding recovers planted near-identical images") {
    import spark.implicits._
    val base = gradientPng(patch = false)
    val nearDup = gradientPng(patch = true)       // same image, one corner retouched
    val unrelated = gradientPng(patch = false, invert = true) // reversed gradient
    val src = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "blob")
    // the REAL decode path is taken: all three blobs sniff as PNG
    val hashes = Multimodal.pHashAll(src).collect().map(r => r.doc_id -> r).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    // gradient vs inverted gradient disagree on most aHash bits
    val hamFar = hashes(1L).bands.zip(hashes(3L).bands)
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(hamFar > 7, s"unrelated images must not pair (ham=$hamFar)")
    // the banded pair pipeline finds exactly the planted near-dup pair
    val pairs = Multimodal.phashPairs(src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
    val (_, _, hamA, hamD) = pairs.head
    assert(hamA <= 7, s"planted near-dup aHash distance $hamA must be within the band threshold")
    assert(hamD <= 14, s"planted near-dup dHash distance $hamD should be small")
  }

  /** Mono PCM16 WAV whose 440 Hz tone ramps linearly in amplitude —
    * ascending (or descending) frame energies, the envelope the
    * fingerprint bits encode.
    */
  private def rampWav(peak: Int, nFrames: Int, descending: Boolean = false,
      scale: Double = 1.0): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nFrames).foreach { i =>
      val pos = if (descending) nFrames - 1 - i else i
      val amp = peak.toDouble * pos / nFrames * scale
      val v = (amp * math.sin(2 * math.Pi * 440.0 * i / 8000.0)).toShort
      bb.putShort(i * 2, v)
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("q240 REAL branch: energy-delta fingerprint is volume-invariant, " +
      "banding recovers the planted re-mastered copy") {
    import spark.implicits._
    val base = rampWav(peak = 12000, nFrames = 6400)
    val louder = rampWav(peak = 12000, nFrames = 6400, scale = 1.25) // re-mastered copy
    val reversed = rampWav(peak = 12000, nFrames = 6400, descending = true)
    val src = Seq((1L, base), (2L, louder), (3L, reversed)).toDF("doc_id", "blob")
    val fps = Multimodal.audioFpAll(src).collect().map(r => r.doc_id -> r).toMap
    assert(fps.keySet == Set(1L, 2L, 3L))
    // the Haitsma–Kalker property: pure volume scaling preserves every
    // energy-delta sign, so the robust axis is IDENTICAL
    val hamLoud = fps(1L).sbands.zip(fps(2L).sbands)
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(hamLoud == 0, s"volume-scaled copy must fingerprint identically (ham=$hamLoud)")
    // a reversed envelope inverts (almost) every delta sign
    val hamRev = fps(1L).sbands.zip(fps(3L).sbands)
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(hamRev > 7, s"reversed envelope must not pair (ham=$hamRev)")
    val pairs = Multimodal.audioFpPairs(src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
    assert(pairs.head._3 == 0L, "planted pair's sign distance")
  }

  test("AudioFingerprinter stub arithmetic mirrors the oracle's frame grid") {
    // 100 bytes valued 1..100: L = 2, E[f] = (2f+1)^2 + (2f+2)^2 for
    // f < 50, zero after — strictly ascending then flat
    val bytes = Array.tabulate[Byte](100)(i => (i + 1).toByte)
    val units = Multimodal.AudioFingerprinter.stubUnits(bytes)
    assert(units.take(3).toSeq == Seq(1, 2, 3) && units.length == 100)
    val e = Multimodal.AudioFingerprinter.energies64(units)
    assert(e(0) == 1 * 1 + 2 * 2)
    assert(e(49) == 99L * 99 + 100L * 100)
    assert(e(50) == 0L && e(63) == 0L)
    // delta-sign bits 0..48 set (ascending), 49+ clear (0 and flat-zero)
    assert(Multimodal.AudioFingerprinter.signBands(e).toSeq ==
      Seq(255, 255, 255, 255, 255, 255, 1, 0))
    // mean-threshold: total = sum i^2, i=1..100 = 338350; E[f]*64 > total
    // first holds at f=25 (51^2+52^2 = 5305 > 5286.7), through f=49
    assert(Multimodal.AudioFingerprinter.meanBands(e).toSeq ==
      Seq(0, 0, 0, 254, 255, 255, 3, 0))
    // n < 64 zero-pads: single unit, every energy after frame 0 is 0
    val tiny = Multimodal.AudioFingerprinter.energies64(Array(5))
    assert(tiny(0) == 25L && tiny.drop(1).forall(_ == 0L))
  }

  test("PHasher stub arithmetic mirrors the oracle's byte grid") {
    // 100 bytes ascending: luma[i] = i for i < 64; total = 63*64/2 = 2016
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val lumas = Multimodal.PHasher.stubLumas(bytes)
    assert(lumas.toSeq == (0 until 64))
    val bands = Multimodal.PHasher.aHashBands(lumas)
    // bit set iff i*64 > 2016 <=> i > 31.5 <=> i >= 32: bands 0-3 empty,
    // bands 4-7 full
    assert(bands.toSeq == Seq(0, 0, 0, 0, 255, 255, 255, 255))
    // ascending rows: every horizontal gradient is negative (l < r) -> 0
    assert(Multimodal.PHasher.dHash(lumas) == 0L)
    // short payload zero-pads
    assert(Multimodal.PHasher.stubLumas(Array[Byte](65, 66)).take(3).toSeq == Seq(65, 66, 0))
  }

  test("non-ASCII payloads: Spark stubs see UTF-8 BYTES, matching the byte-true oracles") {
    import spark.implicits._
    // the r14-documented divergence risk, now closed: a multi-byte
    // payload where characters != bytes ('é' is 2 UTF-8 bytes, '—' is 3)
    val s = "héllo wörld — ünïcode payload with ẞome united cøntent ~~"
    val bytes = s.getBytes("UTF-8")
    assert(bytes.length > s.length, "fixture must actually be multi-byte")
    // Spark's string->binary cast is UTF-8: the stub grid over the cast
    // column equals the byte view the hex-parse oracle computes
    val df = Seq((1L, s)).toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("blob"))
    val ph = Multimodal.pHashAll(df).collect().head
    val lumas = Multimodal.PHasher.stubLumas(bytes)
    assert(ph.bands.toSeq == Multimodal.PHasher.aHashBands(lumas).toSeq)
    assert(ph.dhash == Multimodal.PHasher.dHash(lumas))
    assert(lumas.exists(_ > 127), "the grid must contain non-ASCII byte values")
    val fp = Multimodal.audioFpAll(df).collect().head
    val e = Multimodal.AudioFingerprinter.energies64(
      Multimodal.AudioFingerprinter.stubUnits(bytes))
    assert(fp.sbands.toSeq == Multimodal.AudioFingerprinter.signBands(e).toSeq)
    assert(fp.ebands.toSeq == Multimodal.AudioFingerprinter.meanBands(e).toSeq)
    // q37's byte10 on this payload is the 10th BYTE (the second byte of
    // 'ö', 0xB6 = 182) — the old character form would have reported the
    // codepoint of the 10th CHARACTER instead
    val b10 = Seq((1L, s)).toDF("doc_id", "text")
      .select(when(octet_length($"text") >= 10,
        conv(hex(substring($"text".cast("binary"), 10, 1)), 16, 10)
          .cast("long")).otherwise(0L).as("byte10"))
      .head().getLong(0)
    assert(b10 == (bytes(9) & 0xFF).toLong)
    // and byte-identical multi-byte payloads pair up through the REAL
    // banded joins of both modalities
    val src = Seq((1L, s), (2L, s), (3L, "a completely different unrelated body of text without overlap"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("blob"))
    val ppairs = Multimodal.phashPairs(src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ppairs.contains((1L, 2L, 0L)), s"phash pairs: ${ppairs.toSeq}")
    val apairs = Multimodal.audioFpPairs(src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(apairs.contains((1L, 2L, 0L)), s"audio pairs: ${apairs.toSeq}")
  }
}
