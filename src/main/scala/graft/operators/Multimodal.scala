package graft.operators

import graft.operators.OpUtils.SpreadOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column handling (north star): media payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct; the
  * decode/feature-extract stages are per-partition batch transforms.
  *
  * Decode is REAL for image formats the JDK decodes natively
  * ([[ImageDecoder]]: PNG/JPEG/BMP/GIF via javax.imageio — no external
  * codecs needed; proven on generated PNG/JPEG bytes in MultimodalSpec).
  * Non-image payloads (and audio/video, whose codecs this container
  * lacks) route to the clearly-marked deterministic `StubDecoder`. The
  * Spark-side plumbing is the part that matters at 100 TB and is fully
  * real either way: binary schema, per-partition batch decode with no
  * shuffle, typed Dataset output, and partition sizing (media blobs are
  * large — a `maxPartitionBytes`-sized parquet partition holds few rows,
  * and decode is CPU-bound, so the stage parallelizes by partition).
  */
object Multimodal {

  /** A decoded media record: what a real image/audio decode stage would
    * emit. `payload` stands in for pixels/samples.
    */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Deterministic fake decoder — the seam where a real codec (javax.imageio,
    * ffmpeg bindings, ...) would plug in. Derives "dimensions" from the
    * byte length so results are stable and testable.
    */
  object StubDecoder {
    def decode(id: Long, mediaType: String, bytes: Array[Byte]): MediaRecord = {
      val w = 16 + (bytes.length % 64)
      val h = 16 + ((bytes.length / 64) % 64)
      MediaRecord(id, mediaType, bytes.length.toLong, w, h, bytes.take(16))
    }
  }

  /** The real plumbing: binary column in → mapPartitions decode → typed
    * Dataset out. Batching happens naturally per parquet partition; a real
    * deployment would tune `spark.sql.files.maxPartitionBytes` down so a
    * partition of blobs fits executor memory.
    */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text".cast("binary").as("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, src, bytes) => StubDecoder.decode(id, src, bytes) })
  }

  /** Decoded image features: real pixel-derived values for real images,
    * stub-derived for everything else (mean_luma/thumb null there).
    */
  final case class ImageFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_luma: Option[Double],
      thumb_png: Array[Byte])

  /** REAL image decode + feature extraction via the JDK's own codecs:
    * content sniffing by magic bytes, `javax.imageio.ImageIO.read`,
    * mean luminance (ITU-R BT.601 over every pixel), and an 8x8 RGB
    * thumbnail re-encoded as PNG (the resize step of the pipeline).
    * Runs headless; zero non-JDK dependencies.
    */
  object ImageDecoder {
    def mediaTypeOf(bytes: Array[Byte]): String =
      if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'
        && bytes(2) == 'N' && bytes(3) == 'G') "image/png"
      else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF
        && (bytes(1) & 0xFF) == 0xD8) "image/jpeg"
      else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "image/bmp"
      else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I'
        && bytes(2) == 'F' && bytes(3) == '8') "image/gif"
      else "application/octet-stream"

    def decode(id: Long, bytes: Array[Byte]): ImageFeatures = {
      val mt = mediaTypeOf(bytes)
      val img =
        if (mt.startsWith("image/"))
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        else None
      img match {
        case Some(im) =>
          var sum = 0.0
          var y = 0
          while (y < im.getHeight) {
            var x = 0
            while (x < im.getWidth) {
              val rgb = im.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                0.114 * (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          val thumb = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = thumb.createGraphics()
          try g.drawImage(im, 0, 0, 8, 8, null) finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(thumb, "png", bos)
          ImageFeatures(id, mt, bytes.length.toLong, im.getWidth, im.getHeight,
            Some(sum / (im.getWidth.toLong * im.getHeight)), bos.toByteArray)
        case None =>
          // non-image (or undecodable): stub-shaped deterministic features
          val s = StubDecoder.decode(id, "application/octet-stream", bytes)
          ImageFeatures(id, s.media_type, s.n_bytes, s.width, s.height, None,
            Array.empty[Byte])
      }
    }
  }

  /** Decoded audio features: real sample-derived values for real audio
    * (WAV/AIFF/AU — the formats the JDK parses natively), stub-null
    * otherwise.
    */
  final case class AudioFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      sample_rate: Option[Double],
      channels: Option[Int],
      n_frames: Option[Long],
      duration_sec: Option[Double],
      rms: Option[Double])

  /** REAL audio decode via the JDK's `javax.sound.sampled` (no external
    * codecs): RIFF/WAVE sniffing, header parse, and RMS amplitude over
    * the PCM16 samples — the feature-extract stage of an audio corpus
    * pipeline. Compressed codecs (mp3/opus/aac) are not in the JDK; blobs
    * that don't parse route to the null branch, exactly like images.
    */
  object AudioDecoder {
    def mediaTypeOf(bytes: Array[Byte]): String =
      if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I'
        && bytes(2) == 'F' && bytes(3) == 'F'
        && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
        "audio/wav"
      else if (bytes.length >= 4 && bytes(0) == 'F' && bytes(1) == 'O'
        && bytes(2) == 'R' && bytes(3) == 'M') "audio/aiff"
      else if (bytes.length >= 4 && bytes(0) == '.' && bytes(1) == 's'
        && bytes(2) == 'n' && bytes(3) == 'd') "audio/basic"
      else "application/octet-stream"

    def decode(id: Long, bytes: Array[Byte]): AudioFeatures = {
      val mt = mediaTypeOf(bytes)
      if (!mt.startsWith("audio/"))
        return AudioFeatures(id, mt, bytes.length.toLong, None, None, None, None, None)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val dur = frames.toDouble / fmt.getFrameRate
          // RMS over PCM16 samples (all channels interleaved)
          val rms =
            if (fmt.getSampleSizeInBits == 16) {
              val data = ais.readAllBytes()
              val order =
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN
              val sb = java.nio.ByteBuffer.wrap(data).order(order).asShortBuffer()
              var sum = 0.0
              var i = 0
              val n = sb.remaining()
              while (i < n) { val v = sb.get(i).toDouble; sum += v * v; i += 1 }
              if (n == 0) None else Some(math.sqrt(sum / n))
            } else None
          AudioFeatures(id, mt, bytes.length.toLong, Some(fmt.getSampleRate.toDouble),
            Some(fmt.getChannels), Some(frames), Some(dur), rms)
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException =>
          AudioFeatures(id, mt, bytes.length.toLong, None, None, None, None, None)
      }
    }
  }

  /** Audio-feature stage over any (doc_id, blob) relation — one
    * per-partition pass, no shuffle.
    */
  def decodeAudio(df: DataFrame): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => AudioDecoder.decode(id, bytes) })
  }

  /** Image-feature stage over any (doc_id, blob) relation — one
    * per-partition pass, no shuffle.
    */
  def decodeImages(df: DataFrame): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => ImageDecoder.decode(id, bytes) })
  }

  /** Declared media-features query: the typed mapPartitions decode stage
    * end to end over the fixture's binary column. The fixture blobs are
    * text (no image magic), so every row routes to the deterministic
    * stub branch — which the oracle expresses in SQL; the REAL decode
    * branch is proven on generated PNG/JPEG bytes in MultimodalSpec.
    */
  def q52MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .spreadAcrossCores
      .select($"doc_id", $"text".cast("binary").as("blob"))
    decodeImages(src)
      .toDF()
      .select($"doc_id", $"media_type", $"n_bytes",
        $"width".cast("long").as("width"), $"height".cast("long").as("height"),
        $"mean_luma")
      .orderBy($"doc_id")
  }

  val q52Sql: String =
    """SELECT doc_id,
      |  'application/octet-stream' AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
      |  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS BIGINT) AS height,
      |  CAST(NULL AS DOUBLE) AS mean_luma
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Oracle-checkable binary-column surface: byte length, base64 of a
    * slice, leading byte — the metadata/sampling ops that stay engine-side
    * even when decode is external.
    */
  def q37BinaryOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        octet_length($"text").cast("long").as("n_bytes"),
        base64(substring($"text", 1, 24).cast("binary")).as("head_b64"),
        // the 10th BYTE (not the 10th character's codepoint — those only
        // coincide on ASCII): substring over the UTF-8 binary, hex-parsed
        when(octet_length($"text") >= 10,
          conv(hex(substring($"text".cast("binary"), 10, 1)), 16, 10)
            .cast("long")).otherwise(0L).as("byte10"))
      .orderBy($"doc_id")
  }

  val q37Sql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  base64(encode(substring(text, 1, 24))) AS head_b64,
      |  CAST(CASE WHEN octet_length(encode(text)) >= 10
      |            THEN CAST(('0x' || hex(encode(text))[19:20]) AS INTEGER)
      |            ELSE 0 END AS BIGINT) AS byte10
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame sampling over opaque video-like payloads — the subsampling
    * stage of a multimodal pipeline (take every k-th frame, hand the
    * sampled windows to the codec). The container has no video codecs
    * (like image/audio, decode is the external seam), but everything a
    * frame-sampler does BEFORE the codec is engine-side and exact:
    * frame-grid arithmetic over the byte stream (256-byte frames here,
    * standing in for codec frame boundaries), stride-4 subsampling, and
    * per-frame fingerprints from the byte windows. One generate per
    * blob — a pure map at any scale, the same shape as q62's token
    * chunking but over binary.
    */
  def q66FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // frame grid in payload units (1 unit = 1 char = 1 byte on this
    // ASCII fixture; DuckDB has no blob substring/md5, so both engines
    // slice the same string form and hash its UTF-8 bytes — the q37
    // precedent for binary-surface parity)
    Tables.documents(spark, dir)
      .spreadAcrossCores
      .select($"doc_id", $"text")
      .withColumn("n_units", length($"text").cast("long"))
      .withColumn("n_frames", expr("(n_units + 255) DIV 256"))
      .withColumn("fi", explode(expr(
        """CASE WHEN n_frames < 1 THEN CAST(array() AS ARRAY<INT>)
          |ELSE sequence(0, CAST(n_frames - 1 AS INT), 4) END""".stripMargin)))
      .select(
        $"doc_id",
        $"fi".cast("long").as("frame_idx"),
        ($"fi".cast("long") * 256).as("frame_offset"),
        length(expr("substring(text, fi * 256 + 1, 256)")).cast("long")
          .as("frame_len"),
        md5(expr("substring(text, fi * 256 + 1, 256)").cast("binary"))
          .as("frame_fp"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val q66Sql: String =
    """WITH b AS (SELECT doc_id, text,
      |    CAST(LENGTH(text) AS BIGINT) AS n_units
      |  FROM documents),
      |f AS (SELECT doc_id, text, unnest(range(0, (n_units + 255) // 256, 4)) AS fi FROM b)
      |SELECT doc_id,
      |  CAST(fi AS BIGINT) AS frame_idx,
      |  CAST(fi * 256 AS BIGINT) AS frame_offset,
      |  CAST(LENGTH(substring(text, CAST(fi * 256 + 1 AS INT), 256)) AS BIGINT) AS frame_len,
      |  md5(substring(text, CAST(fi * 256 + 1 AS INT), 256)) AS frame_fp
      |FROM f
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Perceptual hashes of one media payload: 64-bit aHash packed as 8
    * bands of 8 bits (band k = bits 8k..8k+7 — the banding key layout is
    * the storage layout, so candidate generation never re-slices), plus a
    * 56-bit dHash (8 rows x 7 horizontal gradients) in one BIGINT — bit
    * 55 is the highest, so the value stays positive in every engine.
    */
  final case class PHashRecord(doc_id: Long, bands: Array[Int], dhash: Long)

  /** Perceptual-hash kernel — the multimodal arm of the dedup tier (r12
    * verdict item 2). REAL branch: decode via [[ImageDecoder]]'s JDK
    * codecs, resample to the same 8x8 grid the thumbnail stage uses, and
    * hash integer lumas (BT.601, integer-div by 1000 — exact). STUB
    * branch (non-image payloads, the fixture case): the luma grid is the
    * first 64 payload bytes zero-padded — deterministic arithmetic the
    * DuckDB oracle mirrors byte for byte, the q52 gating convention.
    *
    *  - aHash bit i: `luma[i] * 64 > sum(lumas)` — mean-threshold in
    *    exact integer form (no IEEE mean, no rounding divergence).
    *  - dHash bit (r,c): `luma[8r+c] > luma[8r+c+1]` — horizontal
    *    gradient sign, robust to uniform brightness shifts.
    */
  object PHasher {
    /** Integer BT.601 luma of the image resampled to 8x8 — same resize
      * op as [[ImageDecoder]]'s thumbnail stage.
      */
    def lumas8x8(im: java.awt.image.BufferedImage): Array[Int] = {
      val thumb = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = thumb.createGraphics()
      try g.drawImage(im, 0, 0, 8, 8, null) finally g.dispose()
      val out = new Array[Int](64)
      var i = 0
      while (i < 64) {
        val rgb = thumb.getRGB(i % 8, i / 8)
        out(i) = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        i += 1
      }
      out
    }

    /** Deterministic stand-in grid for payloads without a decodable
      * image: first 64 bytes unsigned, zero-padded.
      */
    def stubLumas(bytes: Array[Byte]): Array[Int] =
      Array.tabulate(64)(i => if (i < bytes.length) bytes(i) & 0xFF else 0)

    def aHashBands(lumas: Array[Int]): Array[Int] = {
      val total = lumas.sum.toLong
      Array.tabulate(8) { k =>
        var band = 0
        var j = 0
        while (j < 8) {
          if (lumas(8 * k + j).toLong * 64 > total) band |= 1 << j
          j += 1
        }
        band
      }
    }

    def dHash(lumas: Array[Int]): Long = {
      var h = 0L
      var i = 0
      while (i < 56) {
        val r = i / 7
        val c = i % 7
        if (lumas(8 * r + c) > lumas(8 * r + c + 1)) h |= 1L << i
        i += 1
      }
      h
    }

    def pHash(id: Long, bytes: Array[Byte]): PHashRecord = {
      val lumas =
        if (ImageDecoder.mediaTypeOf(bytes).startsWith("image/"))
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            .map(lumas8x8).getOrElse(stubLumas(bytes))
        else stubLumas(bytes)
      PHashRecord(id, aHashBands(lumas), dHash(lumas))
    }
  }

  /** Version token for anything persisting aHash band signatures (the
    * [[graft.streaming.FingerprintIndex]] stores) — bump on any change
    * to the 8×8 grid, the luma formula, or the band layout.
    */
  private[graft] val pHashLogicVersion = "ahash8x8.bt601.v1"

  /** pHash stage over any (doc_id, blob) relation — one per-partition
    * pass at the codec boundary, no shuffle (the decodeImages shape).
    */
  def pHashAll(df: DataFrame): Dataset[PHashRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => PHasher.pHash(id, bytes) })
  }

  /** q238 — perceptual-hash image near-dup pairs: the q32 Hamming-banding
    * machinery applied to the multimodal tier. Candidates are generated
    * by an equi-join on (band_id, band_key) over the 8 x 8-bit aHash
    * bands; by pigeonhole, Hamming distance <= 7 flips at most 7 of the
    * 8 bands, so every qualifying pair shares at least one exact band —
    * candidate generation is LOSSLESS for the emitted threshold, never
    * an all-pairs scan. Band rows CARRY both signatures (the q32 trick),
    * so verification (xor + popcount per band, summed) runs inside the
    * join's codegen stage and only surviving pairs reach the distinct.
    * `ham_dhash` reports the gradient-hash distance of each surviving
    * pair — an independent second perceptual axis inside the hash gate.
    *
    * At 100 TB: n x 8 small band rows, shuffled by band key (or
    * broadcast below threshold); near-identical images concentrate in
    * shared buckets, and the quadratic blowup inside one bucket is
    * bounded by that bucket's population, exactly like q32's text
    * SimHash — this is the plan you'd run on a billion-image corpus.
    */
  def q238PhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .spreadAcrossCores
      .select($"doc_id", $"text".cast("binary").as("blob"))
    phashPairs(src)
  }

  /** The banded pair pipeline over any (doc_id, blob) relation — q238's
    * body, factored so the spec can drive the REAL image branch through
    * the identical joins with planted near-identical images.
    */
  def phashPairs(src: DataFrame): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    // the band self-join reads the hashed relation twice — checkpoint so
    // the decode stage runs once (the q32 signature discipline)
    val ph = pHashAll(src).toDF().localCheckpoint()
    val bands = ph
      .select($"doc_id", $"bands", $"dhash", posexplode($"bands"))
      .toDF("doc_id", "bands", "dhash", "band_id", "bkey")
    bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.bands").as("ba"), col("y.bands").as("bb"),
        col("x.dhash").as("da"), col("y.dhash").as("db"))
      .withColumn("ham_ahash", expr(
        "CAST(aggregate(zip_with(ba, bb, (a, b) -> bit_count(a ^ b)), 0, (acc, v) -> acc + v) AS BIGINT)"))
      .filter($"ham_ahash" <= 7)
      .withColumn("ham_dhash", bit_count($"da".bitwiseXOR($"db")).cast("long"))
      .select($"doc_a", $"doc_b", $"ham_ahash", $"ham_dhash")
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** BYTE-TRUE oracle (shared discipline with [[q240Sql]], r14 verdict
    * item 7): the unsigned-byte stub is mirrored on the oracle side by
    * hex-indexing the UTF-8 encoding — `hex(encode(text))[2i−1:2i]`
    * parsed via `'0x…'::INTEGER` — so the two engines agree on ANY
    * corpus, not just pure-ASCII fixtures (`ascii`/`length`, the
    * previous form, counted CHARACTERS and would have silently diverged
    * on the first multi-byte fixture; `text::BLOB`, the other obvious
    * form, hard-errors on non-ASCII in DuckDB v1.0.0). Byte values
    * verified against python `bytes` on a planted multi-byte payload;
    * MultimodalSpec pins the Spark stub to the same byte view.
    */
  val q238Sql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    [CASE WHEN i <= octet_length(encode(text))
      |          THEN CAST(('0x' || hex(encode(text))[2*i-1:2*i]) AS INTEGER)
      |          ELSE 0 END for i in range(1, 65)] AS luma
      |  FROM documents),
      |s AS (SELECT doc_id, luma, list_sum(luma) AS total FROM g),
      |h AS (
      |  SELECT doc_id,
      |    [CAST(list_sum([CASE WHEN luma[8*k + j + 1] * 64 > total
      |                         THEN (1 << j) ELSE 0 END
      |                    for j in range(0, 8)]) AS INTEGER)
      |     for k in range(0, 8)] AS bands,
      |    CAST(list_sum([CASE WHEN luma[8*(i//7) + (i%7) + 1] >
      |                             luma[8*(i//7) + (i%7) + 2]
      |                        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
      |                   for i in range(0, 56)]) AS BIGINT) AS dhash
      |  FROM s),
      |bands AS (SELECT doc_id, k AS band_id, bands[k+1] AS bkey, bands, dhash
      |          FROM h, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS t(k)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.band_id = y.band_id AND x.bkey = y.bkey
      |   AND x.doc_id < y.doc_id)
      |SELECT c.doc_a, c.doc_b,
      |  CAST(list_sum([bit_count(xor(ha.bands[i+1], hb.bands[i+1]))
      |                 for i in range(0, 8)]) AS BIGINT) AS ham_ahash,
      |  CAST(bit_count(xor(ha.dhash, hb.dhash)) AS BIGINT) AS ham_dhash
      |FROM cand c
      |JOIN h ha ON ha.doc_id = c.doc_a
      |JOIN h hb ON hb.doc_id = c.doc_b
      |WHERE list_sum([bit_count(xor(ha.bands[i+1], hb.bands[i+1]))
      |                for i in range(0, 8)]) <= 7
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Audio fingerprint of one media payload: the Haitsma–Kalker (Philips
    * robust hash) shape reduced to one temporal band — 64 frame ENERGIES
    * over the signal, then
    *
    *  - `sbands` (the banding/robust axis): delta-sign bits — bit i
    *    (i < 63) = `E[i+1] > E[i]`, bit 63 = 0 — packed as 8 bands of 8
    *    bits in the q238 band-key layout. Energy-delta signs survive
    *    volume scaling and re-encoding jitter the way dHash gradients
    *    survive brightness shifts;
    *  - `ebands` (the reported second axis): mean-threshold bits —
    *    `E[i] * 64 > ΣE` in exact integer arithmetic (the aHash rule on
    *    energies), same 8-band packing.
    */
  final case class AudioFpRecord(doc_id: Long, sbands: Array[Int], ebands: Array[Int])

  object AudioFingerprinter {
    /** 64 frame energies (Σ unit² per frame, exact BIGINT): frame length
      * ⌈n/64⌉, tail frames empty → 0. Units are PCM16 samples (real
      * branch) or unsigned payload bytes (stub branch); max |unit| 2¹⁵
      * keeps Σ over even hour-long PCM inside Long.
      */
    def energies64(units: Array[Int]): Array[Long] = {
      val n = units.length
      val L = math.max(1, (n + 63) / 64)
      val out = new Array[Long](64)
      var f = 0
      while (f < 64) {
        var s = 0L
        var i = f * L
        val end = math.min((f + 1) * L, n)
        while (i < end) { s += units(i).toLong * units(i); i += 1 }
        out(f) = s
        f += 1
      }
      out
    }

    def signBands(e: Array[Long]): Array[Int] =
      Array.tabulate(8) { k =>
        var band = 0
        var j = 0
        while (j < 8) {
          val i = 8 * k + j
          if (i < 63 && e(i + 1) > e(i)) band |= 1 << j
          j += 1
        }
        band
      }

    def meanBands(e: Array[Long]): Array[Int] = {
      val total = e.sum
      Array.tabulate(8) { k =>
        var band = 0
        var j = 0
        while (j < 8) {
          if (e(8 * k + j) * 64 > total) band |= 1 << j
          j += 1
        }
        band
      }
    }

    /** PCM16 samples, all channels interleaved (the [[AudioDecoder]] read
      * path, factored for the fingerprint stage); None when the payload
      * is not JDK-decodable 16-bit audio.
      */
    def pcm16Samples(bytes: Array[Byte]): Option[Array[Int]] = {
      if (!AudioDecoder.mediaTypeOf(bytes).startsWith("audio/")) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val data = ais.readAllBytes()
            val order =
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN
            val sb = java.nio.ByteBuffer.wrap(data).order(order).asShortBuffer()
            val out = new Array[Int](sb.remaining())
            var i = 0
            while (i < out.length) { out(i) = sb.get(i).toInt; i += 1 }
            Some(out)
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => None
      }
    }

    /** Deterministic stand-in units for payloads without decodable audio:
      * unsigned bytes (the stub convention the DuckDB oracle mirrors).
      */
    def stubUnits(bytes: Array[Byte]): Array[Int] =
      Array.tabulate(bytes.length)(i => bytes(i) & 0xFF)

    def fingerprint(id: Long, bytes: Array[Byte]): AudioFpRecord = {
      val units = pcm16Samples(bytes).getOrElse(stubUnits(bytes))
      val e = energies64(units)
      AudioFpRecord(id, signBands(e), meanBands(e))
    }
  }

  /** Version token for anything persisting audio delta-sign signatures
    * (the [[graft.streaming.FingerprintIndex]] stores) — bump on any
    * change to the 64-frame grid, the energy formula, or the band
    * layout.
    */
  private[graft] val audioFpLogicVersion = "energysign64.v1"

  /** Fingerprint stage over any (doc_id, blob) relation — one
    * per-partition pass at the codec boundary, no shuffle.
    */
  def audioFpAll(df: DataFrame): Dataset[AudioFpRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => AudioFingerprinter.fingerprint(id, bytes) })
  }

  /** q240 — audio fingerprint near-dup pairs: q238's Hamming-banding
    * machinery over [[AudioFingerprinter]]'s energy-delta signatures —
    * the audio arm of the dedup tier, completing the text (q31/q32) /
    * image (q238) / audio modality triple. Candidates equi-join on
    * (band_id, band_key) over the 8 × 8-bit delta-sign bands; Hamming
    * ≤ 7 pigeonholes into at least one exact shared band, so candidate
    * generation is LOSSLESS for the emitted threshold, never all-pairs.
    * Band rows carry both signatures, verification runs inside the
    * join's codegen stage, and `ham_energy` reports the mean-threshold
    * axis of each surviving pair as an independent second signal.
    *
    * Fixture blobs are text, so every row routes to the stub units
    * (bytes-as-samples) that the DuckDB oracle mirrors exactly; the REAL
    * branch (JDK PCM16 decode → the same frame-energy arithmetic) is
    * spec-pinned on generated WAVs: a tone with a shifted copy recovered
    * at small Hamming, a reversed-envelope tone rejected.
    *
    * At 100 TB: n × 8 small band rows shuffled by band key; bucket
    * population bounds the quadratic term exactly as in q32/q238.
    */
  def q240AudioFpNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .spreadAcrossCores
      .select($"doc_id", $"text".cast("binary").as("blob"))
    audioFpPairs(src)
  }

  /** The banded pair pipeline over any (doc_id, blob) relation — q240's
    * body, factored so the spec can drive the REAL audio branch through
    * the identical joins with planted near-identical WAVs.
    */
  def audioFpPairs(src: DataFrame): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    val fp = audioFpAll(src).toDF().localCheckpoint()
    val bands = fp
      .select($"doc_id", $"sbands", $"ebands", posexplode($"sbands"))
      .toDF("doc_id", "sbands", "ebands", "band_id", "bkey")
    bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sbands").as("sa"), col("y.sbands").as("sb"),
        col("x.ebands").as("ea"), col("y.ebands").as("eb"))
      .withColumn("ham_sign", expr(
        "CAST(aggregate(zip_with(sa, sb, (a, b) -> bit_count(a ^ b)), 0, (acc, v) -> acc + v) AS BIGINT)"))
      .filter($"ham_sign" <= 7)
      .withColumn("ham_energy", expr(
        "CAST(aggregate(zip_with(ea, eb, (a, b) -> bit_count(a ^ b)), 0, (acc, v) -> acc + v) AS BIGINT)"))
      .select($"doc_a", $"doc_b", $"ham_sign", $"ham_energy")
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** Same byte-true oracle discipline as [[q238Sql]]: frame energies
    * from the UTF-8 BYTES via hex indexing, valid on any corpus.
    */
  val q240Sql: String =
    """WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
      |                  octet_length(encode(text)) AS n,
      |                  GREATEST(1, (octet_length(encode(text)) + 63) // 64) AS L
      |           FROM documents),
      |e AS (
      |  SELECT doc_id,
      |    [coalesce(list_sum(
      |       [CAST(CAST(('0x' || hx[2*i-1:2*i]) AS INTEGER) AS BIGINT)
      |          * CAST(('0x' || hx[2*i-1:2*i]) AS INTEGER)
      |        for i in range(f * L + 1, LEAST((f + 1) * L, n) + 1)]), 0)
      |     for f in range(0, 64)] AS e
      |  FROM d),
      |h AS (
      |  SELECT doc_id,
      |    [CAST(list_sum([CASE WHEN 8*k + j < 63
      |                          AND e[8*k + j + 2] > e[8*k + j + 1]
      |                         THEN (1 << j) ELSE 0 END
      |                    for j in range(0, 8)]) AS INTEGER)
      |     for k in range(0, 8)] AS sbands,
      |    [CAST(list_sum([CASE WHEN e[8*k + j + 1] * 64 > list_sum(e)
      |                         THEN (1 << j) ELSE 0 END
      |                    for j in range(0, 8)]) AS INTEGER)
      |     for k in range(0, 8)] AS ebands
      |  FROM e),
      |bands AS (SELECT doc_id, k AS band_id, sbands[k+1] AS bkey, sbands, ebands
      |          FROM h, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS t(k)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.band_id = y.band_id AND x.bkey = y.bkey
      |   AND x.doc_id < y.doc_id)
      |SELECT c.doc_a, c.doc_b,
      |  CAST(list_sum([bit_count(xor(ha.sbands[i+1], hb.sbands[i+1]))
      |                 for i in range(0, 8)]) AS BIGINT) AS ham_sign,
      |  CAST(list_sum([bit_count(xor(ha.ebands[i+1], hb.ebands[i+1]))
      |                 for i in range(0, 8)]) AS BIGINT) AS ham_energy
      |FROM cand c
      |JOIN h ha ON ha.doc_id = c.doc_a
      |JOIN h hb ON hb.doc_id = c.doc_b
      |WHERE list_sum([bit_count(xor(ha.sbands[i+1], hb.sbands[i+1]))
      |                for i in range(0, 8)]) <= 7
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_binary_ops" -> (q37BinaryOps _),
    "q52_media_features" -> (q52MediaFeatures _),
    "q66_frame_sample" -> (q66FrameSample _),
    "q238_phash_neardup" -> (q238PhashNeardup _),
    "q240_audiofp_neardup" -> (q240AudioFpNeardup _))

  val oracleSql: Map[String, String] = Map(
    "q37_binary_ops" -> q37Sql,
    "q52_media_features" -> q52Sql,
    "q66_frame_sample" -> q66Sql,
    "q238_phash_neardup" -> q238Sql,
    "q240_audiofp_neardup" -> q240Sql)
}
