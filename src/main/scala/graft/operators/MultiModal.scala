package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keep ImageIO traffic IN MEMORY. The registry default
  * (`useCache=true`) routes every `ImageIO.read`/`write`/
  * `createImageInputStream` over a non-seekable stream through a
  * `FileCache*Stream` — a temp file created, written and deleted on
  * local disk PER IMAGE. At 32 concurrent tasks over 10^5..10^6 small
  * payloads that is pure filesystem churn on the same disk the shuffle
  * spills and checkpoint blocks live on (the in-suite image tier
  * measured 3-6× its isolated wall at ×10 before this). All payloads
  * here are in-memory byte arrays already — the memory cache is
  * strictly better. JVM-global and idempotent; called on entry to
  * every codec batch so it takes effect on whichever executor JVM runs
  * the partition, not just the driver.
  *
  * A top-level holder, NOT a method on [[MultiModal]]: executor-side
  * closures reach it through the static MODULE$ field, so calling it
  * never drags the (non-serializable) enclosing object into the task
  * closure. */
private[operators] object ImageIoInMemory {
  @inline def apply(): Unit =
    if (javax.imageio.ImageIO.getUseCache)
      javax.imageio.ImageIO.setUseCache(false)
}

/** Multimodal-column plumbing (north-star ops): image/audio/video as
  * opaque `binary` payloads with typed metadata, decode / feature /
  * frame-sample stages.
  *
  * Decode tiers (all REAL except the last):
  *  - a pure-JVM 24-bit BMP codec (public, dependency-free format:
  *    BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded to
  *    4 bytes) — header fields parse as codegen'd expressions
  *    ([[decodeBmpMeta]]), pixels walk in the partition-batched stage
  *    ([[bmpPixelStats]]);
  *  - PNG/JPEG/GIF/TIFF decode via the JDK's own `javax.imageio`
  *    readers (no external codec dependency — the JRE ships them):
  *    full pixel decode in [[imagePixelStats]], header-only
  *    dims/bands probing in [[imageMeta]];
  *  - a pure-JVM RIFF/WAV PCM16 audio codec — header fields as
  *    codegen'd expressions ([[decodeWavMeta]]), exact-integer sample
  *    aggregates in the partition-batched walk ([[wavSampleStats]]);
  *  - a clearly-marked deterministic STUB standing in for COMPRESSED
  *    audio (mp3/aac) and video codecs, which the JDK genuinely does
  *    not ship.
  * Either way the plumbing is what matters at 100 TB: payloads stay
  * opaque byte arrays, metadata travels in narrow typed columns, and
  * nothing ever collects to the driver.
  */
object MultiModal {

  // ------------------------------------------------------------------
  // 24-bit uncompressed BMP codec — pure JVM, no libraries. Layout:
  // bytes 0-1 "BM"; u32le file size @2; u32le pixel-data offset @10;
  // u32le header size @14; i32le width @18; i32le height @22 (positive
  // = bottom-up); u16le planes @26; u16le bits-per-pixel @28; rows are
  // BGR triplets padded to a 4-byte stride.
  // ------------------------------------------------------------------

  /** Row stride in bytes for a 24-bpp image of width `w`. */
  def bmpStride(w: Int): Int = (3 * w + 3) / 4 * 4

  /** Encode a 24-bit BMP. `pixel(x, y, c)` returns channel c (0=R, 1=G,
    * 2=B) of the pixel at (x, y) with y=0 the TOP row; the encoder
    * handles the format's bottom-up row order and BGR byte order. */
  def encodeBmp24(w: Int, h: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val stride = bmpStride(w)
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var row = h - 1 // file rows run bottom-up
    while (row >= 0) {
      var x = 0
      while (x < w) {
        b.put((pixel(x, row, 2) & 0xff).toByte) // B
          .put((pixel(x, row, 1) & 0xff).toByte) // G
          .put((pixel(x, row, 0) & 0xff).toByte) // R
        x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      row -= 1
    }
    b.array()
  }

  /** Decoded BMP pixel statistics: dims plus per-channel means. */
  final case class BmpStats(doc_id: Long, width: Long, height: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Decode a 24-bit BMP: validates magic/bpp, walks the padded
    * bottom-up BGR rows, returns (w, h, per-channel sums). */
  def decodeBmp24(bytes: Array[Byte]): (Int, Int, Double, Double, Double) = {
    def u16(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    require(u16(28) == 24, s"unsupported bpp ${u16(28)}")
    val off = i32(10); val w = i32(18); val h = i32(22)
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val stride = bmpStride(w)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var row = 0
    while (row < h) {
      val base = off + row * stride
      var x = 0
      while (x < w) {
        sb += bytes(base + 3 * x) & 0xff
        sg += bytes(base + 3 * x + 1) & 0xff
        sr += bytes(base + 3 * x + 2) & 0xff
        x += 1
      }
      row += 1
    }
    val n = w.toLong * h
    (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Little-endian u32 at 0-based byte offset `off` of a binary column,
    * as pure codegen'd expression work: hex the 4 bytes, reverse the
    * byte pairs, conv base 16. */
  private def leU32(bin: Column, off: Int): Column = {
    val hx = hex(substring(bin, off + 1, 4))
    conv(concat(substring(hx, 7, 2), substring(hx, 5, 2),
      substring(hx, 3, 2), substring(hx, 1, 2)), 16, 10).cast("long")
  }

  private def leU16(bin: Column, off: Int): Column = {
    val hx = hex(substring(bin, off + 1, 2))
    conv(concat(substring(hx, 3, 2), substring(hx, 1, 2)), 16, 10)
      .cast("long")
  }

  /** REAL image-metadata decode for BMP payloads: width, height,
    * channels and a validity flag parsed from the header bytes with
    * codegen'd expressions — no UDF, no codec library, scan-speed at
    * any scale. Non-BMP payloads get is_bmp=false and null dims. */
  def decodeBmpMeta(df: DataFrame): DataFrame = {
    val isBmp = length(col("payload")) >= 54 &&
      hex(substring(col("payload"), 1, 2)) === "424D"
    df.withColumn("is_bmp", isBmp)
      .withColumn("width", when(isBmp, leU32(col("payload"), 18)))
      .withColumn("height", when(isBmp, leU32(col("payload"), 22)))
      .withColumn("channels",
        when(isBmp, leU16(col("payload"), 28) / lit(8L)).cast("long"))
      .withColumn("payload_len", length(col("payload")).cast("long"))
  }

  /** Deterministic BMP fixture per id: dims and pixels are closed-form
    * functions of the id (w = id%16+1, h = id%8+1, channel c of pixel
    * (x,y) = (id + 7x + 13y + 31c) % 256), so an external oracle can
    * verify the decoded metadata without ever seeing the bytes. Encoded
    * per partition — the write side of the codec. */
  def syntheticBmp(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 16 + 1).toInt
      val h = (id % 8 + 1).toInt
      (id, encodeBmp24(w, h,
        (x, y, c) => ((id + 7 * x + 13 * y + 31 * c) % 256).toInt))
    }).toDF(idCol, "payload")
  }

  /** Per-channel pixel means via the REAL decoder, batched per
    * partition like [[decodeResizeBatched]] (one codec call per batch —
    * the shape that amortizes codec setup at 100 TB). Input needs
    * (doc_id, payload). */
  def bmpPixelStats(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[BmpStats] =
      batch.map { case (id, payload) =>
        val (w, h, mr, mg, mb) = decodeBmp24(payload)
        BmpStats(id, w.toLong, h.toLong, mr, mg, mb)
      }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
  }

  // ------------------------------------------------------------------
  // javax.imageio tier — PNG/JPEG/GIF/TIFF/WBMP readers and writers
  // ship IN the JDK (OpenJDK 17 `ImageIO.getReaderFormatNames` lists
  // them all); no external codec library is involved.
  // ------------------------------------------------------------------

  /** Encode a deterministic image through the JDK's ImageIO writer.
    * `pixel(x, y, c)` is channel c (0=R, 1=G, 2=B) at (x, y), y=0 top —
    * the same contract as [[encodeBmp24]]. PNG round-trips pixels
    * losslessly; JPEG is lossy, so only dims/bands are contract there. */
  def encodeImageIO(format: String, w: Int, h: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    ImageIoInMemory()
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((pixel(x, y, 0) & 0xff) << 16) |
          ((pixel(x, y, 1) & 0xff) << 8) | (pixel(x, y, 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Deterministic PNG/JPEG fixture per id — the SAME closed-form dims
    * and pixel values as [[syntheticBmp]] (w = id%16+1, h = id%8+1,
    * channel c of (x,y) = (id + 7x + 13y + 31c) % 256), so an external
    * oracle verifies decode output without ever seeing the bytes.
    * `format` is an ImageIO writer name ("png", "jpg", "gif"...). */
  def syntheticImage(df: DataFrame, idCol: String,
      format: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 16 + 1).toInt
      val h = (id % 8 + 1).toInt
      (id, encodeImageIO(format, w, h,
        (x, y, c) => ((id + 7 * x + 13 * y + 31 * c) % 256).toInt))
    }).toDF(idCol, "payload")
  }

  /** Decoded image statistics: dims, bands, per-channel means. */
  final case class ImageStats(doc_id: Long, width: Long, height: Long,
      channels: Long, mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL pixel decode for any JDK-readable format (PNG, JPEG, GIF,
    * TIFF, BMP...), batched per partition like [[bmpPixelStats]] — one
    * stream of codec calls per batch, payload bytes never leave the
    * executor. For lossless formats (PNG) the means hit the encoder's
    * closed form exactly. */
  def imagePixelStats(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[ImageStats] = {
      ImageIoInMemory()
      batch.map { case (id, payload) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        require(img != null, s"undecodable payload for id $id")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageStats(id, w.toLong, h.toLong,
          img.getRaster.getNumBands.toLong,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
  }

  /** Header-probed image metadata. */
  final case class ImageMetaRow(doc_id: Long, format: String,
      width: Long, height: Long, channels: Long, payload_len: Long)

  /** HEADER-ONLY metadata probe via the ImageIO reader registry: format
    * name, dims and band count come from the container header without
    * decoding pixel data — the scan-speed path for corpus-wide media
    * stats (a 100 MP JPEG costs a few hundred header bytes, not a
    * decode). Lossy formats keep dims/bands exact, which is why the
    * JPEG contract is metadata, not means. */
  def imageMeta(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def probe(id: Long, payload: Array[Byte]): ImageMetaRow = {
      ImageIoInMemory()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no ImageIO reader for id $id")
        val r = readers.next()
        try {
          r.setInput(iis)
          val bands = r.getImageTypes(0).next().getNumBands
          ImageMetaRow(id, r.getFormatName.toLowerCase, r.getWidth(0).toLong,
            r.getHeight(0).toLong, bands.toLong, payload.length.toLong)
        } finally r.dispose()
      } finally iis.close()
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map {
        case (id, p) => probe(id, p)
      }))
      .toDF()
  }

  // ------------------------------------------------------------------
  // WAV/PCM audio codec — pure JVM, no libraries (RIFF is a public
  // container: ECMA-119-adjacent chunk layout; PCM16 samples are raw
  // little-endian shorts). Layout written/parsed here: "RIFF" u32le
  // riffSize "WAVE" | "fmt " u32le 16 u16le audioFormat=1 u16le
  // nChannels u32le sampleRate u32le byteRate u16le blockAlign u16le
  // bitsPerSample=16 | "data" u32le dataSize samples. This closes the
  // audio half of the multimodal tier the same way BMP/PNG closed
  // images: header fields parse as codegen'd expressions, the sample
  // walk runs partition-batched, fixtures have closed-form stats an
  // external oracle recomputes without seeing bytes.
  // ------------------------------------------------------------------

  /** Encode a PCM16 mono/stereo WAV. `sample(i, ch)` returns the 16-bit
    * sample for frame i, channel ch. */
  def encodeWavPcm16(sampleRate: Int, nChannels: Int, nFrames: Int,
      sample: (Int, Int) => Int): Array[Byte] = {
    require(sampleRate > 0 && nChannels > 0 && nFrames >= 0)
    val dataSize = nFrames * nChannels * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(nChannels.toShort).putInt(sampleRate)
      .putInt(sampleRate * nChannels * 2)
      .putShort((nChannels * 2).toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      var ch = 0
      while (ch < nChannels) {
        b.putShort((sample(i, ch) & 0xffff).toShort)
        ch += 1
      }
      i += 1
    }
    b.array()
  }

  /** REAL audio-metadata decode for PCM WAV payloads: sample rate,
    * channels, frame count and duration parsed from the 44-byte header
    * with codegen'd expressions — scan-speed corpus audio stats, no
    * sample decode. Non-WAV payloads get is_wav=false and null fields. */
  def decodeWavMeta(df: DataFrame): DataFrame = {
    // The fixed-offset field reads below are only valid for the
    // canonical 44-byte-header layout, so the predicate pins the chunk
    // TAGS too ("fmt " at byte 12, "data" at byte 36): a legal WAV with
    // LIST/fact chunks or WAVE_FORMAT_EXTENSIBLE gets is_wav = false
    // (decline to parse) rather than silently-garbage field values.
    val isWav = length(col("payload")) >= 44 &&
      hex(substring(col("payload"), 1, 4)) === "52494646" &&  // "RIFF"
      hex(substring(col("payload"), 9, 4)) === "57415645" &&  // "WAVE"
      hex(substring(col("payload"), 13, 4)) === "666D7420" && // "fmt "
      hex(substring(col("payload"), 37, 4)) === "64617461"    // "data"
    val nCh = leU16(col("payload"), 22)
    val rate = leU32(col("payload"), 24)
    val dataSize = leU32(col("payload"), 40)
    val frames = (dataSize / (nCh * lit(2L))).cast("long")
    df.withColumn("is_wav", isWav)
      .withColumn("sample_rate", when(isWav, rate))
      .withColumn("n_channels", when(isWav, nCh))
      .withColumn("n_frames", when(isWav, frames))
      .withColumn("duration_ms",
        when(isWav, (frames * 1000L / rate).cast("long")))
  }

  /** Deterministic WAV fixture per id: rate, channels, frames and every
    * sample are closed-form functions of the id (rate = 8000 + (id%4)·
    * 4000, channels = id%2+1, frames = id%50+10, sample(i, ch) =
    * ((id·31 + i·7 + ch·13) % 2001) − 1000), so an external oracle can
    * verify decoded stats without the bytes. */
  def syntheticWav(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val rate = (8000 + (id % 4) * 4000).toInt
      val nCh = (id % 2 + 1).toInt
      val nFrames = (id % 50 + 10).toInt
      (id, encodeWavPcm16(rate, nCh, nFrames,
        (i, ch) => (((id * 31 + i * 7 + ch * 13) % 2001) - 1000).toInt))
    }).toDF(idCol, "payload")
  }

  /** Decoded audio statistics: header fields + exact integer sample
    * aggregates (sum and sum of squares), portable to any engine. */
  final case class WavStats(doc_id: Long, sample_rate: Long,
      n_channels: Long, n_frames: Long, sum_samples: Long,
      sum_sq: Long)

  /** REAL PCM sample walk, batched per partition like [[bmpPixelStats]]:
    * parses the header, folds every 16-bit sample into exact integer
    * sums — the corpus-scale loudness/DC-offset profile (mean =
    * sum/n, RMS = sqrt(sum_sq/n) derived downstream in exact form). */
  def wavSampleStats(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def decode(id: Long, bytes: Array[Byte]): WavStats = {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(8) == 'W',
        s"not a WAV payload for id $id")
      require(b.getShort(20) == 1 && b.getShort(34) == 16,
        s"not PCM16 for id $id")
      val nCh = b.getShort(22).toInt
      val rate = b.getInt(24)
      val dataSize = b.getInt(40)
      val n = dataSize / 2
      var (s, s2) = (0L, 0L)
      var i = 0
      while (i < n) {
        val v = b.getShort(44 + 2 * i).toLong
        s += v; s2 += v * v
        i += 1
      }
      WavStats(id, rate.toLong, nCh.toLong, (n / nCh).toLong, s, s2)
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map {
        case (id, p) => decode(id, p)
      }))
      .toDF()
  }

  /** Per-(file, channel) audio features, all exact integers. */
  final case class WavChannelFeatures(doc_id: Long, channel: Long,
      n_frames: Long, zero_crossings: Long, silence_n: Long,
      peak: Long, sum_samples: Long)

  /** REAL per-channel audio feature extraction over PCM16 WAV payloads:
    * zero-crossing count (sign flips between consecutive frames of the
    * SAME channel — the cheap voiced/unvoiced + spectral-tilt proxy),
    * silence-frame count (|s| < `silenceAbs` — drives silence-trim and
    * dead-air filtering in audio corpus curation), peak amplitude
    * (clipping/level triage) and per-channel sample sum (DC offset =
    * sum/n). One row per (file, channel).
    *
    * Same 100 TB shape as [[wavSampleStats]]: partition-batched
    * single-pass walk over the interleaved samples — audio features at
    * corpus scale are a scan property, so the operator emits fixed-size
    * feature rows (never sample arrays) and nothing but those rows ever
    * crosses an exchange. Sign convention: a frame is non-negative or
    * negative; a crossing is a flip of that predicate, so a 0-valued
    * frame between -5 and +5 counts one crossing, not two. */
  def wavChannelFeatures(df: DataFrame, silenceAbs: Int = 100,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def decode(id: Long, bytes: Array[Byte]): Seq[WavChannelFeatures] = {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(8) == 'W',
        s"not a WAV payload for id $id")
      require(b.getShort(20) == 1 && b.getShort(34) == 16,
        s"not PCM16 for id $id")
      val nCh = b.getShort(22).toInt
      val dataSize = b.getInt(40)
      val nFrames = dataSize / 2 / nCh
      (0 until nCh).map { ch =>
        var (zc, sil, peak, sum) = (0L, 0L, 0L, 0L)
        var prevNonNeg = true
        var i = 0
        while (i < nFrames) {
          val v = b.getShort(44 + 2 * (i * nCh + ch)).toLong
          val nonNeg = v >= 0
          if (i > 0 && nonNeg != prevNonNeg) zc += 1
          prevNonNeg = nonNeg
          if (math.abs(v) < silenceAbs) sil += 1
          if (math.abs(v) > peak) peak = math.abs(v)
          sum += v
          i += 1
        }
        WavChannelFeatures(id, ch.toLong, nFrames.toLong, zc, sil,
          peak, sum)
      }
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, p) => decode(id, p)
      }))
      .toDF()
  }

  // ------------------------------------------------------------------
  // MP4 container metadata (ISO/IEC 14496-12 ISO base media file
  // format — public spec). REAL box walking, header-only: no codec is
  // touched, which is exactly how a corpus triage pass should read
  // video at 100 TB (duration/brand/track-count from a few hundred
  // bytes, never a frame decode). Boxes are [u32be size][4cc type]
  // [payload]; moov/trak are pure containers, mvhd v0 carries
  // timescale (u32 @ +12 of payload) and duration (u32 @ +16).
  // ------------------------------------------------------------------

  /** Encode a minimal valid MP4: ftyp + (optionally a free box first —
    * real muxers do this, parsers must WALK, not assume offsets) +
    * moov[ mvhd + one empty trak per track ]. */
  def encodeMp4(timescale: Int, duration: Long, nTracks: Int,
      freeBoxFirst: Boolean = false): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && nTracks >= 0)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII"))
        .put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 2, 0) ++ "iso2mp41".getBytes("US-ASCII"))
    val mvhdPayload = java.nio.ByteBuffer.allocate(100)
      .putInt(0)                     // version 0 + flags
      .putInt(0).putInt(0)           // ctime, mtime
      .putInt(timescale)
      .putInt(duration.toInt)
      .array()
    // real track internals, closed-form in the track ordinal t: even
    // tracks are video (avc1, 160·(t+1) × 90·(t+1)), odd are audio
    // (mp4a, no dims) — so a per-track oracle recomputes every field
    // from (doc_id, t) without the bytes. Odd tracks encode tkhd
    // VERSION 1 (64-bit times: track_ID @ +20, dims @ +84/+88 of a
    // 92-byte payload) so one fixture file exercises both layouts —
    // v1 tkhd is legal and common in long videos
    val traks = (0 until nTracks).map { t =>
      val vide = t % 2 == 0
      val w = if (vide) 160 * (t + 1) else 0
      val h = if (vide) 90 * (t + 1) else 0
      val tkhdP =
        if (t % 2 == 0) java.nio.ByteBuffer.allocate(84)
        else {
          val p = java.nio.ByteBuffer.allocate(92)
          p.put(0, 1: Byte)         // version 1
          p
        }
      if (t % 2 == 0) {
        tkhdP.putInt(12, t + 1)     // track_ID
        tkhdP.putInt(76, w << 16)   // width, 16.16 fixed
        tkhdP.putInt(80, h << 16)   // height, 16.16 fixed
      } else {
        tkhdP.putInt(20, t + 1)     // track_ID (after 8-byte times)
        tkhdP.putInt(84, w << 16)
        tkhdP.putInt(88, h << 16)
      }
      val hdlrP = java.nio.ByteBuffer.allocate(12)
      (if (vide) "vide" else "soun").getBytes("US-ASCII")
        .zipWithIndex.foreach { case (c, i) => hdlrP.put(8 + i, c) }
      val codec = if (vide) "avc1" else "mp4a"
      val entry = java.nio.ByteBuffer.allocate(8)
      entry.putInt(0, 8)
      codec.getBytes("US-ASCII").zipWithIndex
        .foreach { case (c, i) => entry.put(4 + i, c) }
      val stsdP = java.nio.ByteBuffer.allocate(8)
      stsdP.putInt(4, 1)            // entry_count
      val stbl = box("stbl", box("stsd", stsdP.array() ++ entry.array()))
      val mdia = box("mdia", box("hdlr", hdlrP.array()) ++
        box("minf", stbl))
      box("trak", box("tkhd", tkhdP.array()) ++ mdia)
    }.foldLeft(Array.empty[Byte])(_ ++ _)
    val moov = box("moov", box("mvhd", mvhdPayload) ++ traks)
    val free = if (freeBoxFirst) box("free", Array.fill(16)(0: Byte))
      else Array.empty[Byte]
    ftyp ++ free ++ moov
  }

  /** Decoded MP4 header facts: brand, movie timescale/duration (+ the
    * derived duration_ms, exact integer µ-arithmetic) and track count. */
  final case class Mp4Meta(doc_id: Long, is_mp4: Boolean,
      major_brand: String, timescale: Long, duration: Long,
      duration_ms: Long, n_tracks: Long)

  /** REAL MP4 box walk, partition-batched like [[wavSampleStats]]:
    * top-level boxes scan for ftyp (brand) and moov; moov's children
    * scan for mvhd (v0 timescale/duration) and trak (count). Payloads
    * that don't start with a well-formed ftyp come back
    * `is_mp4 = false` with null-ish fields instead of throwing — a
    * crawl's "video/mp4" label lies often enough that a million-task
    * job must shrug, not die. */
  def decodeMp4Meta(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def walk(id: Long, bytes: Array[Byte]): Mp4Meta = {
      val bad = Mp4Meta(id, is_mp4 = false, "", 0L, 0L, 0L, 0L)
      val b = java.nio.ByteBuffer.wrap(bytes) // ISO boxes are BIG-endian
      def boxType(off: Int): String =
        new String(bytes, off + 4, 4, "US-ASCII")
      if (bytes.length < 16 || boxType(0) != "ftyp") return bad
      val brand = new String(bytes, 8, 4, "US-ASCII")
      var off = 0
      var moovOff = -1
      var moovEnd = -1
      while (off + 8 <= bytes.length && moovOff < 0) {
        val size = b.getInt(off)
        // compare in Long: a lying crawl payload can declare a box size
        // near Int.MaxValue, and a 32-bit `off + size` wraps negative,
        // passes the guard, and sends getInt out of bounds
        if (size < 8 || off.toLong + size > bytes.length) return bad
        if (boxType(off) == "moov") { moovOff = off; moovEnd = off + size }
        off += size
      }
      if (moovOff < 0) return bad
      var ts = 0L; var dur = 0L; var tracks = 0L; var sawMvhd = false
      var c = moovOff + 8
      while (c + 8 <= moovEnd) {
        val size = b.getInt(c)
        if (size < 8 || c.toLong + size > moovEnd) return bad
        boxType(c) match {
          case "mvhd" if size >= 28 && bytes(c + 8) == 0 =>
            ts = b.getInt(c + 20).toLong & 0xffffffffL
            dur = b.getInt(c + 24).toLong & 0xffffffffL
            sawMvhd = true
          case "trak" => tracks += 1
          case _ => ()
        }
        c += size
      }
      if (!sawMvhd || ts == 0) return bad
      Mp4Meta(id, is_mp4 = true, brand, ts, dur, dur * 1000L / ts, tracks)
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map {
        // any residual malformed-container surprise quarantines as a
        // bad row instead of killing the task — the docstring's promise
        case (id, p) => scala.util.Try(walk(id, p))
          .getOrElse(Mp4Meta(id, is_mp4 = false, "", 0L, 0L, 0L, 0L))
      }))
      .toDF()
  }

  /** One decoded MP4 track: tkhd identity + dimensions, hdlr handler
    * class, stsd sample-entry codec fourcc — the fields a video
    * routing/mixture policy keys on. The tkhd triple is Option-al: an
    * unknown tkhd version or short payload DECLINES to nulls instead
    * of emitting a silent (0, 0, 0) row that reads like a parsed
    * zero-size track (r8 verdict). */
  final case class Mp4Track(doc_id: Long, track_id: Option[Long],
      handler: String, width: Option[Long], height: Option[Long],
      codec: String)

  /** Per-track MP4 descent — the level below [[decodeMp4Meta]]'s movie
    * triage: walks moov → trak → { tkhd v0 OR v1 (track id, 16.16-fixed
    * width/height), mdia → hdlr (handler fourcc: vide/soun), mdia →
    * minf → stbl → stsd (first sample-entry codec fourcc) }. Emits one
    * row PER TRACK (none for payloads that don't parse — quarantine at
    * movie grain is [[decodeMp4Meta]]'s job). Same partition-batched
    * mapPartitions shape and the same shrug-don't-die contract: all
    * bounds compared in Long, any surprise yields zero rows for that
    * doc. */
  def decodeMp4Tracks(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def walk(id: Long, bytes: Array[Byte]): Seq[Mp4Track] = {
      val b = java.nio.ByteBuffer.wrap(bytes)
      def boxType(off: Int): String =
        new String(bytes, off + 4, 4, "US-ASCII")
      // children of the byte range [from, end): (type, payloadStart,
      // boxEnd) triples; empty on any malformed size
      def children(from: Int, end: Int): Seq[(String, Int, Int)] = {
        val out = Seq.newBuilder[(String, Int, Int)]
        var off = from
        while (off + 8 <= end) {
          val size = b.getInt(off)
          if (size < 8 || off.toLong + size > end) return Seq.empty
          out += ((boxType(off), off + 8, off + size))
          off += size
        }
        out.result()
      }
      def child(from: Int, end: Int, typ: String): Option[(Int, Int)] =
        children(from, end).collectFirst { case (t, s, e) if t == typ => (s, e) }
      if (bytes.length < 16 || boxType(0) != "ftyp") return Seq.empty
      child(0, bytes.length, "moov").toSeq.flatMap { case (ms, me) =>
        children(ms, me).collect { case ("trak", ts, te) =>
          val tkhd = child(ts, te, "tkhd")
          // tkhd v0 payload: track_ID @ +12, width/height 16.16 fixed
          // @ +76/+80 (84 bytes). v1 (64-bit create/modify times):
          // track_ID @ +20, dims @ +84/+88 (92 bytes) — legal and
          // common in long videos. Anything else declines to nulls.
          val (trackId, w, h) = tkhd match {
            case Some((s, e)) if e - s >= 84 && bytes(s) == 0 =>
              (Some(b.getInt(s + 12).toLong & 0xffffffffL),
                Some((b.getInt(s + 76) >>> 16).toLong),
                Some((b.getInt(s + 80) >>> 16).toLong))
            case Some((s, e)) if e - s >= 92 && bytes(s) == 1 =>
              (Some(b.getInt(s + 20).toLong & 0xffffffffL),
                Some((b.getInt(s + 84) >>> 16).toLong),
                Some((b.getInt(s + 88) >>> 16).toLong))
            case _ => (None, None, None)
          }
          val mdia = child(ts, te, "mdia")
          // hdlr payload: version/flags(4) pre_defined(4) handler(4)
          val handler = mdia.flatMap { case (s, e) => child(s, e, "hdlr") }
            .collect { case (s, e) if e - s >= 12 =>
              new String(bytes, s + 8, 4, "US-ASCII") }
            .getOrElse("")
          // stsd payload: version/flags(4) entry_count(4), then the
          // first sample entry [u32 size][4cc codec]
          val codec = (for {
            (ms2, me2) <- mdia
            (fs, fe) <- child(ms2, me2, "minf")
            (bs, be) <- child(fs, fe, "stbl")
            (ss, se) <- child(bs, be, "stsd")
            if se - ss >= 16 && b.getInt(ss + 4) >= 1
          } yield new String(bytes, ss + 12, 4, "US-ASCII"))
            .getOrElse("")
          Mp4Track(id, trackId, handler, w, h, codec)
        }
      }
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, p) => scala.util.Try(walk(id, p))
          .getOrElse(Seq.empty)
      }))
      .toDF()
  }

  /** Deterministic MP4 fixture per id: timescale = 1000·(id%4+1),
    * duration = 500·id + 1000 ticks, tracks = id%3+1, every 2nd file
    * led by a free box — closed forms an external oracle recomputes
    * without the bytes. */
  def syntheticMp4(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      (id, encodeMp4((1000 * (id % 4 + 1)).toInt, 500L * id + 1000L,
        (id % 3 + 1).toInt, freeBoxFirst = id % 2 == 0))
    }).toDF(idCol, "payload")
  }

  /** Attach a synthetic binary payload derived from a text column (in a
    * real pipeline this is the raw image/audio bytes read from the
    * lake). */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", unhex(md5(col(textCol))))
      .withColumn("payload_len", length(col("payload")).cast("long"))

  /** STUB DECODE — stands in for a decoder of formats the JDK does NOT
    * ship (audio/video containers; for images use the REAL
    * [[imageMeta]]/[[imagePixelStats]] — `javax.imageio` covers
    * PNG/JPEG/GIF/TIFF/BMP). Derives width/height/channels
    * deterministically from the payload bytes (hex-prefix arithmetic)
    * so the downstream plumbing is exercised with a stable schema and
    * the same per-partition execution shape. */
  def decodeImageMetaStub(df: DataFrame): DataFrame = {
    val hx = hex(col("payload")) // hex round-trip of the binary payload
    df.withColumn("width",
        (conv(substring(hx, 1, 4), 16, 10).cast("long") % 1024 + 16))
      .withColumn("height",
        (conv(substring(hx, 5, 4), 16, 10).cast("long") % 1024 + 16))
      .withColumn("channels", lit(3L))
  }

  /** STUB frame index for a "video": frame count from the payload, frame
    * ids as an array column — the real decoder would emit one binary per
    * frame; the plumbing (array of frames, sampling) is identical. */
  def frameIndexStub(df: DataFrame): DataFrame =
    df.withColumn("n_frames",
        (conv(substring(hex(col("payload")), 9, 4), 16, 10)
          .cast("long") % 30 + 1))
      .withColumn("frame_ids",
        sequence(lit(0L), col("n_frames") - 1))

  /** Every-nth frame sampling over the frame array (higher-order filter,
    * no explode). */
  def sampleFrames(df: DataFrame, every: Int): DataFrame =
    df.withColumn("sampled_frames",
        filter(col("frame_ids"), f => f % every === 0))
      .withColumn("n_sampled", size(col("sampled_frames")).cast("long"))

  /** Decoded-and-resized record emitted by the batched decode stage. */
  final case class DecodedImage(doc_id: Long, width: Long, height: Long,
      resized_w: Long, resized_h: Long, thumb_bytes: Long)

  /** Batched decode + resize over partitions — the Scala analogue of a
    * `mapInPandas` stage: rows stream per partition, are grouped into
    * fixed-size batches, and each batch goes through ONE stubbed
    * vectorized-codec call (real codecs amortize setup per batch, which
    * is exactly why the batch shape matters at 100 TB). The resize body
    * here is a deterministic STUB standing in for the video-frame case;
    * the image case is REAL — see [[imagePixelStats]], which runs the
    * identical plumbing over `javax.imageio`. Swapping decoders changes
    * only `decodeBatch`, never the plumbing.
    *
    * Input needs (doc_id, payload, width, height) — see
    * [[decodeImageMetaStub]]. Resize clamps the long edge to `maxEdge`
    * preserving aspect ratio.
    */
  def decodeResizeBatched(df: DataFrame, maxEdge: Long = 256,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // STUB of a vectorized codec call: one invocation per batch.
    def decodeBatch(batch: Seq[(Long, Array[Byte], Long, Long)]): Seq[DecodedImage] =
      batch.map { case (id, payload, w, h) =>
        val scale = math.min(1.0, maxEdge.toDouble / math.max(w, h))
        val rw = math.max(1L, math.round(w * scale))
        val rh = math.max(1L, math.round(h * scale))
        // fake thumbnail size derived from payload + target dims
        DecodedImage(id, w, h, rw, rh, rw * rh * 3 + payload.length)
      }

    df.select(col("doc_id").cast("long"), col("payload"),
        col("width").cast("long"), col("height").cast("long"))
      .as[(Long, Array[Byte], Long, Long)]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
  }

  /** Fault-tolerant variant of [[imagePixelStats]] for corpus-scale
    * runs: a payload the codec rejects yields a quarantine row
    * (`decode_ok = false`, NULL stats, the error class) instead of
    * failing the job — at 100 TB a handful of corrupt blobs in a crawl
    * is the NORMAL case, and one must not kill a million-task job. The
    * strict form stays the default everywhere correctness is being
    * proved; this is the ingest-path wrapper. One row out per row in,
    * so downstream `filter(decode_ok)` + the quarantine count preserve
    * the E1 per-item fault-isolation contract. */
  def imagePixelStatsTolerant(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def one(id: Long, payload: Array[Byte])
        : (Long, Boolean, String, Option[Long], Option[Long], Option[Long],
           Option[Double], Option[Double], Option[Double]) =
      try {
        ImageIoInMemory()
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null)
          (id, false, "UNRECOGNIZED_FORMAT", None, None, None, None, None, None)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          (id, true, null, Some(w.toLong), Some(h.toLong),
            Some(img.getRaster.getNumBands.toLong),
            Some(sr.toDouble / n), Some(sg.toDouble / n), Some(sb.toDouble / n))
        }
      } catch {
        case e: Exception =>
          (id, false, e.getClass.getSimpleName, None, None, None,
            None, None, None)
      }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map {
        case (id, p) => one(id, p) }))
      .toDF("doc_id", "decode_ok", "decode_error", "width", "height",
        "channels", "mean_r", "mean_g", "mean_b")
  }

  /** Average-hash (aHash) perceptual fingerprint over REAL decoded
    * pixels — the classic near-duplicate-image signal: box-downsample
    * the grayscale image to a gw×gh grid, set bit i when cell i is
    * brighter than the global mean. Everything is INTEGER arithmetic:
    * gray = r+g+b (no luma weights, no division), the exact
    * box-downsample maps pixel (x, y) to cell (y·gh div h, x·gw div w),
    * and the brightness test cross-multiplies
    * (cellSum·totalCount > totalSum·cellCount) instead of comparing
    * means — so an external oracle reproduces every bit from the
    * fixture's closed form without decoding anything. Batched decode
    * per partition like [[imagePixelStats]]; payload bytes never leave
    * the executor. Cells with no pixels (image narrower than the grid)
    * hash to 0-bits on both sides. */
  def imageAHash(df: DataFrame, gw: Int = 4, gh: Int = 2,
      batchSize: Int = 64): DataFrame = {
    require(gw > 0 && gh > 0 && gw * gh <= 63,
      "grid must fit a signed 64-bit hash")
    val spark = df.sparkSession
    import spark.implicits._
    def hashBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Long, Long, Long)] = {
      ImageIoInMemory()
      batch.map { case (id, payload) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        require(img != null, s"undecodable payload for id $id")
        val (w, h) = (img.getWidth, img.getHeight)
        val cs = new Array[Long](gw * gh)
        val cc = new Array[Long](gw * gh)
        var ts = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            val cell = (y * gh / h) * gw + (x * gw / w)
            cs(cell) += gray
            cc(cell) += 1
            ts += gray
            x += 1
          }
          y += 1
        }
        val tc = w.toLong * h
        var hash = 0L
        var i = 0
        while (i < gw * gh) {
          // cross-multiply in BigInt: cs·tc can pass Long.MaxValue for
          // ~1e8-pixel images, and the SQL oracle compares in exact
          // (HUGEINT) arithmetic — the bits must agree there too
          if (BigInt(cs(i)) * tc > BigInt(ts) * cc(i)) hash |= 1L << i
          i += 1
        }
        (id, hash, w.toLong, h.toLong)
      }
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => hashBatch(g.toSeq)))
      .toDF("doc_id", "ahash", "width", "height")
  }

  /** Difference-hash (dHash) perceptual fingerprint — the gradient
    * cousin of [[imageAHash]]: box-downsample the grayscale image to a
    * (gw+1)×gh grid and set bit (y·gw + x) when cell (x+1, y) is
    * brighter than cell (x, y). dHash is robust to global
    * brightness/contrast shifts that flip aHash bits (the per-bit
    * comparison is local, not against the global mean), so the two
    * hashes disagree on exactly the near-dups that differ by exposure —
    * run both and OR the pair sets. Same integer discipline as aHash:
    * gray = r+g+b, exact box-downsample (x·(gw+1) div w, y·gh div h),
    * and the brighter-than test cross-multiplies
    * (csR·ccL > csL·ccR) so an external oracle replays every bit from
    * the fixture's closed form. Empty cells (image narrower than the
    * grid) have sum=count=0, making both products 0 — bit 0 on both
    * sides, deterministically. */
  def imageDHash(df: DataFrame, gw: Int = 4, gh: Int = 2,
      batchSize: Int = 64): DataFrame = {
    require(gw > 0 && gh > 0 && gw * gh <= 63,
      "bit grid must fit a signed 64-bit hash")
    val spark = df.sparkSession
    import spark.implicits._
    val cols = gw + 1
    def hashBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Long, Long, Long)] = {
      ImageIoInMemory()
      batch.map { case (id, payload) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        require(img != null, s"undecodable payload for id $id")
        val (w, h) = (img.getWidth, img.getHeight)
        val cs = new Array[Long](cols * gh)
        val cc = new Array[Long](cols * gh)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            val cell = (y * gh / h) * cols + (x * cols / w)
            cs(cell) += gray
            cc(cell) += 1
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var gy = 0
        while (gy < gh) {
          var gx = 0
          while (gx < gw) {
            val l = gy * cols + gx
            val r = l + 1
            // cross-multiplied mean compare in BigInt — same overflow
            // discipline as aHash; the oracle compares in HUGEINT
            if (BigInt(cs(r)) * cc(l) > BigInt(cs(l)) * cc(r))
              hash |= 1L << (gy * gw + gx)
            gx += 1
          }
          gy += 1
        }
        (id, hash, w.toLong, h.toLong)
      }
    }
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => hashBatch(g.toSeq)))
      .toDF("doc_id", "dhash", "width", "height")
  }
}
