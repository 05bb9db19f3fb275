package graft.operators

/** Pluggable media codecs for the multimodal decode stage.
  *
  * [[Multimodal.decode]] runs partition-wise over primitive byte
  * arrays; WHAT it extracts from a payload is this trait. The decoded
  * contract is fixed — integer `featSums` (exact, SQL-verifiable) next
  * to the float `features` a real featurizer would emit — so swapping
  * codecs never changes the Spark-side schema, partitioning, or batch
  * shape.
  *
  * Shipped implementations, all pure JVM (public file-format layouts;
  * no native libraries exist in this environment):
  *  - [[StubCodec]] — the deterministic fake (accepts anything); the
  *    default, and what every m-suite oracle pins.
  *  - [[BmpCodec]] — uncompressed 24-bit BMP (BITMAPINFOHEADER):
  *    per-pixel integer luma, positionally pooled.
  *  - [[WavCodec]] — RIFF/WAVE PCM 16-bit: per-sample magnitude,
  *    positionally pooled.
  */
trait MediaCodec extends Serializable {
  def name: String

  /** Cheap magic-byte + header sanity check; `decode` is only called
    * when this returns true, and must then not throw on the structural
    * fields it validated. */
  def accepts(bytes: Array[Byte]): Boolean

  def decode(bytes: Array[Byte], nFeat: Int): MediaCodec.Decoded
}

object MediaCodec {
  /** What a codec extracts: container format, geometry (width/height
    * reinterpreted as frames-per-channel/sample-rate for audio),
    * channel count, pooled float features, and their exact-integer
    * companions (`featSums(j)` = Σ of the per-unit integer statistic at
    * unit positions ≡ j mod nFeat). */
  case class Decoded(fmt: String, width: Int, height: Int, channels: Int,
                     features: Array[Float], featSums: Array[Long])

  /** First accepting codec in `chain` decodes; otherwise `fallback`.
    * The m-suite queries pass an empty chain (stub semantics, the
    * oracle contract); pipelines with real media payloads prepend
    * [[Codecs.default]]. */
  def decodeWith(chain: Seq[MediaCodec], fallback: MediaCodec,
                 bytes: Array[Byte], nFeat: Int): Decoded =
    chain.find(_.accepts(bytes)).getOrElse(fallback).decode(bytes, nFeat)

  /** Positional pooling: integer sums per (i mod nFeat) class, floats
    * as sum / unitScale / class-size. */
  private[operators] def pool(n: Int, nFeat: Int, unitScale: Float,
                              stat: Int => Long): (Array[Float], Array[Long]) = {
    val feats = new Array[Float](nFeat)
    val sums = new Array[Long](nFeat)
    if (n > 0) {
      var i = 0
      while (i < n) { sums(i % nFeat) += stat(i); i += 1 }
      val per = math.max(n / nFeat, 1)
      var j = 0
      while (j < nFeat) { feats(j) = sums(j) / unitScale / per; j += 1 }
    }
    (feats, sums)
  }

  private[operators] def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private[operators] def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
}

/** Deterministic fake codec — derives geometry and "features" from the
  * raw bytes. Accepts every payload; the decode the m-suite oracles
  * replay in SQL. */
object StubCodec extends MediaCodec {
  val name = "stub"
  def accepts(bytes: Array[Byte]): Boolean = true
  def decode(bytes: Array[Byte], nFeat: Int): MediaCodec.Decoded = {
    val n = bytes.length
    val fmt =
      if (n == 0) "empty"
      else (bytes(0) & 0xFF) % 3 match {
        case 0 => "img"
        case 1 => "audio"
        case _ => "video"
      }
    // float accumulation order kept bit-identical to the historical
    // stub (per-byte adds, then one divide) — `features` low bits are
    // part of the de-facto contract the m-suite pins
    val feats = new Array[Float](nFeat)
    val sums = new Array[Long](nFeat)
    if (n > 0) {
      var i = 0
      while (i < n) {
        val v = bytes(i) & 0xFF
        feats(i % nFeat) += v / 255.0f
        sums(i % nFeat) += v
        i += 1
      }
      val per = math.max(n / nFeat, 1)
      var j = 0
      while (j < nFeat) { feats(j) /= per; j += 1 }
    }
    MediaCodec.Decoded(fmt, (n % 64 + 1) * 16, (n % 48 + 1) * 9, 3, feats, sums)
  }
}

/** Uncompressed 24-bit BMP (BITMAPINFOHEADER, the lowest common
  * denominator of the public BMP layout): rows bottom-up, padded to 4
  * bytes. Per-pixel statistic is ITU-R BT.601 integer luma
  * `(299r + 587g + 114b) / 1000`, pooled top-down left-to-right so the
  * feature layout matches what a raster featurizer sees. */
object BmpCodec extends MediaCodec {
  import MediaCodec._
  val name = "bmp"

  def accepts(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
      leInt(b, 14) == 40 &&            // BITMAPINFOHEADER
      leShort(b, 28) == 24 &&          // 24 bpp
      leInt(b, 30) == 0 && {           // BI_RGB (uncompressed)
        val w = leInt(b, 18); val h = leInt(b, 22)
        val off = leInt(b, 10)
        w > 0 && h != 0 && off >= 54 &&
          b.length >= off.toLong + rowStride(w).toLong * math.abs(h)
      }

  private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  def decode(b: Array[Byte], nFeat: Int): MediaCodec.Decoded = {
    val w = leInt(b, 18)
    val hRaw = leInt(b, 22)
    val h = math.abs(hRaw)
    val off = leInt(b, 10)
    val stride = rowStride(w)
    val (feats, sums) = pool(w * h, nFeat, 255.0f, { i =>
      val x = i % w
      val yTop = i / w
      // positive height = bottom-up storage; negative = top-down
      val row = if (hRaw > 0) h - 1 - yTop else yTop
      val p = off + row * stride + x * 3
      val blue = b(p) & 0xFF; val green = b(p + 1) & 0xFF; val red = b(p + 2) & 0xFF
      (299L * red + 587L * green + 114L * blue) / 1000L
    })
    MediaCodec.Decoded("bmp", w, h, 3, feats, sums)
  }
}

/** RIFF/WAVE, PCM 16-bit little-endian. Geometry reinterpretation:
  * `width` = frames per channel, `height` = sample rate. Per-sample
  * statistic is the magnitude |s| (abs of the signed 16-bit sample),
  * pooled over interleaved sample positions. */
object WavCodec extends MediaCodec {
  import MediaCodec._
  val name = "wav"

  def accepts(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
      findChunk(b, "fmt ").exists { off =>
        leShort(b, off) == 1 && leShort(b, off + 14) == 16 && // PCM, 16-bit
          leShort(b, off + 2) >= 1
      } && findChunk(b, "data").isDefined

  /** Offset of the chunk's DATA (past the 8-byte chunk header), or
    * None. Chunks are word-aligned per the RIFF spec. */
  private def findChunk(b: Array[Byte], id: String): Option[Int] = {
    var p = 12
    while (p + 8 <= b.length) {
      val sz = leInt(b, p + 4)
      if (sz < 0) return None
      if (b(p) == id(0) && b(p + 1) == id(1) && b(p + 2) == id(2) && b(p + 3) == id(3))
        return if (p + 8 + sz <= b.length) Some(p + 8) else None
      p += 8 + sz + (sz & 1)
    }
    None
  }

  def decode(b: Array[Byte], nFeat: Int): MediaCodec.Decoded = {
    val fmtOff = findChunk(b, "fmt ").get
    val channels = leShort(b, fmtOff + 2)
    val sampleRate = leInt(b, fmtOff + 4)
    val dataOff = findChunk(b, "data").get
    val dataLen = leInt(b, dataOff - 4)
    val nSamples = dataLen / 2
    val (feats, sums) = pool(nSamples, nFeat, 32768.0f, { i =>
      val v = leShort(b, dataOff + i * 2)
      val s = (v << 16) >> 16 // sign-extend
      math.abs(s.toLong)
    })
    MediaCodec.Decoded("wav", nSamples / math.max(channels, 1), sampleRate,
      channels, feats, sums)
  }
}

/** PNG / JPEG via `javax.imageio` — public JDK, no external jars.
  * Per-pixel statistic is the same ITU-R BT.601 integer luma as
  * [[BmpCodec]], pooled top-down left-to-right over `getRGB` values
  * (sRGB). PNG is lossless, so a pipeline that CONTROLS its pixel
  * values (e.g. [[Multimodal.encodeGrayPng]]'s r=g=b=v raster, where
  * luma == v exactly) gets SQL-replayable feature sums through a real
  * compressed-image decode; JPEG decodes through the identical path
  * but its lossy pixels are decoder-defined, so JPEG payloads get
  * spec coverage (determinism, geometry), not an equality oracle. */
object ImageIoCodec extends MediaCodec {
  val name = "imageio"

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && (b(4) & 0xFF) == 0x0D && (b(5) & 0xFF) == 0x0A &&
      (b(6) & 0xFF) == 0x1A && (b(7) & 0xFF) == 0x0A

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  def accepts(b: Array[Byte]): Boolean = isPng(b) || isJpeg(b)

  // ImageIO's default ImageInputStream cache is a TEMP FILE per read:
  // under task-parallel decode the tmp-dir create/delete churn plus
  // the synchronized stream-SPI path serializes the codec (r16
  // measured: spreading m9's decode over 32 tasks REGRESSED 4.9 s →
  // 7.5 s until this was disabled). Memory-cached streams are the
  // documented posture for small in-memory payloads.
  private lazy val memCached: Unit = javax.imageio.ImageIO.setUseCache(false)

  def decode(b: Array[Byte], nFeat: Int): MediaCodec.Decoded = {
    memCached
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "ImageIO could not decode an accepted payload")
    val w = img.getWidth; val h = img.getHeight
    // one bulk getRGB: per-pixel calls re-enter the color model; the
    // row buffer keeps the decode one array pass like the BMP path
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val (feats, sums) = MediaCodec.pool(w * h, nFeat, 255.0f, { i =>
      val p = px(i)
      val red = (p >> 16) & 0xFF; val green = (p >> 8) & 0xFF; val blue = p & 0xFF
      (299L * red + 587L * green + 114L * blue) / 1000L
    })
    MediaCodec.Decoded(if (isPng(b)) "png" else "jpeg", w, h, 3, feats, sums)
  }
}

/** Engine-deterministic grayscale JPEG decode ([[GrayJpeg]]): pure
  * Scala baseline decoder — integer + strict-FP double arithmetic, so
  * the decoded raster is bit-identical across JVMs/platforms (the
  * cross-JVM promise `javax.imageio` cannot make). Accepts only what
  * it fully decodes: baseline sequential, 8-bit, single component. */
object GrayJpegCodec extends MediaCodec {
  val name = "grayjpeg"

  def accepts(b: Array[Byte]): Boolean = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return false
    // marker walk to the first SOF: baseline (0xC0), 8-bit, 1 component
    var p = 2
    while (p + 9 < b.length) {
      if ((b(p) & 0xFF) != 0xFF) return false
      val m = b(p + 1) & 0xFF
      if (m == 0xFF) p += 1
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) p += 2
      else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
        return m == 0xC0 && (b(p + 4) & 0xFF) == 8 && (b(p + 9) & 0xFF) == 1
      else if (m == 0xDA || m == 0xD9) return false // no SOF seen
      else p += 2 + (((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF))
    }
    false
  }

  def decode(b: Array[Byte], nFeat: Int): MediaCodec.Decoded = {
    try {
      val (w, h, px) = GrayJpeg.decode(b)
      val (feats, sums) =
        MediaCodec.pool(w * h, nFeat, 255.0f, i => (px(i) & 0xFF).toLong)
      MediaCodec.Decoded("jpeg", w, h, 1, feats, sums)
    } catch {
      // accepts() validated the STRUCTURAL header, but a web corpus
      // can still carry corrupt ENTROPY data (truncated scan, bad
      // Huffman stream) — one hostile payload must not fail the whole
      // job (the sniffHeaders RIFF contract applied to decode).
      // Geometry isn't trustworthy on a failed decode, so the row is
      // an explicit zero-feature 'jpeg_err' marker a pipeline can
      // filter or audit.
      case scala.util.control.NonFatal(_) =>
        MediaCodec.Decoded("jpeg_err", 0, 0, 0,
          new Array[Float](nFeat), new Array[Long](nFeat))
    }
  }
}

object Codecs {
  /** The stub fallback every query path uses. */
  val stub: MediaCodec = StubCodec

  /** Real-format chain to prepend when payloads carry actual media.
    * Magic-byte gated, so non-matching payloads (e.g. the synthetic
    * text corpora) still fall through to the stub deterministically.
    * Gray baseline JPEGs take the engine-deterministic pure-Scala
    * decoder; everything else ImageIO handles stays on ImageIO. */
  val default: Seq[MediaCodec] = Seq(BmpCodec, WavCodec, GrayJpegCodec, ImageIoCodec)
}
