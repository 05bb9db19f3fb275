package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs partition-wise over primitive byte arrays (one JVM
  * pass per batch, no per-row plan re-entry), the Scala analogue of a
  * vectorized Pandas-UDF stage.
  *
  * Codecs are pluggable via the [[MediaCodec]] trait: real pure-JVM
  * BMP and WAV parsers ship in the default chain ([[Codecs.default]]),
  * and payloads no codec accepts fall through to the deterministic
  * [[StubCodec]] fake (the default for the oracle-pinned query
  * surface; heavier formats — JPEG, MP3 — need native libraries this
  * environment lacks and bind through the same trait in production).
  */
object Multimodal {

  /** `featSums(j)` = Σ of byte values at positions ≡ j (mod nFeat) —
    * the exact-integer companion to the float `features`, so the
    * decode stage itself can be verified against a SQL oracle (float
    * pooling order is engine-specific; integer sums are not). */
  case class Media(id: Long, fmt: String, width: Int, height: Int,
                   channels: Int, features: Array[Float], featSums: Array[Long])

  /** Decode a binary column partition-wise into typed media rows.
    * Input df must have (`idCol`: long, `binCol`: binary).
    *
    * `codecs` is the real-format chain (magic-byte gated, first match
    * wins; see [[MediaCodec]]); payloads no codec accepts fall through
    * to the deterministic [[StubCodec]]. The default empty chain is
    * exact stub semantics — the contract every m-suite oracle pins.
    */
  def decode(df: DataFrame, idCol: String, binCol: String, nFeat: Int = 8,
             codecs: Seq[MediaCodec] = Nil): Dataset[Media] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val d = MediaCodec.decodeWith(codecs, Codecs.stub, b, nFeat)
        Media(id, d.fmt, d.width, d.height, d.channels, d.features, d.featSums)
      })
  }

  /** Encode a binary column into REAL PNG payloads, partition-wise:
    * byte i becomes raster pixel i (row-major, `width` wide, zero
    * padded to fill the last row) with r = g = b = value. The RGB
    * encoding is deliberate: BT.601 integer luma of (v,v,v) is
    * exactly v ((299+587+114)·v / 1000), and PNG is lossless, so the
    * feature sums a downstream [[ImageIoCodec]] decode emits equal
    * the plain positional byte sums — a SQL oracle can verify a real
    * compressed-image encode→decode round trip without decoding PNG
    * itself. Output schema: (`id`, `png` binary). */
  def encodeGrayPng(df: DataFrame, idCol: String, binCol: String,
                    width: Int = 32): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // file-backed ImageIO stream caching serializes parallel
        // encode via tmp-file churn — see MediaCodecs.memCached (r16)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytesRaw) =>
        val bytes = if (bytesRaw == null) Array.empty[Byte] else bytesRaw
        val h = math.max((bytes.length + width - 1) / width, 1)
        val img = new java.awt.image.BufferedImage(
          width, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < bytes.length) {
          val v = bytes(i) & 0xFF
          img.setRGB(i % width, i / width, (v << 16) | (v << 8) | v)
          i += 1
        } // remaining raster stays 0 (black padding)
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray)
      } }.toDF("id", "png")
  }

  /** Encode a binary column into REAL JPEG payloads, partition-wise:
    * the same grayscale raster construction as [[encodeGrayPng]]
    * (byte i → pixel i, zero-padded rows) written through the
    * PURE-SCALA baseline encoder ([[GrayJpeg]]). JPEG is LOSSY, but
    * the round-11 codec is ENGINE-DETERMINISTIC: integer + strict-FP
    * arithmetic over a StrictMath DCT basis makes encode ∘ decode
    * bit-identical across JVMs, vendors and platforms — retiring the
    * round-10 same-JVM-only caveat the ImageIO encoder forced. The
    * emitted stream is conformant baseline JFIF (spec cross-checks
    * ImageIO decodes it with exact geometry and near-identical
    * pixels). Downstream oracles still pin decode INVARIANTS
    * (geometry from the byte count, bounded mean-luma deviation)
    * because DuckDB cannot replay a DCT — but the decoded raster
    * itself is golden-value-pinned in specs, which only a
    * deterministic codec permits. Output schema: (`id`, `jpg`). */
  def encodeGrayJpeg(df: DataFrame, idCol: String, binCol: String,
                     width: Int = 32): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesRaw) =>
        val bytes = if (bytesRaw == null) Array.empty[Byte] else bytesRaw
        val h = math.max((bytes.length + width - 1) / width, 1)
        val raster = new Array[Byte](width * h)
        System.arraycopy(bytes, 0, raster, 0, bytes.length)
        (id, GrayJpeg.encode(raster, width, h))
      }).toDF("id", "jpg")
  }

  /** HEADER-ONLY media metadata — the cheap 100-TB metadata pass: a
    * corpus-wide (fmt, width, height, depth) profile must not decode
    * 100 TB of pixels. Reads headers only: PNG signature → IHDR
    * width/height/bit-depth (IHDR is by spec the first chunk, fixed
    * offsets); JPEG SOI → proper segment walk to the first SOF marker
    * (C0–C3/C5–C7/C9–CB/CD–CF; skips APPn/DQT/DHT by their declared
    * lengths, stops at SOS — dimensions always precede entropy-coded
    * data) → precision/height/width; anything else `unknown` with
    * zero geometry. Partition-wise over primitive arrays like
    * [[decode]], but never inflates a raster — per-payload cost is
    * the segment table, not the image. In a deployment the binary
    * column's reader feeds only head bytes (lazy blob I/O / a stored
    * head-sample column); the operator touches nothing past the
    * header either way. Output: (id, fmt, width, height, depth). */
  def sniffHeaders(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesRaw) =>
        val b = if (bytesRaw == null) Array.empty[Byte] else bytesRaw
        @inline def u(i: Int): Int = b(i) & 0xFF
        @inline def be16(i: Int): Long = ((u(i) << 8) | u(i + 1)).toLong
        @inline def be32(i: Int): Long =
          ((u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3))
        val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        def isPng = b.length >= 26 && pngSig.indices.forall(i => u(i) == pngSig(i)) &&
          u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'
        def isSof(m: Int): Boolean =
          m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        def leI(i: Int): Long =
          (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3).toLong << 24))
        def leS(i: Int): Long = (u(i) | (u(i + 1) << 8)).toLong
        // RIFF chunk walk over the header table only (never sample
        // data): offset of chunk `id`'s payload, or -1. The offset is
        // tracked as Long: a hostile declared chunk size near
        // 0xFFFFFFFF would wrap an Int advance negative and index out
        // of bounds — any non-advancing or overflowing step means
        // chunk-not-found, so the payload falls through to 'unknown'.
        def riffChunk(cid: String): Int = {
          var p = 12L
          var found = -1
          while (found < 0 && p + 8 <= b.length) {
            val pi = p.toInt
            val sz = leI(pi + 4)
            if (u(pi) == cid(0) && u(pi + 1) == cid(1) &&
              u(pi + 2) == cid(2) && u(pi + 3) == cid(3)) found = pi + 8
            else {
              val next = p + 8L + sz + (sz & 1L)
              p = if (next <= p) b.length.toLong else next
            }
          }
          found
        }
        if (isPng)
          (id, "png", be32(16), be32(20), u(24).toLong)
        else if (b.length >= 30 && u(0) == 'B' && u(1) == 'M')
          // BMP: DIB geometry at fixed offsets; |height| (negative =
          // top-down storage), depth = bits per pixel
          (id, "bmp", leI(18), math.abs(leI(22).toInt).toLong, leS(28))
        else if (b.length >= 44 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' &&
          u(3) == 'F' && u(8) == 'W' && u(9) == 'A' && u(10) == 'V' &&
          u(11) == 'E' && riffChunk("fmt ") >= 0) {
          // WAV: WavCodec's geometry reinterpretation — width = frames
          // per channel (from the data chunk's DECLARED size, no
          // sample reads), height = sample rate, depth = bits/sample
          val f = riffChunk("fmt ")
          val channels = math.max(leS(f + 2), 1L)
          val bits = math.max(leS(f + 14), 1L)
          val d = riffChunk("data")
          val frames =
            if (d < 0) 0L else leI(d - 4) / (channels * (bits / 8).max(1L))
          (id, "wav", frames, leI(f + 4), bits)
        } else if (b.length >= 4 && u(0) == 0xFF && u(1) == 0xD8) {
          var p = 2
          var out: (Long, Long, Long) = null
          while (out == null && p + 3 < b.length) {
            if (u(p) != 0xFF) p += 1 // resync on stray bytes
            else {
              val m = u(p + 1)
              if (m == 0xFF) p += 1 // fill byte before a marker
              else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) p += 2 // no-length markers
              else if (m == 0xDA || m == 0xD9) p = b.length // SOS/EOI: no SOF seen
              else {
                val len = be16(p + 2).toInt
                if (isSof(m) && p + 8 < b.length)
                  out = (be16(p + 7), be16(p + 5), u(p + 4).toLong) // (w, h, precision)
                else p += 2 + len
              }
            }
          }
          out match {
            case (w, h, d) => (id, "jpeg", w, h, d)
            case null      => (id, "unknown", 0L, 0L, 0L)
          }
        } else (id, "unknown", 0L, 0L, 0L)
      }).toDF("doc_id", "fmt", "width", "height", "depth")
  }

  /** Minimal spec-valid ISO-BMFF (MP4) container for the m13 parity
    * surface: ftyp(isom) + a `free` box (the walk must skip unknown
    * types) + moov(mvhd + nTracks × trak(tkhd)) + mdat. Even ids put
    * mdat BEFORE moov using the 64-bit `size==1` largesize form — the
    * walk must step over sample data via the large size to find moov
    * (the streaming-capture file layout); odd ids use the plain
    * post-moov mdat. mvhd and tkhd alternate version 0/1 by id so
    * both header layouts stay exercised. Timescale is fixed at 1000,
    * so duration == duration_ms. Output: (id, bin). */
  def encodeMp4Stub(df: DataFrame, idCol: String, durMsCol: String,
                    tracksCol: String, wCol: String, hCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(durMsCol).cast("long"),
        col(tracksCol).cast("int"), col(wCol).cast("long"), col(hCol).cast("long"))
      .as[(Long, Long, Int, Long, Long)]
      .mapPartitions(_.map { case (id, durMs, nTracks, w, h) =>
        def boxOf(t: String, body: Array[Byte]): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream()
          val size = 8L + body.length
          b.write(((size >> 24) & 0xFF).toInt); b.write(((size >> 16) & 0xFF).toInt)
          b.write(((size >> 8) & 0xFF).toInt); b.write((size & 0xFF).toInt)
          t.foreach(c => b.write(c.toInt))
          b.write(body, 0, body.length)
          b.toByteArray
        }
        def largeBoxOf(t: String, body: Array[Byte]): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream()
          b.write(0); b.write(0); b.write(0); b.write(1) // size == 1
          t.foreach(c => b.write(c.toInt))
          val size = 16L + body.length
          var i = 56
          while (i >= 0) { b.write(((size >> i) & 0xFF).toInt); i -= 8 }
          b.write(body, 0, body.length)
          b.toByteArray
        }
        def bytesOf(write: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream(); write(b); b.toByteArray
        }
        def w32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
          b.write(((v >> 24) & 0xFF).toInt); b.write(((v >> 16) & 0xFF).toInt)
          b.write(((v >> 8) & 0xFF).toInt); b.write((v & 0xFF).toInt)
        }
        def w64(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
          var i = 56; while (i >= 0) { b.write(((v >> i) & 0xFF).toInt); i -= 8 }
        }
        val ftyp = boxOf("ftyp", bytesOf { b =>
          "isom".foreach(c => b.write(c.toInt)); w32(b, 0)
          "isom".foreach(c => b.write(c.toInt))
        })
        val free = boxOf("free", Array.fill[Byte](12)(0x5A))
        val mvhdV = (id % 2).toInt // version alternates by id
        val mvhd = boxOf("mvhd", bytesOf { b =>
          b.write(mvhdV); b.write(0); b.write(0); b.write(0) // version+flags
          if (mvhdV == 0) {
            w32(b, 0); w32(b, 0)            // creation, modification
            w32(b, 1000); w32(b, durMs)      // timescale, duration
          } else {
            w64(b, 0); w64(b, 0)
            w32(b, 1000); w64(b, durMs)
          }
          w32(b, 0x00010000); b.write(1); b.write(0) // rate, volume
          (0 until 10).foreach(_ => b.write(0))      // reserved
          Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
            .foreach(w32(b, _))                      // unity matrix
          (0 until 24).foreach(_ => b.write(0))      // pre_defined
          w32(b, nTracks + 1L)                       // next_track_ID
        })
        val traks = (0 until nTracks).map { ti =>
          val v = ti % 2
          boxOf("trak", boxOf("tkhd", bytesOf { b =>
            b.write(v); b.write(0); b.write(0); b.write(7)
            if (v == 0) {
              w32(b, 0); w32(b, 0); w32(b, ti + 1L); w32(b, 0); w32(b, durMs)
            } else {
              w64(b, 0); w64(b, 0); w32(b, ti + 1L); w32(b, 0); w64(b, durMs)
            }
            w64(b, 0)                                 // reserved
            b.write(0); b.write(0); b.write(0); b.write(0) // layer, alt_group
            b.write(0); b.write(0); b.write(0); b.write(0) // volume, reserved
            Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
              .foreach(w32(b, _))
            w32(b, w << 16); w32(b, h << 16)          // 16.16 fixed
          }))
        }
        val moov = boxOf("moov",
          (Seq(mvhd) ++ traks).reduce(_ ++ _))
        val mdatBody = Array.tabulate[Byte](64)(i => ((id + i) & 0x7F).toByte)
        val bytes =
          if (id % 2 == 0)
            ftyp ++ free ++ largeBoxOf("mdat", mdatBody) ++ moov
          else
            ftyp ++ free ++ moov ++ boxOf("mdat", mdatBody)
        (id, bytes)
      }).toDF("id", "bin")
  }

  /** ISO-BMFF (MP4) HEADER-ONLY metadata: the public-spec size+type
    * box walk to ftyp (major brand), moov→mvhd (timescale → duration
    * in ms) and moov→trak→tkhd (track count; max 16.16-fixed video
    * geometry) — never a byte of sample data (mdat is stepped over by
    * its declared size, including the 64-bit `size==1` largesize
    * form). The m11 posture applied to video containers: offsets walk
    * as Long, and ANY malformed size — non-advancing, overflowing,
    * truncated largesize, box past EOF — aborts to an 'unknown' row
    * instead of an exception (the HostileRiffSpec lesson; one hostile
    * payload must never fail a 100-TB corpus profile). Output:
    * (doc_id, brand, n_tracks, duration_ms, width, height). */
  def mp4Meta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val b = if (raw == null) Array.empty[Byte] else raw
        val n = b.length.toLong
        @inline def u(i: Long): Int = b(i.toInt) & 0xFF
        @inline def be32(i: Long): Long =
          (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
        @inline def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
        @inline def fourcc(i: Long): String =
          new String(Array(u(i), u(i + 1), u(i + 2), u(i + 3)).map(_.toChar))
        var bad = false
        var brand = ""
        var nTracks = 0L
        var durMs = 0L
        var vw = 0L
        var vh = 0L
        // walk boxes in [from, to); `visit` returns the child range of
        // interest (containers recurse via walk again)
        def walk(from: Long, to: Long)(visit: (String, Long, Long) => Unit): Unit = {
          var p = from
          while (!bad && p + 8 <= to) {
            val sz0 = be32(p)
            val t = fourcc(p + 4)
            val (hdr, sz) =
              if (sz0 == 1L) {
                if (p + 16 > to) { bad = true; (16L, 0L) }
                else (16L, be64(p + 8))
              } else if (sz0 == 0L) (8L, to - p) // box extends to end
              else (8L, sz0)
            if (!bad) {
              // bound vs REMAINING bytes: `p + sz` can wrap negative
              // for a hostile largesize near Long.MaxValue (passing a
              // `> to` check and sending the walk to a negative
              // offset); `to - p` cannot overflow — both are bounded
              // by the array length
              if (sz < hdr || sz > to - p) bad = true
              else {
                visit(t, p + hdr, p + sz)
                p += sz // sz >= hdr >= 8: always advances
              }
            }
          }
          // sub-header trailing bytes inside a box range are malformed
          if (p < to) bad = true
        }
        walk(0L, n) { (t, cFrom, cTo) =>
          t match {
            case "ftyp" if cTo - cFrom >= 4 => brand = fourcc(cFrom)
            case "moov" => walk(cFrom, cTo) { (ct, mFrom, mTo) =>
              ct match {
                case "mvhd" if mTo - mFrom >= 20 =>
                  val v = u(mFrom)
                  val (ts, dur) =
                    if (v == 1 && mTo - mFrom >= 28)
                      (be32(mFrom + 20), be64(mFrom + 24))
                    else (be32(mFrom + 12), be32(mFrom + 16))
                  if (ts > 0) durMs = dur * 1000L / ts
                case "trak" =>
                  nTracks += 1
                  walk(mFrom, mTo) { (tt, kFrom, kTo) =>
                    if (tt == "tkhd" && kTo - kFrom >= 84) {
                      val v = u(kFrom)
                      val off = if (v == 1) kFrom + 88 else kFrom + 76
                      if (off + 8 <= kTo) {
                        val w = be32(off) >> 16
                        val h = be32(off + 4) >> 16
                        if (w > vw) vw = w
                        if (h > vh) vh = h
                      }
                    }
                  }
                case _ => ()
              }
            }
            case _ => ()
          }
        }
        if (bad || brand.isEmpty || nTracks == 0)
          (id, "unknown", 0L, 0L, 0L, 0L)
        else (id, brand, nTracks, durMs, vw, vh)
      }).toDF("doc_id", "brand", "n_tracks", "duration_ms", "width", "height")
  }

  /** Deterministic RESIZE (integer box-filter downsample) of the
    * byte-raster convention ([[encodeGrayPng]]'s: byte i = pixel i,
    * `width` wide, zero-padded last row) — the image-preprocessing
    * stage between decode and feature extraction: each `factor`×
    * `factor` block becomes one output pixel, floor(Σ values /
    * block-pixel-count), edge blocks divided by their REAL pixel
    * count. Pure integer arithmetic, so the whole resampled raster
    * is bit-identical on any engine — the query surface emits the
    * geometry plus two exact checksums (value sum and
    * position-weighted sum: a single transposed/misplaced pixel
    * flips the latter). Partition-wise over primitive arrays like
    * [[decode]]; a production variant emits the resized raster
    * bytes from the same loop. */
  def resizeGray(df: DataFrame, idCol: String, binCol: String,
                 width: Int = 32, factor: Int = 4): DataFrame = {
    require(width >= 1 && factor >= 1, s"width=$width factor=$factor")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val b = if (raw == null) Array.empty[Byte] else raw
        val n = b.length
        val h = math.max((n + width - 1) / width, 1)
        val ow = (width + factor - 1) / factor
        val oh = (h + factor - 1) / factor
        val sums = new Array[Long](ow * oh)
        var i = 0
        while (i < n) {
          sums((i / width / factor) * ow + (i % width) / factor) += (b(i) & 0xFF)
          i += 1
        }
        var pxSum = 0L
        var posSum = 0L
        var j = 0
        while (j < ow * oh) {
          val bh = math.min(factor, h - (j / ow) * factor)
          val bw = math.min(factor, width - (j % ow) * factor)
          val pv = sums(j) / (bw.toLong * bh)
          pxSum += pv
          posSum += j.toLong * pv
          j += 1
        }
        (id, ow.toLong, oh.toLong, pxSum, posSum)
      }).toDF("doc_id", "out_w", "out_h", "px_sum", "px_pos_sum")
  }

  /** Perceptual-hash near-duplicate pairs over a binary media column:
    * a 60-bit AVERAGE HASH (aHash) per payload — bit j set iff the
    * j-th positional byte-group sum exceeds the global mean, the
    * integer compare `sums[j]·60 > total` so the hash is
    * bit-reproducible in plain SQL — then banded hamming-LSH exactly
    * like text SimHash: 4 bands × 15 bits generate candidates (a
    * pair within hamming ≤ 3 of 60 bits shares ≥ 1 intact band by
    * pigeonhole), capped buckets, popcount verification. The decode
    * stage is the [[decode]] stub; swap in a real image codec and
    * the group sums become downsampled luma — the plumbing, banding,
    * and verification stay identical.
    */
  def perceptualHashPairs(df: DataFrame, idCol: String, binCol: String,
                          maxHamming: Int = 3, maxBucket: Int = 4096,
                          codecs: Seq[MediaCodec] = Nil): DataFrame = {
    // empty payloads carry no perceptual content but would all hash to
    // ph=0 (all-zero featSums) and pair with each other at hamming 0 —
    // filter them out before hashing, mirroring the oracle's
    // non-empty-text derivation
    val media = decode(df.filter(length(col(binCol)) > 0), idCol, binCol, nFeat = 60,
      codecs = codecs).toDF()
    val ph = media.select(col("id"),
        expr("aggregate(featSums, CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("total"),
        col("featSums"))
      .select(col("id"), expr(
        "aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) -> " +
          "acc + CASE WHEN featSums[j] * 60 > total " +
          "THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)").as("ph"))
    val preBand = ph.withColumn("band", explode(expr(
        "transform(sequence(0, 3), k -> struct(k AS k, (shiftright(ph, k*15) & 32767) AS bh))")))
      .select(col("id"), col("ph"), col("band.k").as("k"), col("band.bh").as("bh"))
    // cap observability (the d4 convention): every pair row carries
    // how many band buckets the cap bound and how many rows it
    // dropped — zero wherever the oracle runs, nonzero = the recall
    // trade is live. 1-row broadcast, no extra exchange on pairs.
    val capStats = preBand.groupBy("k", "bh").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(when(col("n") > maxBucket, 1L).otherwise(0L)), lit(0L))
          .as("n_capped_buckets"),
        coalesce(sum(greatest(col("n") - maxBucket, lit(0L))), lit(0L))
          .as("n_dropped_rows"))
    val banded = preBand
      .transform(Dedup.capBuckets(_, Seq("k", "bh"), "id", maxBucket))
    banded.as("a").join(banded.as("b"),
        col("a.k") === col("b.k") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"),
        expr("CAST(bit_count(a.ph ^ b.ph) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .crossJoin(broadcast(capStats))
  }

  /** One frame's perceptual hash: `nBits` positional-group sums,
    * bit j set iff `groupSum(j)·nBits > frameSum` (the integer-compare
    * aHash convention of [[perceptualHashPairs]], per frame). */
  case class FrameHash(id: Long, frame_idx: Int, ph: Long)

  /** Per-frame perceptual hashes over a framed byte stream — the
    * input to shot-boundary detection: consecutive frames whose
    * hashes differ by a large hamming distance mark a cut. Same
    * partition-wise primitive-array pass as [[frameSample]]; with a
    * real codec bound via [[MediaCodec]] the group sums become
    * downsampled luma and everything downstream is unchanged. */
  def frameHashes(df: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int, nBits: Int = 12): Dataset[FrameHash] = {
    require(frameBytes >= 1 && nBits >= 1 && nBits <= 60, "bad frame/bits")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val nFrames = (b.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).map { fi =>
          val start = fi * frameBytes
          val end = math.min(start + frameBytes, b.length)
          val gs = new Array[Long](nBits)
          var total = 0L
          var i = start
          while (i < end) {
            val v = (b(i) & 0xFF).toLong
            gs((i - start) % nBits) += v
            total += v
            i += 1
          }
          var ph = 0L
          var j = 0
          while (j < nBits) {
            if (gs(j) * nBits > total) ph |= 1L << j
            j += 1
          }
          FrameHash(id, fi, ph)
        }
      })
  }

  case class FrameEnergy(id: Long, frame_idx: Int, energy: Long)

  /** Per-frame signal energy over a framed byte stream — the
    * voice-activity / silence-detection front end for audio-like
    * payloads: energy(frame) = Σ (byte − 128)², i.e. squared
    * deviation from the unsigned-PCM midpoint, exact integers so a
    * SQL oracle can replay it. Same partition-wise primitive-array
    * pass as [[frameHashes]]; with a real audio codec bound via
    * [[MediaCodec]] the bytes become PCM samples and everything
    * downstream (thresholding, segment coalescing) is unchanged. */
  def frameEnergies(df: DataFrame, idCol: String, binCol: String,
                    frameBytes: Int): Dataset[FrameEnergy] = {
    require(frameBytes >= 1, "frameBytes must be positive")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val nFrames = (b.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).map { fi =>
          val start = fi * frameBytes
          val end = math.min(start + frameBytes, b.length)
          var e = 0L
          var i = start
          while (i < end) {
            val d = (b(i) & 0xFF) - 128
            e += d.toLong * d
            i += 1
          }
          FrameEnergy(id, fi, e)
        }
      })
  }

  /** One sampled frame: exact-integer per-frame statistics (the float
    * embedding of a real frame featurizer would ride the same row —
    * integer sums are what a SQL oracle can verify). */
  case class Frame(id: Long, frame_idx: Int, n_bytes: Int, byte_sum: Long)

  /** Frame sampling over a video-like payload: the byte stream is a
    * sequence of fixed-`frameBytes` frames (last one possibly
    * partial); emit every `stride`-th frame with its byte count and
    * exact byte sum. Same partition-wise primitive-array execution as
    * [[decode]] — one JVM pass per batch, no per-row plan re-entry —
    * with the frame-split arithmetic standing in for a container
    * demuxer (the codec stub contract documented above). Narrow: each
    * payload expands in place; output is input × sampled-frame count.
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int, stride: Int): Dataset[Frame] = {
    require(frameBytes >= 1 && stride >= 1, "frameBytes and stride must be positive")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val nFrames = (b.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames, stride).map { fi =>
          val start = fi * frameBytes
          val end = math.min(start + frameBytes, b.length)
          var s = 0L
          var i = start
          while (i < end) { s += b(i) & 0xFF; i += 1 }
          Frame(id, fi, end - start, s)
        }
      })
  }

  // ────────────────── ISO-BMFF sample tables (round 13) ──────────────────

  /** One sample-table row: where a sample LIVES (offset relative to
    * the mdat body — the portable form of stco's absolute offsets),
    * how BIG it is (stsz), when it DECODES (dts: cumulative stts) and
    * when it PLAYS (pts: dts + the ctts composition offset, shifted by
    * the elst edit list — round 14; on I-frame-only media with no
    * edits the two coincide). Both in ms via the mdhd timescale.
    * Exactly the map a container-aware demuxer needs to read one
    * frame without scanning the stream. */
  case class SampleRef(doc_id: Long, track_id: Long, sample_idx: Long,
                       chunk_idx: Long, size: Long, dts_ms: Long,
                       pts_ms: Long, rel_offset: Long)

  /** [[encodeMp4Stub]] extended with REAL sample tables: each track
    * carries mdia(mdhd(timescale 1000) + minf(stbl(stts + stsc + stsz
    * + stco))) describing the payload as 32-byte samples (last one
    * partial), 4 samples per chunk, constant 40 ms sample duration —
    * and mdat's body IS the payload, with stco holding true ABSOLUTE
    * file offsets (moov is assembled twice: once to learn its size,
    * once with the resolved offsets). Even ids keep the
    * mdat-before-moov 64-bit-largesize layout, odd ids the post-moov
    * plain form, so offset resolution is exercised in both. Every
    * track maps the same payload region (a stub simplification —
    * real containers interleave; the per-track tables are still
    * independently walked). Output: (id, bin). */
  def encodeMp4Sampled(df: DataFrame, idCol: String, payloadCol: String,
                       tracksCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"),
        col(tracksCol).cast("int"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions(_.map { case (id, payload0, nTracks) =>
        val payload = if (payload0 == null) Array.empty[Byte] else payload0
        val n = payload.length
        val nSamples = (n + 31) / 32
        val nChunks = (nSamples + 3) / 4
        def boxOf(t: String, body: Array[Byte]): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream()
          val size = 8L + body.length
          b.write(((size >> 24) & 0xFF).toInt); b.write(((size >> 16) & 0xFF).toInt)
          b.write(((size >> 8) & 0xFF).toInt); b.write((size & 0xFF).toInt)
          t.foreach(c => b.write(c.toInt))
          b.write(body, 0, body.length)
          b.toByteArray
        }
        def largeBoxOf(t: String, body: Array[Byte]): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream()
          b.write(0); b.write(0); b.write(0); b.write(1)
          t.foreach(c => b.write(c.toInt))
          val size = 16L + body.length
          var i = 56
          while (i >= 0) { b.write(((size >> i) & 0xFF).toInt); i -= 8 }
          b.write(body, 0, body.length)
          b.toByteArray
        }
        def bytesOf(write: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream(); write(b); b.toByteArray
        }
        def w32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
          b.write(((v >> 24) & 0xFF).toInt); b.write(((v >> 16) & 0xFF).toInt)
          b.write(((v >> 8) & 0xFF).toInt); b.write((v & 0xFF).toInt)
        }
        val durMs = nSamples * 40L
        val ftyp = boxOf("ftyp", bytesOf { b =>
          "isom".foreach(c => b.write(c.toInt)); w32(b, 0)
          "isom".foreach(c => b.write(c.toInt))
        })
        val free = boxOf("free", Array.fill[Byte](12)(0x5A))
        // moov depends on stco which depends on where mdat's body
        // starts which (odd ids) depends on moov's size — but moov's
        // SIZE is offset-independent, so assemble once with zero
        // offsets to measure, then again with the real ones
        def moovOf(mdatBodyStart: Long): Array[Byte] = {
          val mvhd = boxOf("mvhd", bytesOf { b =>
            b.write(0); b.write(0); b.write(0); b.write(0)
            w32(b, 0); w32(b, 0)
            w32(b, 1000); w32(b, durMs)
            w32(b, 0x00010000); b.write(1); b.write(0)
            (0 until 10).foreach(_ => b.write(0))
            Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
              .foreach(w32(b, _))
            (0 until 24).foreach(_ => b.write(0))
            w32(b, nTracks + 1L)
          })
          val traks = (0 until nTracks).map { ti =>
            val tkhd = boxOf("tkhd", bytesOf { b =>
              b.write(0); b.write(0); b.write(0); b.write(7)
              w32(b, 0); w32(b, 0); w32(b, ti + 1L); w32(b, 0); w32(b, durMs)
              (0 until 8).foreach(_ => b.write(0))          // reserved
              (0 until 8).foreach(_ => b.write(0))          // layer..volume+res
              Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
                .foreach(w32(b, _))
              w32(b, 320L << 16); w32(b, 180L << 16)
            })
            val mdhd = boxOf("mdhd", bytesOf { b =>
              b.write(0); b.write(0); b.write(0); b.write(0)
              w32(b, 0); w32(b, 0)
              w32(b, 1000); w32(b, durMs)                   // timescale, duration
              b.write(0); b.write(0); b.write(0); b.write(0) // lang + pre_defined
            })
            val stts = boxOf("stts", bytesOf { b =>
              w32(b, 0); w32(b, if (nSamples > 0) 1L else 0L)
              if (nSamples > 0) { w32(b, nSamples); w32(b, 40L) }
            })
            // ODD track ids carry a ctts (composition offsets — what
            // B-frame media writes): every sample presents 25 media
            // units after it decodes. One run covering all samples.
            val ctts =
              if ((ti + 1) % 2 == 1 && nSamples > 0)
                boxOf("ctts", bytesOf { b =>
                  w32(b, 0); w32(b, 1L); w32(b, nSamples); w32(b, 25L)
                })
              else Array.empty[Byte]
            // track ids divisible by 3 carry an edit list shifting
            // presentation 20 media units earlier (media_time = 20,
            // rate 1.0) — the elst form a trimmed capture writes
            val edts =
              if ((ti + 1) % 3 == 0 && nSamples > 0)
                boxOf("edts", boxOf("elst", bytesOf { b =>
                  w32(b, 0); w32(b, 1L)
                  w32(b, durMs); w32(b, 20L); w32(b, 0x00010000L)
                }))
              else Array.empty[Byte]
            val stsc = boxOf("stsc", bytesOf { b =>
              w32(b, 0); w32(b, if (nChunks > 0) 1L else 0L)
              if (nChunks > 0) { w32(b, 1L); w32(b, 4L); w32(b, 1L) }
            })
            val stsz = boxOf("stsz", bytesOf { b =>
              w32(b, 0); w32(b, 0); w32(b, nSamples)
              (0 until nSamples).foreach(si =>
                w32(b, math.min(32L, n - si * 32L)))
            })
            val stco = boxOf("stco", bytesOf { b =>
              w32(b, 0); w32(b, nChunks)
              (0 until nChunks).foreach(ci =>
                w32(b, mdatBodyStart + ci * 128L))           // 4 samples × 32 B
            })
            boxOf("trak", tkhd ++ edts ++ boxOf("mdia",
              mdhd ++ boxOf("minf",
                boxOf("stbl", stts ++ ctts ++ stsc ++ stsz ++ stco))))
          }
          boxOf("moov", (Seq(mvhd) ++ traks).reduce(_ ++ _))
        }
        val moovLen = moovOf(0L).length
        val bytes =
          if (id % 2 == 0) {
            val bodyStart = ftyp.length + free.length + 16L // largesize hdr
            ftyp ++ free ++ largeBoxOf("mdat", payload) ++ moovOf(bodyStart)
          } else {
            val bodyStart = ftyp.length + free.length + moovLen + 8L
            ftyp ++ free ++ moovOf(bodyStart) ++ boxOf("mdat", payload)
          }
        (id, bytes)
      }).toDF("id", "bin")
  }

  /** HEADER-ONLY sample map: walk moov→trak→mdia→{mdhd, minf→stbl→
    * {stts, stsc, stsz, stco}} and join the four tables into one row
    * per sample — (chunk from stsc run-lengths + stco count, size from
    * stsz, pts from cumulative stts in mdhd-timescale ms, offset from
    * stco + intra-chunk size sum) — without touching a byte of sample
    * data. Offsets are emitted RELATIVE to the mdat body (found
    * during the same walk), which both ports the map across file
    * relocation and end-to-end-verifies stco: the stub wrote
    * `mdat_start + rel`, the walker recovers `rel` by subtracting the
    * mdat it found, so either side being wrong breaks the match.
    *
    * Hostile posture (the m11/m13 contract): every count is bounded
    * against its box's REMAINING BYTES before any allocation, the four
    * tables must agree (stts total == stsz count; chunks == stco
    * count), and every resolved sample range must land inside the
    * mdat body — ANY violation aborts that document to ZERO rows
    * (a sample map, unlike a profile, has no 'unknown' row shape);
    * the job never throws. */
  def mp4SampleMap(df: DataFrame, idCol: String, binCol: String)
      : Dataset[SampleRef] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, raw) => sampleMapOf(id, raw) })
  }

  /** Per-document walk behind [[mp4SampleMap]]; also feeds
    * [[mp4SampleDemux]] (which slices the SAME ranges out of mdat). */
  private def sampleMapOf(id: Long, raw: Array[Byte])
      : Seq[SampleRef] = {
    val b = if (raw == null) Array.empty[Byte] else raw
    val n = b.length.toLong
    @inline def u(i: Long): Int = b(i.toInt) & 0xFF
    @inline def be32(i: Long): Long =
      (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    @inline def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    @inline def fourcc(i: Long): String =
      new String(Array(u(i), u(i + 1), u(i + 2), u(i + 3)).map(_.toChar))
    var bad = false
    var mdatFrom = -1L
    var mdatTo = -1L
    val out = Seq.newBuilder[SampleRef]
    def walk(from: Long, to: Long)(visit: (String, Long, Long) => Unit): Unit = {
      var p = from
      while (!bad && p + 8 <= to) {
        val sz0 = be32(p)
        val t = fourcc(p + 4)
        val (hdr, sz) =
          if (sz0 == 1L) {
            if (p + 16 > to) { bad = true; (16L, 0L) }
            else (16L, be64(p + 8))
          } else if (sz0 == 0L) (8L, to - p)
          else (8L, sz0)
        if (!bad) {
          if (sz < hdr || sz > to - p) bad = true
          else { visit(t, p + hdr, p + sz); p += sz }
        }
      }
      if (p < to) bad = true
    }
    // a full-box table at [from, to): version+flags, then entry data;
    // every read below re-checks its bound so a hostile count can
    // never index past the box (let alone the array)
    def tableEntries(from: Long, to: Long): Long =
      if (to - from < 8) { bad = true; 0L } else be32(from + 4)
    // PHASE 1 — locate: stco offsets resolve against mdat, which in
    // the post-moov layout the walk has not reached yet while inside
    // moov; find both top-level ranges first, process moov second
    var moovFrom = -1L
    var moovTo = -1L
    walk(0L, n) { (t, cFrom, cTo) =>
      t match {
        case "mdat" => mdatFrom = cFrom; mdatTo = cTo
        case "moov" => moovFrom = cFrom; moovTo = cTo
        case _ => ()
      }
    }
    // PHASE 2 — per-track sample tables
    if (!bad && moovFrom >= 0) {
      // movie timescale first (mvhd): elst EMPTY-EDIT durations are
      // recorded in it, not the track's media timescale
      var movieTs = 1000L
      walk(moovFrom, moovTo) { (ct, mFrom, mTo) =>
        if (ct == "mvhd" && mTo - mFrom >= 20) {
          val v = u(mFrom)
          val ts = if (v == 1) be32(mFrom + 20) else be32(mFrom + 12)
          if (ts > 0) movieTs = ts
        }
      }
      walk(moovFrom, moovTo) { (ct, mFrom, mTo) =>
          if (ct == "trak") {
            var trackId = -1L
            var stts = Seq.empty[(Long, Long)]   // (count, delta)
            var ctts = Seq.empty[(Long, Long)]   // (count, offset) signed
            var stsc = Seq.empty[(Long, Long)]   // (first_chunk, per_chunk)
            var sizes = Array.empty[Long]
            var stco = Array.empty[Long]
            var timescale = 1000L
            var elstShift = 0L                   // media units
            var elstDelayMovie = 0L              // MOVIE units (empty edits)
            // valid-but-unsupported edit shapes (multi-segment,
            // non-1.0 rate) skip THIS track only — they are not
            // hostile, so they must not zero the whole document
            var trackSkip = false
            walk(mFrom, mTo) { (tt, kFrom, kTo) =>
              tt match {
                case "tkhd" if kTo - kFrom >= 84 =>
                  val v = u(kFrom)
                  trackId = if (v == 1) be32(kFrom + 20) else be32(kFrom + 12)
                case "edts" => walk(kFrom, kTo) { (et, eFrom, eTo) =>
                  if (et == "elst") {
                    if (eTo - eFrom < 8) bad = true
                    else {
                      val v = u(eFrom)
                      val ec = be32(eFrom + 4)
                      val esz = if (v == 1) 20L else 12L
                      if (ec < 0 || eFrom + 8 + ec * esz > eTo) bad = true
                      else {
                        var seenShift = false
                        var i = 0L
                        while (!bad && !trackSkip && i < ec) {
                          val p = eFrom + 8 + i * esz
                          val (segDur, mediaT, rate) =
                            if (v == 1) (be64(p), be64(p + 8), be32(p + 16))
                            else {
                              val mt0 = be32(p + 4)
                              (be32(p), if (mt0 > Int.MaxValue)
                                mt0 - 0x100000000L else mt0, be32(p + 8))
                            }
                          if (mediaT == -1L) elstDelayMovie += segDur
                          else if (mediaT < 0 || rate != 0x00010000L)
                            trackSkip = true // dwell / reverse: unsupported
                          else if (!seenShift) {
                            elstShift = mediaT; seenShift = true
                          } else trackSkip = true // multi-segment edit
                          i += 1
                        }
                      }
                    }
                  }
                }
                case "mdia" => walk(kFrom, kTo) { (dt, dFrom, dTo) =>
                  dt match {
                    case "mdhd" if dTo - dFrom >= 20 =>
                      val v = u(dFrom)
                      val ts = if (v == 1) be32(dFrom + 20) else be32(dFrom + 12)
                      if (ts > 0) timescale = ts else bad = true
                    case "minf" => walk(dFrom, dTo) { (ft, fFrom, fTo) =>
                      if (ft == "stbl") walk(fFrom, fTo) { (st, sFrom, sTo) =>
                        st match {
                          // stts/stsc entry counts are box-bounded, but
                          // each 8/12-byte entry materializes as a ~48 B
                          // tuple — bound the count against the (already
                          // located) mdat body too, BEFORE allocating:
                          // every stts entry covers ≥1 sample and every
                          // stsc run ≥1 chunk, and samples/chunks cannot
                          // exceed mdat's byte count — matching stsz's
                          // fixed-size posture, so a hostile-but-box-
                          // bounded count can no longer amplify ~6x into
                          // tuples
                          case "stts" =>
                            val ec = tableEntries(sFrom, sTo)
                            if (ec < 0 || sFrom + 8 + ec * 8 > sTo ||
                                (ec > 0 && (mdatFrom < 0 ||
                                  ec > mdatTo - mdatFrom))) bad = true
                            else stts = (0L until ec).map(i =>
                              (be32(sFrom + 8 + i * 8), be32(sFrom + 12 + i * 8)))
                          // composition offsets (round 14): pts = dts +
                          // offset; version 1 offsets are SIGNED. Same
                          // mdat-bounded allocation posture as stts.
                          case "ctts" =>
                            val v = u(sFrom)
                            val ec = tableEntries(sFrom, sTo)
                            if (ec < 0 || sFrom + 8 + ec * 8 > sTo ||
                                (ec > 0 && (mdatFrom < 0 ||
                                  ec > mdatTo - mdatFrom))) bad = true
                            else ctts = (0L until ec).map { i =>
                              val off0 = be32(sFrom + 12 + i * 8)
                              val off = if (v == 1 && off0 > Int.MaxValue)
                                off0 - 0x100000000L else off0
                              (be32(sFrom + 8 + i * 8), off)
                            }
                          case "stsc" =>
                            val ec = tableEntries(sFrom, sTo)
                            if (ec < 0 || sFrom + 8 + ec * 12 > sTo ||
                                (ec > 0 && (mdatFrom < 0 ||
                                  ec > mdatTo - mdatFrom))) bad = true
                            else stsc = (0L until ec).map(i =>
                              (be32(sFrom + 8 + i * 12), be32(sFrom + 12 + i * 12)))
                          case "stsz" =>
                            if (sTo - sFrom < 12) bad = true
                            else {
                              val fixed = be32(sFrom + 4)
                              val sc = be32(sFrom + 8)
                              // fixed-size counts are NOT bounded by the
                              // box, so a hostile count must be caught
                              // before allocation: the samples must fit
                              // in the (already located) mdat body
                              if ((fixed == 0L && sFrom + 12 + sc * 4 > sTo) ||
                                  (fixed != 0L && (mdatFrom < 0 ||
                                    sc > (mdatTo - mdatFrom) / fixed)))
                                bad = true
                              else sizes =
                                if (fixed != 0L) Array.fill(sc.toInt)(fixed)
                                else Array.tabulate(sc.toInt)(i =>
                                  be32(sFrom + 12 + i * 4L))
                            }
                          case "stco" =>
                            val ec = tableEntries(sFrom, sTo)
                            if (ec < 0 || sFrom + 8 + ec * 4 > sTo) bad = true
                            else stco = Array.tabulate(ec.toInt)(i =>
                              be32(sFrom + 8 + i * 4L))
                          // 64-bit chunk offsets — what a >4 GiB capture
                          // actually writes; same table, wider entries
                          case "co64" =>
                            val ec = tableEntries(sFrom, sTo)
                            if (ec < 0 || sFrom + 8 + ec * 8 > sTo) bad = true
                            else stco = Array.tabulate(ec.toInt)(i =>
                              be64(sFrom + 8 + i * 8L))
                          case _ => ()
                        }
                      }
                    }
                    case _ => ()
                  }
                }
                case _ => ()
              }
            }
            if (!bad && !trackSkip && trackId > 0 && sizes.nonEmpty) {
              // cross-table agreement: stts total must cover stsz
              // count, and a PRESENT ctts must cover it too
              val sttsTotal = stts.map(_._1).sum
              // a ZERO-COUNT run is hostile even when the totals still
              // match: the walk's run pointers advance on `left == 0`
              // AFTER a decrement, so a 0-count run would start at -1
              // and never advance — every later sample silently reads
              // run 0's value. Reject the table instead (the same
              // degrade-to-zero-rows posture as every other hostile
              // shape here).
              if (sttsTotal != sizes.length || stsc.isEmpty || stco.isEmpty ||
                  stts.exists(_._1 <= 0) || ctts.exists(_._1 <= 0) ||
                  (ctts.nonEmpty && ctts.map(_._1).sum != sizes.length))
                bad = true
              else {
                // samples → chunks via stsc run-lengths (entry i rules
                // chunks [first_i, first_{i+1}); last entry to stco
                // end). The run pointer advances MONOTONICALLY with
                // the chunk index — stsc is ordered by first_chunk —
                // so the join is O(chunks + entries), never a rescan
                // per chunk (a one-entry-per-chunk fragmented file
                // would otherwise go quadratic per document).
                var si = 0                         // sample index
                var dts = 0L                       // in media timescale
                var sttsI = 0; var sttsLeft = stts.head._1
                var cttsI = 0                      // ctts run pointer
                var cttsLeft = if (ctts.isEmpty) 0L else ctts.head._1
                // elst: presentation = composition − shift + delay
                // (empty-edit durations convert movie → media units)
                val delayMedia = elstDelayMovie * timescale / movieTs
                var ci = 0
                var scI = 0                        // stsc run pointer
                if (stsc.head._1 != 1L) bad = true // no rule for chunk 1
                while (!bad && ci < stco.length && si < sizes.length) {
                  while (scI + 1 < stsc.length && stsc(scI + 1)._1 <= ci + 1)
                    scI += 1
                  val perChunk = stsc(scI)._2
                  if (perChunk <= 0) bad = true
                  var intra = 0L
                  var k = 0L
                  while (!bad && k < perChunk && si < sizes.length) {
                    val sz = sizes(si)
                    val abs = stco(ci) + intra
                    val rel = abs - mdatFrom
                    // pts: decode time + this run's composition offset,
                    // shifted by the edit list
                    val ptsMedia = dts +
                      (if (ctts.isEmpty) 0L else ctts(cttsI)._2) -
                      elstShift + delayMedia
                    // abs < 0 first (a hostile co64 top-bit offset, or
                    // offset+intra wrap); then bound sz against the
                    // REMAINING mdat bytes — `abs + sz` itself can
                    // wrap past Long.MaxValue for a large POSITIVE
                    // offset (the same trap as the box walk's p + sz),
                    // while `mdatTo - abs` cannot overflow once both
                    // are non-negative. dts/pts are bounded before the
                    // ms conversion multiply for the same reason (a
                    // hostile unsigned ctts offset lands here).
                    if (sz < 0 || abs < 0 || mdatFrom < 0 || rel < 0 ||
                        sz > mdatTo - abs ||
                        dts > Long.MaxValue / 1000L ||
                        math.abs(ptsMedia) > Long.MaxValue / 1000L) bad = true
                    else {
                      out += SampleRef(id, trackId, si.toLong, ci.toLong,
                        sz, dts * 1000L / timescale,
                        ptsMedia * 1000L / timescale, rel)
                      // advance dts through the stts runs (and the
                      // composition pointer through the ctts runs —
                      // both monotone, O(samples + entries))
                      dts += stts(sttsI)._2
                      sttsLeft -= 1
                      if (sttsLeft == 0 && sttsI + 1 < stts.length) {
                        sttsI += 1; sttsLeft = stts(sttsI)._1
                      }
                      if (ctts.nonEmpty) {
                        cttsLeft -= 1
                        if (cttsLeft == 0 && cttsI + 1 < ctts.length) {
                          cttsI += 1; cttsLeft = ctts(cttsI)._1
                        }
                      }
                      intra += sz; si += 1
                    }
                    k += 1
                  }
                  ci += 1
                }
                if (si < sizes.length) bad = true  // chunks ran out early
              }
            }
          }
      }
    }
    if (bad) Seq.empty else out.result()
  }

  /** Container-real demux: resolve each sample's byte range through
    * the HEADER walk ([[sampleMapOf]]) and slice it out of the mdat
    * body — the m3 frame-sampling semantics driven by the container's
    * OWN sample tables instead of raw-payload arithmetic. Emits exact
    * per-sample byte sums so the full walk+slice pipeline is
    * oracle-verifiable. `track` selects one track (every track maps
    * the same region in the stub; a real file differs per track).
    * Malformed containers contribute zero rows, never an exception. */
  def mp4SampleDemux(df: DataFrame, idCol: String, binCol: String,
                     track: Long = 1L): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, raw) =>
        val refs = sampleMapOf(id, raw).filter(_.track_id == track)
        if (refs.isEmpty) Iterator.empty
        else {
          // re-locate mdat once — the LAST top-level mdat, exactly as
          // the map walk recorded it (phase 1 overwrites on each hit;
          // stopping at the FIRST of several mdat boxes would slice
          // validated refs from the wrong region, silently)
          val b = raw
          @inline def u(i: Long): Int = b(i.toInt) & 0xFF
          @inline def be32(i: Long): Long =
            (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
          @inline def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
          var mdatFrom = -1L
          var p = 0L
          val n = b.length.toLong
          while (p + 8 <= n) {
            val sz0 = be32(p)
            val t = new String(Array(u(p + 4), u(p + 5), u(p + 6), u(p + 7))
              .map(_.toChar))
            val (hdr, sz) =
              if (sz0 == 1L && p + 16 <= n) (16L, be64(p + 8))
              else if (sz0 == 0L) (8L, n - p) else (8L, sz0)
            if (sz < hdr || sz > n - p) p = n // bail (validated already)
            else {
              if (t == "mdat") mdatFrom = p + hdr
              p += sz
            }
          }
          refs.iterator.map { r =>
            var s = 0L
            var i = mdatFrom + r.rel_offset
            val end = i + r.size
            while (i < end) { s += u(i); i += 1 }
            (r.doc_id, r.track_id, r.sample_idx, r.pts_ms, r.size, s)
          }
        }
      }).toDF("doc_id", "track_id", "sample_idx", "pts_ms", "n_bytes", "byte_sum")
  }
}
