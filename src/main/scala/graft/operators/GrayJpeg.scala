package graft.operators

/** Pure-Scala BASELINE JPEG codec for 8-bit grayscale rasters — the
  * engine-deterministic lossy tier: encode and decode are plain
  * integer + double arithmetic in fixed evaluation order, with the
  * DCT basis built from `StrictMath.cos` (fdlibm — bit-identical on
  * every platform) and Java 17+ strict floating-point semantics
  * (JEP 306), so `decode(encode(x))` is BIT-IDENTICAL across JVMs,
  * vendors, and architectures. This retires the round-10 caveat where
  * the lossy tier rode `javax.imageio` and cross-JVM IDCT rounding
  * could not be promised.
  *
  * Interchange-format notes (all public JPEG/JFIF structure):
  *  - Output is a conformant baseline JFIF stream (SOI, APP0, DQT,
  *    SOF0, DHT×2, SOS, entropy data with 0xFF00 stuffing, EOI) that
  *    ANY decoder reads — a spec cross-checks ImageIO agrees on
  *    geometry and near-agrees on pixels.
  *  - Huffman tables are our own CANONICAL fixed-length tables (every
  *    DC symbol 4 bits, every AC symbol 8 bits, all-ones codes left
  *    unassigned as the format requires). Valid tables any decoder
  *    accepts; compression ratio is irrelevant here — determinism and
  *    simplicity are the contract. The decoder implements general
  *    canonical-table decoding, not a shortcut for our tables.
  *  - Single component, no subsampling, no restart markers on encode
  *    (DRI/RSTn are handled on decode). */
object GrayJpeg {

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex-K luminance base table scaled to quality 85
    * (q = max(1, (base·30 + 50) / 100)) — small enough that a gray
    * raster's mean luma survives within a fraction of a level. */
  private val Quant: Array[Int] = {
    val base = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    base.map(b => math.max(1, (b * 30 + 50) / 100))
  }

  // canonical fixed-length tables: (bits per code length 1..16, vals)
  private val DcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    (0 +: (for (run <- 0 to 15; size <- 1 to 10) yield run * 16 + size)
      :+ 0xF0).toArray.sorted

  /** canonical code assignment: symbol → (code, length) */
  private def encTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(vi) -> (code, len); code += 1; vi += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val DcEnc = encTable(DcBits, DcVals)
  private lazy val AcEnc = encTable(AcBits, AcVals)

  /** DCT basis: cos((2x+1)·u·π/16) via StrictMath (cross-platform
    * bit-exact), with the 1/2·C(u) normalization folded in. */
  private val Cos: Array[Array[Double]] = {
    val t = Array.ofDim[Double](8, 8)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x)(u) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) StrictMath.sqrt(0.125) else 0.5)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nb = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nb += 1
        if (nb == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    def flush(): Array[Byte] = {
      if (nb > 0) {
        acc = (acc << (8 - nb)) | ((1 << (8 - nb)) - 1) // pad with 1s
        out.write(acc)
        if (acc == 0xFF) out.write(0x00)
        acc = 0; nb = 0
      }
      out.toByteArray
    }
  }

  private def magnitude(v: Int): Int = {
    var size = 0; var a = math.abs(v)
    while (a != 0) { size += 1; a >>= 1 }
    size
  }

  /** Encode a gray raster (byte i = pixel i, row-major, `width` wide;
    * the last partial block pads by edge replication). */
  def encode(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad geometry ${width}x$height")
    require(pixels.length >= width * height, "raster shorter than geometry")
    val bw = new BitWriter
    @inline def px(x: Int, y: Int): Int = {
      val xx = if (x >= width) width - 1 else x
      val yy = if (y >= height) height - 1 else y
      pixels(yy * width + xx) & 0xFF
    }
    val blocksX = (width + 7) / 8; val blocksY = (height + 7) / 8
    val f = new Array[Double](64); val g = new Array[Double](64)
    val q = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        // FDCT: F(u,v) = (1/4)·Cstd(u)Cstd(v) · ΣΣ (p-128)·cos… with
        // the 1/4 folded into C (C(u) = Cstd(u)/2). SEPARABLE —
        // rows then columns, 4× fewer multiplies than the direct 2D
        // form — in a fixed order, so still bit-deterministic (the
        // goldens pin THIS order).
        var y0 = 0
        while (y0 < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var x = 0
            while (x < 8) {
              s += (px(bx * 8 + x, by * 8 + y0) - 128) * Cos(x)(v)
              x += 1
            }
            g(y0 * 8 + v) = s
            v += 1
          }
          y0 += 1
        }
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var y = 0
            while (y < 8) {
              s += g(y * 8 + v) * Cos(y)(u)
              y += 1
            }
            f(u * 8 + v) = C(u) * C(v) * s
            v += 1
          }
          u += 1
        }
        var i = 0
        while (i < 64) {
          val d = f(i) / Quant(i)
          q(i) = Math.round(d).toInt // half-up in double: deterministic
          i += 1
        }
        // DC: differential, then size category + magnitude bits
        val diff = q(0) - prevDc; prevDc = q(0)
        val dsz = magnitude(diff)
        val (dc, dl) = DcEnc(dsz)
        bw.put(dc, dl)
        if (dsz > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << dsz) - 1, dsz)
        // AC: run-length of zeros in zigzag order
        var run = 0; var k = 1
        while (k < 64) {
          val v = q(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) { val (zc, zl) = AcEnc(0xF0); bw.put(zc, zl); run -= 16 }
            val sz = magnitude(v)
            val (ac, al) = AcEnc(run * 16 + sz)
            bw.put(ac, al)
            bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = AcEnc(0x00); bw.put(ec, el) } // EOB
        bx += 1
      }
      by += 1
    }
    val entropy = bw.flush()

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    "JFIF".getBytes("US-ASCII").foreach(b => u8(b)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xDB); u16(2 + 1 + 64); u8(0) // DQT, Pq=0 Tq=0, zigzag order
    var zi = 0
    while (zi < 64) { u8(Quant(Zigzag(zi))); zi += 1 }
    marker(0xC0); u16(2 + 6 + 3) // SOF0: 8-bit, 1 component, 1x1
    u8(8); u16(height); u16(width); u8(1); u8(1); u8(0x11); u8(0)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length); u8(cls << 4)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, DcBits, DcVals); dht(1, AcBits, AcVals)
    marker(0xDA); u16(2 + 1 + 2 + 3) // SOS
    u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    out.write(entropy)
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ───────────────────────────── decode ─────────────────────────────

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical mincode/maxcode/valptr decode (general, any DHT)
    val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var vi = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = vi; minCode(l) = code
          code += bits(l - 1); vi += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(b: Array[Byte], var p: Int) {
    private var acc = 0; private var nb = 0
    /** next bit; at a stuffed 0xFF00 skips the 0x00; at a marker
      * (0xFF followed by non-zero) stops and reports via `atMarker`. */
    var atMarker = false
    def bit(): Int = {
      if (nb == 0) {
        if (p >= b.length) { atMarker = true; return 0 }
        var v = b(p) & 0xFF; p += 1
        if (v == 0xFF) {
          if (p < b.length && b(p) == 0) p += 1 // stuffing
          else { atMarker = true; p -= 1; return 0 }
          v = 0xFF
        }
        acc = v; nb = 8
      }
      nb -= 1
      (acc >> nb) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignAndSkipRst(): Unit = { nb = 0; atMarker = false; p += 2 }
    def decode(t: HuffTable): Int = {
      var len = 1; var code = bit()
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit(); len += 1
      }
      require(len <= 16 && !atMarker, "corrupt Huffman stream")
      t.value(len, code)
    }
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  /** Decode a baseline single-component 8-bit JPEG produced by any
    * conformant encoder → (width, height, gray raster). Throws on
    * progressive, multi-component, or 12-bit streams. */
  def decode(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8,
      "not a JPEG")
    var p = 2
    val quant = Array.fill(4)(null: Array[Int])
    val dcT = Array.fill(4)(null: HuffTable)
    val acT = Array.fill(4)(null: HuffTable)
    var w = 0; var h = 0; var tq = 0; var restartInterval = 0
    var sosAt = -1; var dcSel = 0; var acSel = 0
    def u16(i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    while (sosAt < 0 && p + 4 <= b.length) {
      require((b(p) & 0xFF) == 0xFF, s"expected marker at $p")
      val m = b(p + 1) & 0xFF
      if (m == 0xFF) { p += 1 }
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { p += 2 }
      else {
        val len = u16(p + 2)
        m match {
          case 0xDB =>
            var q = p + 4
            while (q < p + 2 + len) {
              require((b(q) & 0xF0) == 0, "only 8-bit quant tables")
              val id = b(q) & 0x0F
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) { t(Zigzag(i)) = b(q + 1 + i) & 0xFF; i += 1 }
              quant(id) = t; q += 65
            }
          case 0xC4 =>
            var q = p + 4
            while (q < p + 2 + len) {
              val cls = (b(q) & 0xF0) >> 4; val id = b(q) & 0x0F
              val bits = Array.tabulate(16)(i => b(q + 1 + i) & 0xFF)
              val n = bits.sum
              val vals = Array.tabulate(n)(i => b(q + 17 + i) & 0xFF)
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcT(id) = t else acT(id) = t
              q += 17 + n
            }
          case 0xC0 =>
            require((b(p + 4) & 0xFF) == 8, "only 8-bit baseline")
            h = u16(p + 5); w = u16(p + 7)
            require((b(p + 9) & 0xFF) == 1, "only single-component gray")
            tq = b(p + 12) & 0x0F
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            throw new IllegalArgumentException(
              f"unsupported SOF marker 0xFF$m%02X (not baseline sequential)")
          case 0xDD => restartInterval = u16(p + 4)
          case 0xDA =>
            require((b(p + 4) & 0xFF) == 1, "SOS must carry 1 component")
            dcSel = (b(p + 6) & 0xF0) >> 4; acSel = b(p + 6) & 0x0F
            sosAt = p + 2 + len
          case _ => // APPn/COM/etc: skip
        }
        if (sosAt < 0) p += 2 + len
      }
    }
    require(sosAt > 0 && w > 0 && h > 0, "no SOS/SOF found")
    val qt = quant(tq); val dct = dcT(dcSel); val act = acT(acSel)
    require(qt != null && dct != null && act != null, "missing tables")

    val blocksX = (w + 7) / 8; val blocksY = (h + 7) / 8
    val out = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val br = new BitReader(b, sosAt)
    var prevDc = 0; var blocksDone = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && blocksDone > 0 &&
          blocksDone % restartInterval == 0) {
          br.alignAndSkipRst(); prevDc = 0
        }
        java.util.Arrays.fill(coef, 0)
        val dsz = br.decode(dct)
        prevDc += extend(br.bits(dsz), dsz)
        coef(0) = prevDc * qt(0)
        var k = 1
        while (k < 64) {
          val rs = br.decode(act)
          val run = rs >> 4; val sz = rs & 0x0F
          if (sz == 0) {
            if (run == 15) k += 16 // ZRL
            else k = 64 // EOB
          } else {
            k += run
            require(k < 64, "AC index overflow")
            coef(Zigzag(k)) = extend(br.bits(sz), sz) * qt(Zigzag(k))
            k += 1
          }
        }
        // IDCT: p(x,y) = ΣΣ C(u)C(v)·F(u,v)·cos… — SEPARABLE
        // (T(u,x) = Σ_v C(v)F(u,v)cos(x,v); p = Σ_u C(u)T(u,x)cos(y,u))
        // in a fixed order: bit-deterministic, goldens pin this order
        var u0 = 0
        while (u0 < 8) {
          var x = 0
          while (x < 8) {
            var s = 0.0
            var v = 0
            while (v < 8) {
              s += C(v) * coef(u0 * 8 + v) * Cos(x)(v)
              v += 1
            }
            tmp(u0 * 8 + x) = s
            x += 1
          }
          u0 += 1
        }
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var s = 0.0
            var u = 0
            while (u < 8) {
              s += C(u) * tmp(u * 8 + x) * Cos(y)(u)
              u += 1
            }
            val px = bx * 8 + x; val py = by * 8 + y
            if (px < w && py < h) {
              val lv = Math.round(s).toInt + 128
              out(py * w + px) =
                (if (lv < 0) 0 else if (lv > 255) 255 else lv).toByte
            }
            x += 1
          }
          y += 1
        }
        blocksDone += 1
        bx += 1
      }
      by += 1
    }
    (w, h, out)
  }
}
