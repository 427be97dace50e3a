package graft.ops

/** Baseline JFIF/JPEG codec in pure JVM code — no external libraries.
  *
  * Scope (the baseline-sequential subset):
  *  - encode: 8-bit grayscale (1 component) or YCbCr 4:4:4 (3 components),
  *    flat quantization tables (quality knob = the flat value), custom
  *    canonical Huffman tables carried in DHT exactly as the format
  *    requires (fixed-length canonical codes — valid JPEG, simple spec);
  *  - decode: any baseline-sequential (SOF0) stream with 8-bit samples
  *    and 1x1 sampling (no chroma subsampling), reading DQT/DHT tables
  *    from the stream (so it is not limited to this encoder's tables);
  *    progressive (SOF2), subsampled, arithmetic-coded and
  *    restart-interval streams are rejected with the codec family's
  *    IllegalArgumentException.
  *
  * Exactness: JPEG is lossy, but an image whose 8x8 blocks are each
  * UNIFORM is reproduced bit-exactly by this codec at flat quant 1 for
  * grayscale: a constant block has every AC coefficient exactly zero
  * (float residue << 0.5 rounds away) and a DC that survives the
  * round-trip exactly — the `jpeg_roundtrip` driver query exploits this
  * so a pure-arithmetic DuckDB oracle can prove real compression and
  * exact inversion without seeing a byte. Non-uniform content
  * round-trips within +-2/channel (property-spec-pinned), which is the
  * honest lossy behavior of a real JPEG.
  */
object Jpeg {

  def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 &&
      (p(2) & 0xFF) == 0xFF

  // Zigzag scan: natural-order index of each zigzag position.
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTbl: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = Math.cos((2 * x + 1) * u * Math.PI / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / Math.sqrt(2.0)

  /** Separable 2D DCT-II of a level-shifted 8x8 block (JPEG normalization). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosTbl(u * 8 + x); x += 1 }
        tmp(y * 8 + u) = s * (if (u == 0) InvSqrt2 else 1.0) / 2.0
        u += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) { // columns
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y2 = 0
        while (y2 < 8) { s += tmp(y2 * 8 + u) * CosTbl(v * 8 + y2); y2 += 1 }
        out(v * 8 + u) = s * (if (v == 0) InvSqrt2 else 1.0) / 2.0
        v += 1
      }
      u += 1
    }
    out
  }

  /** Separable 2D inverse DCT (JPEG normalization). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows of coefficients -> spatial x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += (if (u == 0) InvSqrt2 else 1.0) * coef(v * 8 + u) * CosTbl(u * 8 + x)
        u += 1
        }
        tmp(v * 8 + x) = s / 2.0
        x += 1
      }
      v += 1
    }
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v2 = 0
        while (v2 < 8) {
          s += (if (v2 == 0) InvSqrt2 else 1.0) * tmp(v2 * 8 + x) * CosTbl(v2 * 8 + y)
          v2 += 1
        }
        out(y * 8 + x) = s / 2.0
        y += 1
      }
      x += 1
    }
    out
  }

  // ---- canonical Huffman tables ----
  // Encoder spec: fixed-length canonical codes (DC: 12 symbols at 4 bits;
  // AC: 162 symbols at 8 bits) — incomplete trees, valid per the format.

  private final class HuffSpec(val bits: Array[Int], val vals: Array[Int]) {
    // code of vals(i) = i at the (single) length — canonical assignment.
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0
      var len = 1
      var idx = 0
      while (len <= 16) {
        var c = 0
        while (c < bits(len - 1)) {
          codeOf(vals(idx)) = code
          lenOf(vals(idx)) = len
          code += 1; idx += 1; c += 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  private val DcSpec = new HuffSpec(
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    (0 until 12).toArray)
  private val AcSpec = new HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0),
    ((1 to 10).map(s => 0x00 * 16 + s) ++ // run 0, sizes 1..10 first
      (1 to 15).flatMap(r => (1 to 10).map(s => (r << 4) | s)) :+ 0x00 :+ 0xF0)
      .toArray)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      buf = (buf << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((buf >> (n - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per the spec
      val b = (((buf << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xFF).toInt
      out.write(b)
      if (b == 0xFF) out.write(0x00)
      n = 0
    }
  }

  private def category(v: Int): Int = {
    var a = Math.abs(v)
    var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Encode interleaved rgb (len = w*h*3) or gray (len = w*h) to baseline
    * JPEG. `quant` is the flat quantization value (1 = near-lossless). */
  def encode(w: Int, h: Int, pixels: Array[Byte], quant: Int = 1): Array[Byte] = {
    val ncomp =
      if (pixels.length == w * h) 1
      else if (pixels.length == w * h * 3) 3
      else throw new IllegalArgumentException(
        s"pixel length ${pixels.length} is neither $w x $h gray nor x3 rgb")
    require(w > 0 && h > 0 && quant >= 1 && quant <= 255, s"bad args $w $h $quant")

    // Color convert to per-component planes (JFIF YCbCr for rgb input).
    val planes = Array.fill(ncomp)(new Array[Int](w * h))
    var i = 0
    while (i < w * h) {
      if (ncomp == 1) planes(0)(i) = pixels(i) & 0xFF
      else {
        val r = pixels(i * 3) & 0xFF
        val g = pixels(i * 3 + 1) & 0xFF
        val b = pixels(i * 3 + 2) & 0xFF
        planes(0)(i) = clamp255(Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
        planes(1)(i) = clamp255(Math.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128).toInt)
        planes(2)(i) = clamp255(Math.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128).toInt)
      }
      i += 1
    }

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    marker(0xD8) // SOI
    seg(0xDB, Array(0x00) ++ Array.fill(64)(quant)) // DQT table 0, flat
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, ncomp) ++
      (1 to ncomp).flatMap(c => Seq(c, 0x11, 0))) // SOF0, 1x1 sampling
    seg(0xC4, Array(0x00) ++ DcSpec.bits ++ DcSpec.vals) // DHT DC 0
    seg(0xC4, Array(0x10) ++ AcSpec.bits ++ AcSpec.vals) // DHT AC 0
    seg(0xDA, Array(ncomp) ++ (1 to ncomp).flatMap(c => Seq(c, 0x00)) ++
      Seq(0, 63, 0)) // SOS

    val bw = new BitWriter(out)
    val prevDc = new Array[Int](ncomp)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        var comp = 0
        while (comp < ncomp) {
          val blk = new Array[Double](64)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              // Edge replication for non-multiple-of-8 dimensions.
              val sx = Math.min(bx * 8 + xx, w - 1)
              val sy = Math.min(by * 8 + yy, h - 1)
              blk(yy * 8 + xx) = planes(comp)(sy * w + sx) - 128.0
              xx += 1
            }
            yy += 1
          }
          val coef = fdct(blk)
          val q = new Array[Int](64)
          var z = 0
          while (z < 64) {
            q(z) = Math.round(coef(Zigzag(z)) / quant).toInt
            z += 1
          }
          // DC
          val diff = q(0) - prevDc(comp)
          prevDc(comp) = q(0)
          val cat = category(diff)
          bw.put(DcSpec.codeOf(cat), DcSpec.lenOf(cat))
          if (cat > 0)
            bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
          // AC
          var run = 0
          z = 1
          while (z < 64) {
            if (q(z) == 0) run += 1
            else {
              while (run >= 16) {
                bw.put(AcSpec.codeOf(0xF0), AcSpec.lenOf(0xF0)); run -= 16
              }
              val acat = category(q(z))
              val sym = (run << 4) | acat
              bw.put(AcSpec.codeOf(sym), AcSpec.lenOf(sym))
              bw.put(if (q(z) < 0) q(z) + (1 << acat) - 1 else q(z), acat)
              run = 0
            }
            z += 1
          }
          if (run > 0) bw.put(AcSpec.codeOf(0x00), AcSpec.lenOf(0x00)) // EOB
          comp += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- decoder ----

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // Canonical mincode/maxcode/valptr decoding tables.
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var idx = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = idx
          minCode(l) = code
          code += bits(l - 1); idx += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(i: Int): Int = vals(i)
  }

  private final class BitReader(data: Array[Byte]) {
    var pos = 0
    private var buf = 0
    private var n = 0
    private var ended = false
    def bit(): Int = {
      if (n == 0) {
        if (ended) { buf = 0; n = 8 } // past EOI: zero padding only
        else {
          require(pos < data.length, "truncated JPEG entropy stream")
          var b = data(pos) & 0xFF
          pos += 1
          if (b == 0xFF) {
            require(pos < data.length, "truncated JPEG entropy stream")
            val m = data(pos) & 0xFF
            if (m == 0x00) pos += 1 // stuffed 0xFF data byte
            else if (m == 0xD9) { ended = true; b = 0 } // EOI (not consumed)
            else throw new IllegalArgumentException(
              f"unexpected marker 0xFF$m%02X inside entropy data")
          }
          buf = b; n = 8
        }
      }
      n -= 1
      (buf >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (code > t.maxCode(l)) {
        require(l < 16, "corrupt Huffman code")
        code = (code << 1) | bit()
        l += 1
      }
      t.value(t.valPtr(l) + code - t.minCode(l))
    }
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  /** Decode a baseline JPEG. Returns (w, h, pixels) — pixels is gray
    * (w*h) for 1-component streams, interleaved RGB (w*h*3) for
    * 3-component ones. */
  def decode(p: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isJpeg(p), "not a JPEG payload")
    var pos = 2
    def u8(): Int = {
      require(pos < p.length, "truncated JPEG"); val v = p(pos) & 0xFF; pos += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = 0; var h = 0
    var ncomp = 0
    var compQ: Array[Int] = null  // quant table id per component
    var compDc: Array[Int] = null // DC huff id per component
    var compAc: Array[Int] = null
    var sosSeen = false

    while (!sosSeen) {
      var m = u8()
      require(m == 0xFF, f"expected marker, got 0x$m%02X")
      m = u8()
      m match {
        case 0xDB =>
          val end = pos + u16() - 2
          while (pos < end) {
            val pqTq = u8()
            require((pqTq >> 4) == 0, "16-bit quant tables unsupported")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = u8(); i += 1 }
            quantTables(pqTq & 0xF) = t
          }
        case 0xC4 =>
          val end = pos + u16() - 2
          while (pos < end) {
            val tcTh = u8()
            val bits = Array.fill(16)(u8())
            val nv = bits.sum
            val vals = Array.fill(nv)(u8())
            val tbl = new HuffTable(bits, vals)
            if ((tcTh >> 4) == 0) dcTables(tcTh & 0xF) = tbl
            else acTables(tcTh & 0xF) = tbl
          }
        case 0xC0 =>
          u16()
          require(u8() == 8, "only 8-bit precision supported")
          h = u16(); w = u16()
          ncomp = u8()
          require(ncomp == 1 || ncomp == 3, s"unsupported component count $ncomp")
          compQ = new Array[Int](ncomp)
          var c = 0
          while (c < ncomp) {
            u8() // component id (assumed in order)
            val samp = u8()
            require(samp == 0x11, f"chroma subsampling (0x$samp%02X) unsupported")
            compQ(c) = u8()
            c += 1
          }
        case 0xC2 => throw new IllegalArgumentException("progressive JPEG unsupported")
        case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          throw new IllegalArgumentException(f"SOF marker 0x$m%02X unsupported")
        case 0xDD => throw new IllegalArgumentException("restart intervals unsupported")
        case 0xDA =>
          u16()
          val ns = u8()
          require(ns == ncomp, s"scan components $ns != $ncomp")
          compDc = new Array[Int](ncomp)
          compAc = new Array[Int](ncomp)
          var c = 0
          while (c < ncomp) {
            u8() // component selector (assumed in order)
            val t = u8()
            compDc(c) = t >> 4; compAc(c) = t & 0xF
            c += 1
          }
          u8(); u8(); u8() // spectral selection + approximation
          sosSeen = true
        case 0xD8 => // stray SOI: ignore
        case _ =>
          // APPn/COM/etc: skip by declared length.
          require(m >= 0xC0, f"bad marker 0x$m%02X")
          pos += u16() - 2
      }
    }
    require(w > 0 && h > 0, "no SOF0 frame header before SOS")

    val br = new BitReader(p)
    br.pos = pos
    val planes = Array.fill(ncomp)(new Array[Int](w * h))
    val prevDc = new Array[Int](ncomp)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        var comp = 0
        while (comp < ncomp) {
          val qt = quantTables(compQ(comp))
          require(qt != null, "missing quant table")
          val dct = dcTables(compDc(comp)); val act = acTables(compAc(comp))
          require(dct != null && act != null, "missing Huffman table")
          val coef = new Array[Double](64)
          val cat = br.decode(dct)
          require(cat <= 11, s"bad DC category $cat")
          prevDc(comp) += extend(br.bits(cat), cat)
          coef(0) = prevDc(comp).toDouble * qt(0)
          var z = 1
          while (z < 64) {
            val sym = br.decode(act)
            if (sym == 0x00) z = 64 // EOB
            else if (sym == 0xF0) z += 16
            else {
              z += sym >> 4
              require(z < 64, "AC run overflow")
              val acat = sym & 0xF
              coef(Zigzag(z)) = extend(br.bits(acat), acat).toDouble * qt(z)
              z += 1
            }
          }
          val blk = idct(coef)
          var yy = 0
          while (yy < 8) {
            val sy = by * 8 + yy
            if (sy < h) {
              var xx = 0
              while (xx < 8) {
                val sx = bx * 8 + xx
                if (sx < w)
                  planes(comp)(sy * w + sx) =
                    clamp255(Math.round(blk(yy * 8 + xx) + 128.0).toInt)
                xx += 1
              }
            }
            yy += 1
          }
          comp += 1
        }
        bx += 1
      }
      by += 1
    }

    if (ncomp == 1) {
      val out = new Array[Byte](w * h)
      var i = 0
      while (i < out.length) { out(i) = planes(0)(i).toByte; i += 1 }
      (w, h, out)
    } else {
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val y = planes(0)(i); val cb = planes(1)(i) - 128; val cr = planes(2)(i) - 128
        out(i * 3) = clamp255(Math.round(y + 1.402 * cr).toInt).toByte
        out(i * 3 + 1) = clamp255(Math.round(y - 0.344136 * cb - 0.714136 * cr).toInt).toByte
        out(i * 3 + 2) = clamp255(Math.round(y + 1.772 * cb).toInt).toByte
        i += 1
      }
      (w, h, out)
    }
  }
}
