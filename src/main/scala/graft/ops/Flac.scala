package graft.ops

/** Pure-JVM FLAC codec (encode + decode), zero dependencies.
  *
  * FLAC (RFC 9639 / the public xiph.org format spec) is — unlike MP3/H.264
  * — fully algorithmic: Rice-coded residuals of fixed or quantized-LPC
  * predictors, with CRC-8/CRC-16 integrity and an MD5 of the unencoded
  * audio in STREAMINFO. No numeric constant tables are needed, so a
  * from-scratch implementation can be verified end-to-end in this
  * container: the codec is LOSSLESS, and the `flac_roundtrip` driver
  * oracle proves exact inversion by re-deriving decoded-sample sums from
  * the synthesis formulas alone.
  *
  * Encoder (real, not a toy): per-frame stereo-mode decision
  * (independent / left-side / right-side / mid-side by exact cost),
  * wasted-bits detection, CONSTANT/VERBATIM/FIXED(0-4)/LPC subframes
  * (LPC via autocorrelation + Levinson-Durbin + coefficient
  * quantization), optimal Rice parameter per partition and partition-
  * order search, table or explicit block-size codes, UTF-8-coded frame
  * numbers, STREAMINFO with audio MD5.
  *
  * Decoder: the full 16-bit-era subset plus 8/12/20/24/32-bit sample
  * sizes, all four channel assignments (1-8 independent channels),
  * both residual methods (4- and 5-bit Rice parameters) including the
  * escaped-raw partitions, wasted bits, metadata-block skipping, and
  * CRC-8 / CRC-16 / MD5 verification.
  *
  * Engine integration mirrors the reference's opaque-binary-column model
  * (h3o keeps payloads opaque and typed; see reference README data-model
  * notes) — payloads dispatch by magic bytes in [[Multimodal.Codec]].
  */
object Flac {

  // ---------------------------------------------------------------- CRCs

  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc8Table((c ^ data(i)) & 0xFF); i += 1 }
    c
  }

  private def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc16Table(((c >>> 8) ^ data(i)) & 0xFF) ^ ((c << 8) & 0xFFFF); i += 1 }
    c
  }

  // ---------------------------------------------------------- bit writer

  private final class BitWriter(initial: Int = 1 << 16) {
    private var buf = new Array[Byte](initial)
    private var byteLen = 0
    private var acc = 0L    // bits accumulated, MSB-first in the low `nAcc` bits
    private var nAcc = 0

    private def ensure(n: Int): Unit =
      if (byteLen + n > buf.length) {
        val b = new Array[Byte](Math.max(buf.length * 2, byteLen + n))
        System.arraycopy(buf, 0, b, 0, byteLen)
        buf = b
      }

    def writeBits(value: Long, n: Int): Unit = {
      require(n >= 0 && n <= 57, s"writeBits n=$n")
      if (n == 0) return
      acc = (acc << n) | (value & ((1L << n) - 1))
      nAcc += n
      while (nAcc >= 8) {
        ensure(1)
        buf(byteLen) = ((acc >>> (nAcc - 8)) & 0xFF).toByte
        byteLen += 1
        nAcc -= 8
      }
    }

    /** n as `n` zero bits followed by a one bit. */
    def writeUnary(n: Int): Unit = {
      var left = n
      while (left >= 32) { writeBits(0L, 32); left -= 32 }
      writeBits(1L, left + 1)
    }

    def alignByte(): Unit = if (nAcc != 0) writeBits(0L, 8 - nAcc)

    def lengthBytes: Int = { require(nAcc == 0); byteLen }

    def result(): Array[Byte] = { require(nAcc == 0, "unaligned"); java.util.Arrays.copyOf(buf, byteLen) }

    def crc8From(from: Int): Int = crc8(buf, from, byteLen)
    def crc16From(from: Int): Int = crc16(buf, from, byteLen)
  }

  // ---------------------------------------------------------- bit reader

  private final class BitReader(data: Array[Byte]) {
    var bitPos: Long = 0L

    def bytePos: Int = (bitPos >>> 3).toInt

    def readBit(): Int = {
      val i = (bitPos >>> 3).toInt
      if (i >= data.length) fail("truncated payload")
      val b = (data(i) >>> (7 - (bitPos & 7).toInt)) & 1
      bitPos += 1
      b
    }

    def readBits(n: Int): Long = {
      require(n >= 0 && n <= 57)
      var v = 0L
      var left = n
      while (left > 0) {
        val i = (bitPos >>> 3).toInt
        if (i >= data.length) fail("truncated payload")
        val off = (bitPos & 7).toInt
        val take = Math.min(8 - off, left)
        val bits = (data(i) >>> (8 - off - take)) & ((1 << take) - 1)
        v = (v << take) | bits
        bitPos += take
        left -= take
      }
      v
    }

    def readSigned(n: Int): Long = {
      if (n == 0) return 0L
      val v = readBits(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }

    def readUnary(): Int = {
      var n = 0
      while (readBit() == 0) {
        n += 1
        if (n > (1 << 22)) fail("unary runaway (corrupt stream)")
      }
      n
    }

    def alignByte(): Unit = bitPos = (bitPos + 7) & ~7L

    def skipBytes(n: Int): Unit = {
      require((bitPos & 7) == 0)
      bitPos += n.toLong * 8
      if (bytePos > data.length) fail("truncated payload")
    }

    def crc8Between(from: Int, until: Int): Int = crc8(data, from, until)
    def crc16Between(from: Int, until: Int): Int = crc16(data, from, until)
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"FLAC: $msg")

  // --------------------------------------------------- UTF-8-coded number

  private def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36))
    if (v < 0x80) w.writeBits(v, 8)
    else {
      // payload capacity of a b-byte encoding is 5b+1 bits
      var bytes = 2
      while (v >= (1L << (bytes * 5 + 1)) && bytes < 7) bytes += 1
      val payloadBits = bytes * 5 + 1
      val leadBits = payloadBits - (bytes - 1) * 6 // bits carried by the lead byte
      val mask = (1 << bytes) - 1
      w.writeBits(((mask.toLong << 1) << leadBits) | ((v >>> ((bytes - 1) * 6)) & ((1L << leadBits) - 1)), 8)
      var k = bytes - 2
      while (k >= 0) {
        w.writeBits(0x80L | ((v >>> (k * 6)) & 0x3F), 8)
        k -= 1
      }
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var ones = 0
    var m = 0x80
    while ((b0 & m) != 0 && ones < 8) { ones += 1; m >>= 1 }
    if (ones < 2 || ones > 7) fail("bad UTF-8-coded number lead byte")
    var v: Long = if (ones == 7) 0L else (b0 & ((1 << (7 - ones)) - 1)).toLong
    var k = 1
    while (k < ones) {
      val b = r.readBits(8).toInt
      if ((b & 0xC0) != 0x80) fail("bad UTF-8-coded number continuation")
      v = (v << 6) | (b & 0x3F)
      k += 1
    }
    v
  }

  // ------------------------------------------------------------- tables

  private val BlockSizeTable: Array[Int] =
    Array(-1, 192, 576, 1152, 2304, 4608, -8, -16, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  private val SampleRateTable: Array[Int] =
    Array(0, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000, -8, -16, -160, -1)

  private val SampleSizeTable: Array[Int] = Array(0, 8, 12, -1, 16, 20, 24, 32)

  // ======================================================== public model

  /** Decoded stream: sampleRate, bits per sample, one Array[Int] per channel. */
  final case class Audio(sampleRate: Int, bps: Int, channels: Array[Array[Int]]) {
    def numSamples: Int = if (channels.isEmpty) 0 else channels(0).length
  }

  def isFlac(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C'

  // ============================================================= encoder

  /** Encode PCM to a FLAC stream. `channels` holds one signed-sample array
    * per channel (1 or 2 channels; stereo gets the per-frame
    * cheapest-of-four channel assignment). `bps` in {8, 16, 24}. */
  def encode(channels: Array[Array[Int]], sampleRate: Int, bps: Int,
             blockSize: Int = 4096): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 2, "encode supports 1-2 channels")
    require(bps == 8 || bps == 16 || bps == 24, s"encode bps=$bps")
    require(blockSize >= 16 && blockSize <= 32768)
    val n = channels(0).length
    require(channels.forall(_.length == n), "channel length mismatch")
    val lim = 1L << (bps - 1)
    channels.foreach(_.foreach(v => require(v >= -lim && v < lim, s"sample out of $bps-bit range")))

    val w = new BitWriter()
    w.writeBits(0x664C6143L, 32) // "fLaC"
    // STREAMINFO: last-block flag + type 0, length 34
    w.writeBits(0x80, 8)
    w.writeBits(34, 24)
    w.writeBits(blockSize.toLong, 16)
    w.writeBits(blockSize.toLong, 16)
    val frameSizePatchPos = w.lengthBytes
    w.writeBits(0L, 24) // min frame size (patched)
    w.writeBits(0L, 24) // max frame size (patched)
    w.writeBits(sampleRate.toLong, 20)
    w.writeBits((channels.length - 1).toLong, 3)
    w.writeBits((bps - 1).toLong, 5)
    w.writeBits(n.toLong, 36)
    val md5 = audioMd5(channels, bps, n)
    md5.foreach(b => w.writeBits(b & 0xFFL, 8))

    var minFrame = 0
    var maxFrame = 0
    var frameNo = 0L
    var pos = 0
    while (pos < n) { // a zero-sample stream legally has no frames
      val bs = Math.min(blockSize, n - pos)
      val sz = encodeFrame(w, channels, pos, bs, frameNo, sampleRate, bps, blockSize)
      minFrame = if (frameNo == 0) sz else Math.min(minFrame, sz)
      maxFrame = Math.max(maxFrame, sz)
      frameNo += 1
      pos += bs
    }

    val out = w.result()
    // patch min/max frame size (24-bit big-endian each)
    val p = new Array[Byte](6)
    val mn = if (minFrame == Int.MaxValue) 0 else minFrame
    p(0) = ((mn >>> 16) & 0xFF).toByte; p(1) = ((mn >>> 8) & 0xFF).toByte; p(2) = (mn & 0xFF).toByte
    p(3) = ((maxFrame >>> 16) & 0xFF).toByte; p(4) = ((maxFrame >>> 8) & 0xFF).toByte; p(5) = (maxFrame & 0xFF).toByte
    System.arraycopy(p, 0, out, frameSizePatchPos, 6)
    out
  }

  private def audioMd5(channels: Array[Array[Int]], bps: Int, n: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = bps / 8
    val row = new Array[Byte](channels.length * bytesPer)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels.length) {
        val v = channels(c)(i)
        var b = 0
        while (b < bytesPer) { row(c * bytesPer + b) = ((v >>> (8 * b)) & 0xFF).toByte; b += 1 }
        c += 1
      }
      md.update(row)
      i += 1
    }
    md.digest()
  }

  /** Returns the encoded frame size in bytes. */
  private def encodeFrame(w: BitWriter, channels: Array[Array[Int]], pos: Int, bs: Int,
                          frameNo: Long, sampleRate: Int, bps: Int, streamBlockSize: Int): Int = {
    val start = w.lengthBytes
    // pick channel assignment for stereo by exact subframe cost
    val (assign, subs: Array[(Array[Int], Int)]) =
      if (channels.length == 1) (0, Array((slice(channels(0), pos, bs), bps)))
      else {
        val l = slice(channels(0), pos, bs)
        val r = slice(channels(1), pos, bs)
        val mid = new Array[Int](bs)
        val side = new Array[Int](bs)
        var i = 0
        while (i < bs) { mid(i) = (l(i) + r(i)) >> 1; side(i) = l(i) - r(i); i += 1 }
        val cL = subframeCost(l, bps)
        val cR = subframeCost(r, bps)
        val cM = subframeCost(mid, bps)
        val cS = subframeCost(side, bps + 1)
        val best = Array(cL + cR, cL + cS, cS + cR, cM + cS).zipWithIndex.minBy(_._1)._2
        best match {
          case 0 => (1, Array((l, bps), (r, bps)))
          case 1 => (8, Array((l, bps), (side, bps + 1)))
          case 2 => (9, Array((side, bps + 1), (r, bps)))
          case _ => (10, Array((mid, bps), (side, bps + 1)))
        }
      }

    val bsCode = BlockSizeTable.indexOf(bs) match {
      case -1 => 7 // explicit 16-bit
      case c => c
    }
    w.writeBits(0x3FFE, 14) // sync
    w.writeBits(0, 1)       // reserved
    w.writeBits(0, 1)       // fixed-blocksize strategy
    w.writeBits(bsCode.toLong, 4)
    w.writeBits(0L, 4)      // sample rate: from STREAMINFO
    w.writeBits(assign.toLong, 4)
    val ssCode = bps match { case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6; case 32 => 7 }
    w.writeBits(ssCode.toLong, 3)
    w.writeBits(0, 1)       // reserved
    writeUtf8Number(w, frameNo)
    if (bsCode == 7) w.writeBits((bs - 1).toLong, 16)
    else if (bsCode == 6) w.writeBits((bs - 1).toLong, 8)
    w.writeBits(w.crc8From(start).toLong, 8)

    subs.foreach { case (samples, sbps) => encodeSubframe(w, samples, sbps) }
    w.alignByte()
    w.writeBits(w.crc16From(start).toLong, 16)
    w.lengthBytes - start
  }

  private def slice(a: Array[Int], pos: Int, n: Int): Array[Int] =
    java.util.Arrays.copyOfRange(a, pos, pos + n)

  // ---- subframe planning: (bits, plan) where plan is replayed by encodeSubframe

  private final case class SubPlan(kind: Int, // 0 const, 1 verbatim, 2 fixed, 3 lpc
                                   order: Int, wasted: Int, shifted: Array[Int],
                                   residual: Array[Long], bits: Long,
                                   qlpCoefs: Array[Int] = null, qlpShift: Int = 0, qlpPrec: Int = 0)

  private def planSubframe(samples: Array[Int], bps: Int): SubPlan = {
    val n = samples.length
    // constant?
    var allEq = true
    var i = 1
    while (i < n && allEq) { if (samples(i) != samples(0)) allEq = false; i += 1 }
    if (allEq) return SubPlan(0, 0, 0, samples, null, 8L + bps)

    // wasted bits: min trailing zeros over nonzero samples (all-zero is constant)
    var wasted = Integer.MAX_VALUE
    i = 0
    while (i < n && wasted > 0) {
      val v = samples(i)
      if (v != 0) wasted = Math.min(wasted, Integer.numberOfTrailingZeros(v))
      i += 1
    }
    if (wasted == Integer.MAX_VALUE || wasted >= bps) wasted = 0
    val eff = bps - wasted
    val s = if (wasted == 0) samples else samples.map(_ >> wasted)
    val wastedHeaderBits = if (wasted == 0) 1 else 1 + wasted // flag + unary(wasted-1)

    var best: SubPlan = SubPlan(1, 0, wasted, s, null, 8L + wastedHeaderBits + n.toLong * eff)

    // fixed orders 0..4
    val diffs = new Array[Array[Long]](5)
    diffs(0) = s.map(_.toLong)
    var o = 1
    while (o <= 4 && o < n) {
      val prev = diffs(o - 1)
      val d = new Array[Long](n - o)
      var k = 0
      while (k < n - o) { d(k) = prev(k + 1) - prev(k); k += 1 }
      diffs(o) = d
      o += 1
    }
    o = 0
    while (o <= 4 && o < n) {
      if (diffs(o) != null) {
        val res = if (o == 0) diffs(0) else diffs(o)
        val resBits = bestResidualBits(res, o, n)
        val bits = 8L + wastedHeaderBits + o.toLong * eff + resBits
        if (bits < best.bits) best = SubPlan(2, o, wasted, s, res, bits)
      }
      o += 1
    }

    // LPC (order 8, or n-1 if shorter), Levinson-Durbin + quantization
    val maxOrder = Math.min(8, n - 1)
    if (maxOrder >= 1 && n > 16) {
      val lpc = lpcCoefficients(s, maxOrder)
      if (lpc != null) {
        val (coefs, shift, prec) = quantizeLpc(lpc)
        if (coefs != null) {
          val ord = coefs.length
          val res = new Array[Long](n - ord)
          var k = ord
          while (k < n) {
            var acc = 0L
            var j = 0
            while (j < ord) { acc += coefs(j).toLong * s(k - 1 - j); j += 1 }
            res(k - ord) = s(k) - (acc >> shift)
            k += 1
          }
          val resBits = bestResidualBits(res, ord, n)
          val bits = 8L + wastedHeaderBits + ord.toLong * eff + 4 + 5 + ord.toLong * prec + resBits
          if (bits < best.bits) best = SubPlan(3, ord, wasted, s, res, bits, coefs, shift, prec)
        }
      }
    }
    best
  }

  private def subframeCost(samples: Array[Int], bps: Int): Long = planSubframe(samples, bps).bits

  /** Double-precision LPC via autocorrelation + Levinson-Durbin:
    * coefficients a(j) such that pred(x_n) = sum_j a(j) * x_(n-1-j).
    * Returns null when the signal is degenerate (zero energy or an
    * unstable recursion step). */
  private def lpcCoefficients(s: Array[Int], order: Int): Array[Double] = {
    val n = s.length
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var sum = 0.0
      var i = lag
      while (i < n) { sum += s(i).toDouble * s(i - lag); i += 1 }
      ac(lag) = sum
      lag += 1
    }
    if (ac(0) <= 0.0) return null
    val a = new Array[Double](order)
    var err = ac(0)
    var i = 0
    while (i < order) {
      var acc = ac(i + 1)
      var j = 0
      while (j < i) { acc -= a(j) * ac(i - j); j += 1 }
      val k = acc / err
      val prev = java.util.Arrays.copyOf(a, i)
      j = 0
      while (j < i) { a(j) = prev(j) - k * prev(i - 1 - j); j += 1 }
      a(i) = k
      err *= (1.0 - k * k)
      if (err <= 0.0 || err.isNaN) return if (i >= 1) java.util.Arrays.copyOf(a, i + 1) else null
      i += 1
    }
    a
  }

  /** Quantize LPC coefficients to `prec`-bit integers with an error-
    * feedback loop and a common right shift; (null, 0, 0) when no usable
    * quantization exists. Residuals stay exact regardless of coefficient
    * quality — quantization only affects compression, never losslessness. */
  private def quantizeLpc(lpc: Array[Double]): (Array[Int], Int, Int) = {
    val prec = 14
    var cmax = 0.0
    lpc.foreach(c => cmax = Math.max(cmax, Math.abs(c)))
    if (cmax <= 0.0 || cmax.isNaN || cmax.isInfinite) return (null, 0, 0)
    val headroom = Math.getExponent(cmax) + 1 // integer bits needed for cmax
    val shift = Math.min(15, Math.max(0, prec - 1 - headroom - 1))
    if (shift == 0 && headroom > prec - 1) return (null, 0, 0)
    val q = new Array[Int](lpc.length)
    val lo = -(1 << (prec - 1))
    val hi = (1 << (prec - 1)) - 1
    var e = 0.0
    var j = 0
    while (j < lpc.length) {
      val target = lpc(j) * (1L << shift) + e
      var v = Math.round(target).toInt
      if (v > hi) v = hi else if (v < lo) v = lo
      e = target - v
      q(j) = v
      j += 1
    }
    (q, shift, prec)
  }

  // ---- residual encoding

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else (-v << 1) - 1

  /** Minimum total residual bits over partition orders 0..6 with optimal
    * per-partition Rice params (4-bit method; escape considered). */
  private def bestResidualBits(res: Array[Long], predOrder: Int, bs: Int): Long =
    planResidual(res, predOrder, bs)._1

  /** (totalBits, partitionOrder, params, rawBits) — params(i) == -1 means
    * escaped partition with rawBits(i) raw bits per sample. */
  private def planResidual(res: Array[Long], predOrder: Int, bs: Int): (Long, Int, Array[Int], Array[Int]) = {
    var best: (Long, Int, Array[Int], Array[Int]) = null
    var po = 0
    while (po <= 6) {
      val parts = 1 << po
      if (bs % parts == 0 && (bs >> po) > predOrder) {
        var total = 2L + 4L // method + partition order
        val params = new Array[Int](parts)
        val raws = new Array[Int](parts)
        var p = 0
        var idx = 0
        var ok = true
        while (p < parts && ok) {
          val cnt = (bs >> po) - (if (p == 0) predOrder else 0)
          if (cnt <= 0) ok = false
          else {
            // optimal rice param for res[idx, idx+cnt): cost(rp) =
            // 4 + cnt*(rp+1) + sum(zigzag(v) >> rp)
            var bestP = 0
            var bestBits = Long.MaxValue
            var rp = 0
            while (rp <= 14) {
              var sum = 0L
              var i = idx
              while (i < idx + cnt) { sum += zigzag(res(i)) >>> rp; i += 1 }
              val bits = 4L + cnt.toLong * (rp + 1) + sum
              if (bits < bestBits) { bestBits = bits; bestP = rp }
              rp += 1
            }
            // escaped-raw alternative: two's-complement bits for the widest value
            var rawBits = 1
            var j = idx
            while (j < idx + cnt) {
              val v = res(j)
              val need = (65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)).toInt
              if (need > rawBits) rawBits = need
              j += 1
            }
            // the raw-bits field is 5 bits wide, so escape is only legal for <=31
            val escBits = 4L + 5L + cnt.toLong * rawBits
            if (rawBits <= 31 && escBits < bestBits) { bestBits = escBits; bestP = -1 }
            params(p) = bestP
            raws(p) = rawBits
            total += bestBits
            idx += cnt
          }
          p += 1
        }
        if (ok && (best == null || total < best._1)) best = (total, po, params, raws)
      }
      po += 1
    }
    best
  }

  private def encodeSubframe(w: BitWriter, samples: Array[Int], bps: Int): Unit = {
    val plan = planSubframe(samples, bps)
    val eff = bps - plan.wasted
    w.writeBits(0, 1) // zero pad
    plan.kind match {
      case 0 =>
        w.writeBits(0L, 6)
        w.writeBits(0, 1)
        w.writeBits(samples(0).toLong, bps)
      case 1 =>
        w.writeBits(1L, 6)
        writeWasted(w, plan.wasted)
        plan.shifted.foreach(v => w.writeBits(v.toLong, eff))
      case 2 =>
        w.writeBits(8L | plan.order, 6)
        writeWasted(w, plan.wasted)
        var i = 0
        while (i < plan.order) { w.writeBits(plan.shifted(i).toLong, eff); i += 1 }
        writeResidual(w, plan.residual, plan.order, samples.length)
      case 3 =>
        w.writeBits(32L | (plan.order - 1), 6)
        writeWasted(w, plan.wasted)
        var i = 0
        while (i < plan.order) { w.writeBits(plan.shifted(i).toLong, eff); i += 1 }
        w.writeBits((plan.qlpPrec - 1).toLong, 4)
        w.writeBits(plan.qlpShift.toLong, 5)
        plan.qlpCoefs.foreach(c => w.writeBits(c.toLong, plan.qlpPrec))
        writeResidual(w, plan.residual, plan.order, samples.length)
    }
  }

  private def writeWasted(w: BitWriter, wasted: Int): Unit =
    if (wasted == 0) w.writeBits(0, 1)
    else { w.writeBits(1, 1); w.writeUnary(wasted - 1) }

  private def writeResidual(w: BitWriter, res: Array[Long], predOrder: Int, bs: Int): Unit = {
    val (_, po, params, raws) = planResidual(res, predOrder, bs)
    w.writeBits(0L, 2) // method 0: 4-bit rice
    w.writeBits(po.toLong, 4)
    val parts = 1 << po
    var p = 0
    var idx = 0
    while (p < parts) {
      val cnt = (bs >> po) - (if (p == 0) predOrder else 0)
      if (params(p) == -1) {
        w.writeBits(0xFL, 4)
        w.writeBits(raws(p).toLong, 5)
        var i = idx
        while (i < idx + cnt) { w.writeBits(res(i), raws(p)); i += 1 }
      } else {
        val rp = params(p)
        w.writeBits(rp.toLong, 4)
        var i = idx
        while (i < idx + cnt) {
          val u = zigzag(res(i))
          w.writeUnary((u >>> rp).toInt)
          if (rp > 0) w.writeBits(u, rp)
          i += 1
        }
      }
      idx += cnt
      p += 1
    }
  }

  // ============================================================= decoder

  /** Decode a FLAC stream. Verifies CRC-8 on every frame header, CRC-16 on
    * every frame, and the STREAMINFO MD5 when present (non-zero). */
  def decode(data: Array[Byte]): Audio = {
    if (!isFlac(data)) fail("bad magic")
    val r = new BitReader(data)
    r.skipBytes(4)
    // metadata blocks
    var last = false
    var sampleRate = 0
    var nChan = 0
    var bps = 0
    var totalSamples = 0L
    var md5: Array[Byte] = null
    var sawStreamInfo = false
    while (!last) {
      val h = r.readBits(8).toInt
      last = (h & 0x80) != 0
      val tpe = h & 0x7F
      val len = r.readBits(24).toInt
      if (tpe == 0) {
        if (len != 34) fail("bad STREAMINFO length")
        r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
        sampleRate = r.readBits(20).toInt
        nChan = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        md5 = new Array[Byte](16)
        var i = 0
        while (i < 16) { md5(i) = r.readBits(8).toByte; i += 1 }
        sawStreamInfo = true
      } else if (tpe == 127) fail("invalid metadata block type 127")
      else r.skipBytes(len)
    }
    if (!sawStreamInfo) fail("missing STREAMINFO")
    if (totalSamples > (1L << 31)) fail(s"stream too large to materialize: $totalSamples samples")

    val nTotal = totalSamples.toInt
    val out = Array.fill(nChan)(new Array[Int](nTotal))
    var written = 0
    while (written < nTotal) {
      written += decodeFrame(r, out, written, sampleRate, nChan, bps)
    }
    if (md5 != null && md5.exists(_ != 0)) {
      val got = audioMd5(out, bps, nTotal)
      if (!java.util.Arrays.equals(got, md5)) fail("MD5 mismatch (decoded audio differs from encoder's)")
    }
    Audio(sampleRate, bps, out)
  }

  private def decodeFrame(r: BitReader, out: Array[Array[Int]], at: Int,
                          siRate: Int, siChan: Int, siBps: Int): Int = {
    r.alignByte()
    val start = r.bytePos
    if (r.readBits(14) != 0x3FFE) fail("lost frame sync")
    if (r.readBit() != 0) fail("reserved bit set")
    val blockingStrategy = r.readBit()
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val assign = r.readBits(4).toInt
    val ssCode = r.readBits(3).toInt
    if (r.readBit() != 0) fail("reserved bit set")
    val _ = readUtf8Number(r) // frame/sample number (fixed: frame ordinal)
    val _2 = blockingStrategy
    val bs = bsCode match {
      case 0 => fail("reserved block size code")
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c => BlockSizeTable(c)
    }
    srCode match {
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case 15 => fail("invalid sample rate code")
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => siBps
      case 3 => fail("reserved sample size code")
      case c => SampleSizeTable(c)
    }
    val headerEnd = r.bytePos
    val crc8Got = r.readBits(8).toInt
    if (crc8Got != r.crc8Between(start, headerEnd)) fail("frame header CRC-8 mismatch")

    val nChan = if (assign < 8) assign + 1 else 2
    if (nChan != siChan) fail("frame/STREAMINFO channel mismatch")
    if (at + bs > out(0).length) fail("more samples than STREAMINFO declares")

    val chans = new Array[Array[Int]](nChan)
    var c = 0
    while (c < nChan) {
      val extra = assign match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // side/right
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, bs, bps + extra)
      c += 1
    }
    r.alignByte()
    val frameEnd = r.bytePos
    val crc16Got = r.readBits(16).toInt
    if (crc16Got != r.crc16Between(start, frameEnd)) fail("frame CRC-16 mismatch")

    // stereo decorrelation
    assign match {
      case 8 =>
        var i = 0
        while (i < bs) { val l = chans(0)(i); val s = chans(1)(i); chans(1)(i) = l - s; i += 1 }
      case 9 =>
        var i = 0
        while (i < bs) { val s = chans(0)(i); val rr = chans(1)(i); chans(0)(i) = rr + s; i += 1 }
      case 10 =>
        var i = 0
        while (i < bs) {
          val m = chans(0)(i); val s = chans(1)(i)
          val m2 = (m << 1) | (s & 1)
          chans(0)(i) = (m2 + s) >> 1
          chans(1)(i) = (m2 - s) >> 1
          i += 1
        }
      case _ => ()
    }
    c = 0
    while (c < nChan) { System.arraycopy(chans(c), 0, out(c), at, bs); c += 1 }
    bs
  }

  private def decodeSubframe(r: BitReader, bs: Int, bps: Int): Array[Int] = {
    if (r.readBit() != 0) fail("subframe pad bit set")
    val tpe = r.readBits(6).toInt
    val wasted = if (r.readBit() == 1) r.readUnary() + 1 else 0
    val eff = bps - wasted
    if (eff <= 0 || eff > 33) fail(s"bad effective sample size $eff")
    val out = new Array[Int](bs)

    if (tpe == 0) { // CONSTANT
      val v = r.readSigned(eff).toInt
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < bs) { out(i) = r.readSigned(eff).toInt; i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= 4) { // FIXED
      val order = tpe & 0x07
      if (order >= bs) fail("predictor order >= block size")
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff).toInt; i += 1 }
      val res = readResidual(r, order, bs)
      i = order
      while (i < bs) {
        val p: Long = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case _ => 4L * out(i - 1) - 6L * out(i - 2) + 4L * out(i - 3) - out(i - 4)
        }
        out(i) = (p + res(i - order)).toInt
        i += 1
      }
    } else if ((tpe & 0x20) != 0) { // LPC
      val order = (tpe & 0x1F) + 1
      if (order >= bs) fail("predictor order >= block size")
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff).toInt; i += 1 }
      val precM1 = r.readBits(4).toInt
      if (precM1 == 15) fail("invalid QLP precision")
      val prec = precM1 + 1
      val shift = r.readSigned(5).toInt
      if (shift < 0) fail("negative QLP shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(prec).toInt; i += 1 }
      val res = readResidual(r, order, bs)
      i = order
      while (i < bs) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = ((acc >> shift) + res(i - order)).toInt
        i += 1
      }
    } else fail(s"reserved subframe type $tpe")

    if (wasted > 0) {
      var i = 0
      while (i < bs) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  private def readResidual(r: BitReader, predOrder: Int, bs: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    if (method > 1) fail("reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val esc = if (method == 0) 0xF else 0x1F
    val po = r.readBits(4).toInt
    val parts = 1 << po
    if (bs % parts != 0 || (bs >> po) <= predOrder) fail("bad partition order")
    val res = new Array[Long](bs - predOrder)
    var idx = 0
    var p = 0
    while (p < parts) {
      val cnt = (bs >> po) - (if (p == 0) predOrder else 0)
      val param = r.readBits(pBits).toInt
      if (param == esc) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) { res(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary().toLong
          val u = (q << param) | (if (param > 0) r.readBits(param) else 0L)
          res(idx) = if ((u & 1) == 0) u >>> 1 else -((u + 1) >>> 1)
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    res
  }
}
