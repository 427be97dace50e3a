package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, plus batched decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-aligned batching via
  * mapPartitions on typed Datasets, deterministic output shapes — is real
  * and tested. The codec is REAL for every still-image and PCM-audio
  * format, all pure JVM with zero dependencies: RIFF/WAVE PCM16, binary
  * PPM (P6), PNG (8-bit RGB — chunk walk, java.util.zip inflate, all
  * five scanline filters), GIF (87a/89a — hand-rolled LZW), each
  * byte-exact, and baseline JPEG ([[Jpeg]] — DCT + canonical Huffman +
  * zigzag + flat quant; lossy by nature, but bit-exact on uniform-block
  * images, which is what the `jpeg_roundtrip` oracle pins; the
  * `media_codec_roundtrip` and `png_gif_roundtrip` oracles cover the
  * lossless formats). Resize is a real nearest-neighbor resample for
  * image payloads. Only the stream-media formats whose decoders
  * genuinely need external libraries (MP3/H.264) fall back to the
  * declared [[FakeCodec]] stub, so those pipelines stay reproducible and
  * the fallback swaps out without touching the dataflow.
  */
object Multimodal {

  /** Pure-JVM codecs for the uncompressed formats. All parsing is
    * allocation-light and byte-exact; malformed payloads throw
    * IllegalArgumentException (callers dispatch by magic bytes first). */
  object RealCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    // ---- RIFF/WAVE, PCM16 little-endian ----

    def isWav(p: Array[Byte]): Boolean =
      p.length >= 12 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

    /** Canonical 44-byte-header mono PCM16 WAV. */
    def wavEncode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      buf.putShort(1).putShort(1) // PCM, mono
      buf.putInt(sampleRate).putInt(sampleRate * 2)
      buf.putShort(2).putShort(16) // block align, bits
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }

    /** Chunk-walking decode (tolerates extra chunks and word padding).
      * Returns (sampleRate, samples); PCM16 only. */
    def wavDecode(p: Array[Byte]): (Int, Array[Short]) = {
      require(isWav(p), "not a RIFF/WAVE payload")
      val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
      buf.position(12)
      var sr = 0
      var fmt = 0
      var bits = 0
      var samples: Array[Short] = null
      while (buf.remaining() >= 8) {
        val id = new String(
          Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
        val size = buf.getInt()
        // Declared sizes are untrusted: a truncated or hostile payload
        // must fail with the documented IllegalArgumentException, not a
        // BufferUnderflow from inside ByteBuffer.
        require(size >= 0 && size <= buf.remaining(),
          s"truncated/invalid chunk '$id' (size=$size, remaining=${buf.remaining()})")
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too small ($size)")
            fmt = buf.getShort()
            val channels = buf.getShort()
            require(channels == 1,
              s"mono only (channels=$channels) — stereo would silently decode as interleaved mono")
            sr = buf.getInt()
            buf.getInt() // byte rate
            buf.getShort() // block align
            bits = buf.getShort()
            if (size > 16) buf.position(buf.position() + size - 16)
          case "data" =>
            require(fmt == 1 && bits == 16, s"PCM16 only (fmt=$fmt bits=$bits)")
            val n = size / 2
            samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = buf.getShort(); i += 1 }
          case _ =>
            buf.position(buf.position() + size + (size & 1))
        }
      }
      require(samples != null, "no data chunk")
      (sr, samples)
    }

    /** `dim` band mean-abs amplitudes in [0,1): band b covers samples
      * [b*n/dim, (b+1)*n/dim). */
    def audioFeatures(samples: Array[Short], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val n = samples.length
      var b = 0
      while (b < dim) {
        val from = b * n / dim
        val until = (b + 1) * n / dim
        var s = 0L
        var i = from
        while (i < until) { s += Math.abs(samples(i).toLong); i += 1 }
        out(b) = if (until > from) (s.toDouble / (until - from) / 32768.0).toFloat else 0f
        b += 1
      }
      out
    }

    // ---- binary PPM (P6) ----

    def isPpm(p: Array[Byte]): Boolean =
      p.length >= 2 && p(0) == 'P' && p(1) == '6'

    def ppmEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w x $h x 3")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Returns (width, height, rgb). Handles whitespace runs and `#`
      * comments in the header, maxval 255 only. */
    def ppmDecode(p: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(isPpm(p), "not a P6 payload")
      var pos = 2
      def skipWs(): Unit = {
        var go = true
        while (go && pos < p.length) {
          val c = p(pos)
          if (c == '#') { while (pos < p.length && p(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
          else go = false
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = 0
        while (pos < p.length && p(pos) >= '0' && p(pos) <= '9') {
          v = v * 10 + (p(pos) - '0'); pos += 1
        }
        v
      }
      val w = readInt()
      val h = readInt()
      val maxval = readInt()
      require(maxval == 255, s"maxval $maxval unsupported")
      pos += 1 // the single whitespace byte after maxval
      // Header-declared dimensions are untrusted: copyOfRange would
      // silently zero-pad a truncated pixel section, and w*h*3 can
      // overflow Int for hostile headers.
      val need = w.toLong * h * 3
      require(w > 0 && h > 0 && need <= p.length.toLong - pos,
        s"truncated P6 payload (${w}x$h needs $need bytes, have ${p.length - pos})")
      val rgb = java.util.Arrays.copyOfRange(p, pos, pos + need.toInt)
      (w, h, rgb)
    }

    // ---- PNG (8-bit RGB, non-interlaced) — pure JDK: chunk walk +
    // java.util.zip Deflater/Inflater + per-scanline filter reversal ----

    private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

    def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && (0 until 8).forall(i => p(i) == PngMagic(i))

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val pp = a + b - c
      val pa = Math.abs(pp - a); val pb = Math.abs(pp - b); val pc = Math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Encodes 8-bit RGB as a valid PNG (color type 2, no interlace).
      * `filterType` 0..4 selects the per-scanline filter — the decoder must
      * reverse all five, so the roundtrip specs cycle through them. */
    def pngEncode(w: Int, h: Int, rgb: Array[Byte], filterType: Int = 0): Array[Byte] = {
      require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w x $h x 3")
      require(filterType >= 0 && filterType <= 4, s"filter $filterType")
      val stride = w * 3
      val raw = new Array[Byte](h * (1 + stride))
      var y = 0
      while (y < h) {
        raw(y * (1 + stride)) = filterType.toByte
        var i = 0
        while (i < stride) {
          val x = rgb(y * stride + i) & 0xFF
          val a = if (i >= 3) rgb(y * stride + i - 3) & 0xFF else 0
          val b = if (y > 0) rgb((y - 1) * stride + i) & 0xFF else 0
          val c = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xFF else 0
          val f = filterType match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - (a + b) / 2
            case 4 => x - paeth(a, b, c)
          }
          raw(y * (1 + stride) + 1 + i) = f.toByte
          i += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zBuf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val idat = zBuf.toByteArray

      val out = new java.io.ByteArrayOutputStream()
      out.write(PngMagic)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        val len = ByteBuffer.allocate(4).putInt(data.length).array()
        out.write(len)
        val tb = typ.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      }
      val ihdr = ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .array()
      chunk("IHDR", ihdr)
      chunk("IDAT", idat)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Returns (width, height, rgb). 8-bit color-type-2 non-interlaced
      * only; malformed/truncated payloads throw IllegalArgumentException
      * like the other codecs. */
    def pngDecode(p: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(isPng(p), "not a PNG payload")
      val buf = ByteBuffer.wrap(p)
      buf.position(8)
      var w = 0; var h = 0
      var seenIhdr = false
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        require(buf.remaining() >= 8, "truncated PNG (chunk header)")
        val len = buf.getInt()
        val typ = new String(
          Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
        require(len >= 0 && len + 4 <= buf.remaining(),
          s"truncated PNG chunk '$typ' (len=$len, remaining=${buf.remaining()})")
        typ match {
          case "IHDR" =>
            require(len == 13, s"IHDR length $len")
            w = buf.getInt(); h = buf.getInt()
            val bitDepth = buf.get(); val colorType = buf.get()
            buf.get() // compression (0)
            buf.get() // filter method (0)
            val interlace = buf.get()
            require(bitDepth == 8 && colorType == 2 && interlace == 0,
              s"only 8-bit RGB non-interlaced supported " +
                s"(depth=$bitDepth type=$colorType interlace=$interlace)")
            require(w > 0 && h > 0 && w.toLong * h * 3 < Int.MaxValue,
              s"bad dimensions ${w}x$h")
            seenIhdr = true
          case "IDAT" =>
            idat.write(p, buf.position(), len)
            buf.position(buf.position() + len)
          case "IEND" => done = true
          case _ => buf.position(buf.position() + len) // ancillary chunk
        }
        buf.getInt() // CRC (not verified: transport integrity is parquet's job)
      }
      require(seenIhdr, "no IHDR chunk")
      val stride = w * 3
      val raw = new Array[Byte](h * (1 + stride))
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var off = 0
      try {
        while (off < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, off, raw.length - off)
          require(n > 0 || inflater.finished(),
            "truncated/corrupt PNG pixel stream")
          off += n
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"corrupt PNG deflate stream: $e")
      } finally inflater.end()
      require(off == raw.length, s"PNG pixel stream short ($off of ${raw.length})")

      val rgb = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val ft = raw(y * (1 + stride)) & 0xFF
        require(ft <= 4, s"bad filter type $ft")
        var i = 0
        while (i < stride) {
          val f = raw(y * (1 + stride) + 1 + i) & 0xFF
          val a = if (i >= 3) rgb(y * stride + i - 3) & 0xFF else 0
          val b = if (y > 0) rgb((y - 1) * stride + i) & 0xFF else 0
          val c = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xFF else 0
          val x = ft match {
            case 0 => f
            case 1 => f + a
            case 2 => f + b
            case 3 => f + (a + b) / 2
            case 4 => f + paeth(a, b, c)
          }
          rgb(y * stride + i) = x.toByte
          i += 1
        }
        y += 1
      }
      (w, h, rgb)
    }

    // ---- GIF (87a/89a, global palette, first frame, non-interlaced) —
    // pure-JVM LZW ----

    def isGif(p: Array[Byte]): Boolean =
      p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a'

    /** Encodes an 8-bit palette-indexed image as GIF89a with a 256-entry
      * global color table (`palette` = 768 RGB bytes). */
    def gifEncode(w: Int, h: Int, indices: Array[Byte],
                  palette: Array[Byte]): Array[Byte] = {
      require(indices.length == w * h, s"indices ${indices.length} != $w x $h")
      require(palette.length == 768, s"palette ${palette.length} != 256 x 3")
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      def short(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      short(w); short(h)
      out.write(0xF7) // global table, 8-bit, 256 entries
      out.write(0)    // background color index
      out.write(0)    // aspect
      out.write(palette)
      out.write(0x2C) // image descriptor
      short(0); short(0); short(w); short(h)
      out.write(0)    // no local table, not interlaced

      // GIF-LZW: 8-bit min code size; codes grow 9->12 bits, clear at 4096.
      val minCode = 8
      out.write(minCode)
      val clearCode = 1 << minCode     // 256
      val endCode = clearCode + 1      // 257
      val lzw = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var bitCnt = 0
      var codeSize = minCode + 1
      def emit(code: Int): Unit = {
        bitBuf |= code.toLong << bitCnt
        bitCnt += codeSize
        while (bitCnt >= 8) { lzw.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8 }
      }
      // Dictionary: string -> code, strings built as (prefixCode, byte).
      var dict = new java.util.HashMap[Long, Integer]()
      var nextCode = endCode + 1
      def key(prefix: Int, b: Int): Long = (prefix.toLong << 8) | b
      emit(clearCode)
      var prefix = -1
      var i = 0
      while (i < indices.length) {
        val b = indices(i) & 0xFF
        if (prefix < 0) prefix = b
        else {
          val cd = dict.get(key(prefix, b))
          if (cd != null) prefix = cd.intValue()
          else {
            emit(prefix)
            dict.put(key(prefix, b), Integer.valueOf(nextCode))
            nextCode += 1
            // The next emitted code can be as large as nextCode-1 (or the
            // decoder's KwKwK nextCode), so the width bumps the moment
            // nextCode no longer fits — mirrored exactly by the decoder.
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
            if (nextCode == 4096) {
              emit(clearCode)
              dict = new java.util.HashMap[Long, Integer]()
              nextCode = endCode + 1
              codeSize = minCode + 1
            }
            prefix = b
          }
        }
        i += 1
      }
      if (prefix >= 0) emit(prefix)
      emit(endCode)
      if (bitCnt > 0) lzw.write((bitBuf & 0xFF).toInt)
      val z = lzw.toByteArray
      var off = 0
      while (off < z.length) {
        val n = Math.min(255, z.length - off)
        out.write(n); out.write(z, off, n)
        off += n
      }
      out.write(0)    // block terminator
      out.write(0x3B) // trailer
      out.toByteArray
    }

    /** Returns (width, height, rgb) of the FIRST frame. Global palette,
      * non-interlaced only; extensions are skipped. */
    def gifDecode(p: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(isGif(p), "not a GIF payload")
      var pos = 6
      def u8(): Int = { require(pos < p.length, "truncated GIF"); val v = p(pos) & 0xFF; pos += 1; v }
      def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
      u16(); u16() // logical screen size (frame size governs)
      val flags = u8()
      u8(); u8() // background, aspect
      var palette: Array[Byte] = null
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        require(pos + n * 3 <= p.length, "truncated GIF palette")
        palette = java.util.Arrays.copyOfRange(p, pos, pos + n * 3)
        pos += n * 3
      }
      // Skip extension blocks to the first image descriptor.
      var sep = u8()
      while (sep == 0x21) {
        u8() // label
        var n = u8()
        while (n != 0) { pos += n; n = u8() }
        sep = u8()
      }
      require(sep == 0x2C, f"expected image descriptor, got 0x$sep%02x")
      u16(); u16() // left, top
      val w = u16(); val h = u16()
      val iflags = u8()
      require((iflags & 0x40) == 0, "interlaced GIF unsupported")
      if ((iflags & 0x80) != 0) {
        val n = 2 << (iflags & 7)
        require(pos + n * 3 <= p.length, "truncated GIF local palette")
        palette = java.util.Arrays.copyOfRange(p, pos, pos + n * 3)
        pos += n * 3
      }
      require(palette != null, "GIF without a color table")
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")

      val minCode = u8()
      require(minCode >= 2 && minCode <= 8, s"LZW min code $minCode")
      // Concatenate the data sub-blocks.
      val z = new java.io.ByteArrayOutputStream()
      var n = u8()
      while (n != 0) {
        require(pos + n <= p.length, "truncated GIF data block")
        z.write(p, pos, n); pos += n
        n = u8()
      }
      val data = z.toByteArray

      val clearCode = 1 << minCode
      val endCode = clearCode + 1
      // Dictionary as (prefix code, appended byte); roots are implicit.
      val prefixes = new Array[Int](4096)
      val appended = new Array[Byte](4096)
      var nextCode = endCode + 1
      var codeSize = minCode + 1
      var bitPos = 0
      def read(): Int = {
        if ((bitPos + codeSize + 7) / 8 > data.length) return endCode
        var v = 0; var got = 0
        while (got < codeSize) {
          val byteI = (bitPos + got) / 8
          val bitI = (bitPos + got) % 8
          val take = Math.min(8 - bitI, codeSize - got)
          v |= (((data(byteI) & 0xFF) >> bitI) & ((1 << take) - 1)) << got
          got += take
        }
        bitPos += codeSize
        v
      }
      def expand(code: Int, out: Array[Byte], at: Int): Int = {
        // Writes the string for `code` ending at position `at` (exclusive),
        // returns its length.
        var c = code; var len = 0
        while (c >= clearCode + 2) { len += 1; c = prefixes(c) } // walk chain
        len += 1
        var i2 = at - 1
        c = code
        while (c >= clearCode + 2) { out(i2) = appended(c); i2 -= 1; c = prefixes(c) }
        out(i2) = c.toByte
        len
      }
      val idx = new Array[Byte](w * h)
      var outPos = 0
      var prev = -1
      var code = read()
      while (code != endCode && outPos < idx.length) {
        if (code == clearCode) {
          nextCode = endCode + 1; codeSize = minCode + 1; prev = -1
        } else {
          var len = 0
          if (code < nextCode) {
            require(code < clearCode || code > endCode, s"special code $code in data")
            len = lenOf(code, clearCode, prefixes)
            require(outPos + len <= idx.length, "GIF pixel overflow")
            expand(code, idx, outPos + len)
          } else {
            // The KwKwK case: string = prev's string + its own first byte.
            require(prev >= 0 && code == nextCode, s"corrupt LZW code $code")
            val plen = lenOf(prev, clearCode, prefixes)
            require(outPos + plen + 1 <= idx.length, "GIF pixel overflow")
            expand(prev, idx, outPos + plen)
            idx(outPos + plen) = idx(outPos)
            len = plen + 1
          }
          if (prev >= 0 && nextCode < 4096) {
            prefixes(nextCode) = prev
            appended(nextCode) = idx(outPos) // first byte of current string
            nextCode += 1
            // One LESS than the encoder's bump point: the decoder's entry
            // count lags the encoder by exactly one code (the first code
            // after a clear adds no entry), so bumping at (1<<size)-1
            // re-aligns the width with the code the encoder wrote next.
            if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
          }
          prev = code
          outPos += len
        }
        code = read()
      }
      require(outPos == idx.length, s"GIF pixel stream short ($outPos of ${idx.length})")

      val rgb = new Array[Byte](w * h * 3)
      var i3 = 0
      while (i3 < idx.length) {
        val pi = (idx(i3) & 0xFF) * 3
        require(pi + 2 < palette.length, s"palette index out of range")
        rgb(i3 * 3) = palette(pi); rgb(i3 * 3 + 1) = palette(pi + 1)
        rgb(i3 * 3 + 2) = palette(pi + 2)
        i3 += 1
      }
      (w, h, rgb)
    }

    private def lenOf(code: Int, clearCode: Int, prefixes: Array[Int]): Int = {
      var c = code; var len = 1
      while (c >= clearCode + 2) { len += 1; c = prefixes(c) }
      len
    }

    /** Nearest-neighbor RGB resample: target pixel (x,y) takes source
      * pixel (x*w/w2, y*h/h2) (integer floors). */
    def rgbResize(w: Int, h: Int, rgb: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
      val out = new Array[Byte](w2 * h2 * 3)
      var y = 0
      while (y < h2) {
        val sy = y * h / h2
        var x = 0
        while (x < w2) {
          val sx = x * w / w2
          val si = (sy * w + sx) * 3
          val di = (y * w2 + x) * 3
          out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Real nearest-neighbor resample of a P6 payload. */
    def ppmResize(p: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
      val (w, h, rgb) = ppmDecode(p)
      ppmEncode(w2, h2, rgbResize(w, h, rgb, w2, h2))
    }

    /** `dim`-bin grayscale histogram, normalized to sum 1: gray =
      * (299 r + 587 g + 114 b) / 1000 over unsigned bytes, bin =
      * gray * dim / 256. */
    def imageFeatures(w: Int, h: Int, rgb: Array[Byte], dim: Int): Array[Float] = {
      val counts = new Array[Int](dim)
      val n = w * h
      var i = 0
      while (i < n) {
        val r = rgb(i * 3) & 0xFF
        val g = rgb(i * 3 + 1) & 0xFF
        val b = rgb(i * 3 + 2) & 0xFF
        val gray = (299 * r + 587 * g + 114 * b) / 1000
        counts(gray * dim / 256) += 1
        i += 1
      }
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = counts(i).toFloat / n; i += 1 }
      out
    }
  }

  /** Format dispatch: real decode for WAV/FLAC audio and PPM/PNG/GIF/JPEG
    * image payloads, [[FakeCodec]] fallback for the remaining stream-media
    * formats (MP3/H.264 need libraries this container does not have). */
  object Codec {
    /** True iff the payload is one of the REAL still-image formats (the
      * single source of truth for format routing — resize, frame
      * sampling and feature extraction must not drift apart). */
    def isRealImage(payload: Array[Byte]): Boolean =
      RealCodec.isPpm(payload) || RealCodec.isPng(payload) ||
        RealCodec.isGif(payload) || Jpeg.isJpeg(payload)

    /** (w, h, rgb) for any of the real still-image formats, else None.
      * Grayscale JPEG expands to rgb triples so the feature path sees one
      * shape. */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      if (RealCodec.isPpm(payload)) Some(RealCodec.ppmDecode(payload))
      else if (RealCodec.isPng(payload)) Some(RealCodec.pngDecode(payload))
      else if (RealCodec.isGif(payload)) Some(RealCodec.gifDecode(payload))
      else if (Jpeg.isJpeg(payload)) {
        val (w, h, px) = Jpeg.decode(payload)
        if (px.length == w * h * 3) Some((w, h, px))
        else Some((w, h, px.flatMap(b => Array(b, b, b))))
      } else None

    /** First-channel PCM as 16-bit samples for any REAL audio format
      * (RIFF/WAVE or FLAC), else None. FLAC at other bit depths is
      * rescaled to 16-bit so the feature path sees one shape. */
    def decodeAudio(payload: Array[Byte]): Option[Array[Short]] =
      if (RealCodec.isWav(payload)) Some(RealCodec.wavDecode(payload)._2)
      else if (Flac.isFlac(payload)) {
        val a = Flac.decode(payload)
        val ch = if (a.channels.isEmpty) Array.empty[Int] else a.channels(0)
        val shift = a.bps - 16
        Some(
          if (shift == 0) ch.map(_.toShort)
          else if (shift > 0) ch.map(v => (v >> shift).toShort)
          else ch.map(v => (v << -shift).toShort))
      } else None

    def decodeToFeatures(payload: Array[Byte], dim: Int): Array[Float] =
      decodeAudio(payload) match {
        case Some(samples) => RealCodec.audioFeatures(samples, dim)
        case None => decodeImage(payload) match {
          case Some((w, h, rgb)) => RealCodec.imageFeatures(w, h, rgb, dim)
          case None => FakeCodec.decodeToFeatures(payload, dim)
        }
      }

    /** Audio frames are 1024-sample windows; an image is one frame. */
    def frameCount(payload: Array[Byte], kind: String): Int =
      decodeAudio(payload) match {
        case Some(samples) => Math.max(1, (samples.length + 1023) / 1024)
        case None => if (isRealImage(payload)) 1 else FakeCodec.frameCount(payload, kind)
      }
  }

  final case class MediaBlob(doc_id: Long, kind: String, payload: Array[Byte],
                             width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, kind: String,
                                 feature: Array[Float], frames: Int)

  /** STUB decoder: deterministic features from payload bytes. Only the
    * library-bound stream-media formats (MP3/H.264) land here — WAV, PPM,
    * PNG, GIF and baseline JPEG all decode for real. */
  object FakeCodec {
    def decodeToFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      i = 0
      while (i < dim) {
        h = TextKernel.mix64(h + i)
        out(i) = ((h >>> 40).toInt.toFloat / (1 << 24).toFloat) - 0.5f
        i += 1
      }
      out
    }

    /** STUB frame sampler: frame count derived from payload size. */
    def frameCount(payload: Array[Byte], kind: String): Int = kind match {
      case "video" => Math.max(1, payload.length / 4096)
      case "audio" => Math.max(1, payload.length / 1024)
      case _ => 1
    }
  }

  /** Synthesizes a media table from the documents table (html bytes play
    * the role of the opaque payload). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.Stratum(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaBlob(id, kind, text.getBytes("UTF-8"),
          width = 64 + (id % 8).toInt * 32, height = 64,
          sample_rate = 16000)
      }
  }

  final case class ResizedBlob(doc_id: Long, kind: String, width: Int,
                               height: Int, payload: Array[Byte])

  final case class Frame(doc_id: Long, frame_idx: Int, feature: Array[Float])

  /** Resize: a REAL nearest-neighbor resample for P6/PNG/GIF images
    * (PNG/GIF re-encode as PNG); other payloads go through the
    * deterministic stub re-encode (the dataflow — schema, typed map,
    * partition preservation — is what this stage pins down for the
    * formats without a real codec). */
  def resize(spark: SparkSession, media: Dataset[MediaBlob],
             width: Int, height: Int): Dataset[ResizedBlob] = {
    import spark.implicits._
    media.map { blob =>
      if (RealCodec.isPpm(blob.payload))
        ResizedBlob(blob.doc_id, blob.kind, width, height,
          RealCodec.ppmResize(blob.payload, width, height))
      else if (Codec.isRealImage(blob.payload)) {
        // PNG/GIF/JPEG: decode, NN-resample, re-encode as PNG (lossless).
        val (w, h, rgb) = Codec.decodeImage(blob.payload).get
        ResizedBlob(blob.doc_id, blob.kind, width, height,
          RealCodec.pngEncode(width, height,
            RealCodec.rgbResize(w, h, rgb, width, height)))
      } else {
        val out = new Array[Byte](math.min(blob.payload.length, width * height / 8))
        var i = 0
        while (i < out.length) {
          out(i) = blob.payload(i * math.max(1, blob.payload.length / math.max(out.length, 1)) % blob.payload.length)
          i += 1
        }
        ResizedBlob(blob.doc_id, blob.kind, width, height, out)
      }
    }
  }

  /** Frame sampling (every `stride`-th frame), rows exploded via flatMap:
    * REAL 1024-sample windows for WAV payloads (per-window band
    * features), one frame for images, stub frames otherwise. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaBlob],
                   stride: Int = 2, featureDim: Int = 16): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { blob =>
      val audio = Codec.decodeAudio(blob.payload)
      if (audio.isDefined) {
        val samples = audio.get
        val n = Math.max(1, (samples.length + 1023) / 1024)
        (0 until n by stride).map { f =>
          val from = Math.min(f * 1024, samples.length)
          val until = Math.min(from + 1024, samples.length)
          val win =
            if (until > from) java.util.Arrays.copyOfRange(samples, from, until)
            else Array[Short](0)
          Frame(blob.doc_id, f, RealCodec.audioFeatures(win, featureDim))
        }
      } else {
        val n = Codec.frameCount(blob.payload, blob.kind)
        (0 until n by stride).map { f =>
          Frame(blob.doc_id, f,
            if (Codec.isRealImage(blob.payload))
              Codec.decodeToFeatures(blob.payload, featureDim)
            else FakeCodec.decodeToFeatures(blob.payload :+ f.toByte, featureDim))
        }
      }
    }
  }

  /** Decode + feature-extract stage: batched per partition; output shape is
    * fixed (dim-`featureDim` vectors), partitioning preserved. Real decode
    * for WAV/PPM, stub fallback otherwise (see [[Codec]]). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaBlob],
                      featureDim: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { blob =>
        MediaFeatures(blob.doc_id, blob.kind,
          Codec.decodeToFeatures(blob.payload, featureDim),
          Codec.frameCount(blob.payload, blob.kind))
      }
    }
  }
}
