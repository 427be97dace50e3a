package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, plus batched decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-aligned batching via
  * mapPartitions on typed Datasets, deterministic output shapes — is real
  * and tested. The codec is REAL for the uncompressed formats, which need
  * no external libraries: RIFF/WAVE PCM16 audio and binary PPM (P6)
  * images decode bit-exactly in pure JVM code ([[RealCodec]]; the driver
  * query `media_codec_roundtrip` proves the byte-level round-trip against
  * a pure-arithmetic DuckDB oracle), and resize is a real
  * nearest-neighbor resample for P6 payloads. COMPRESSED formats
  * (JPEG/PNG/MP3/H.264) still fall back to the declared [[FakeCodec]]
  * stub — this container has no codec libraries — so those pipelines stay
  * reproducible and the fallback swaps out without touching the dataflow.
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

    /** Real nearest-neighbor resample: target pixel (x,y) takes source
      * pixel (x*w/w2, y*h/h2) (integer floors). Returns a P6 payload. */
    def ppmResize(p: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
      val (w, h, rgb) = ppmDecode(p)
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
      ppmEncode(w2, h2, out)
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

  /** Format dispatch: real decode for WAV/PPM payloads, [[FakeCodec]]
    * fallback for everything else (compressed formats need libraries this
    * container does not have). */
  object Codec {
    def decodeToFeatures(payload: Array[Byte], dim: Int): Array[Float] =
      if (RealCodec.isWav(payload))
        RealCodec.audioFeatures(RealCodec.wavDecode(payload)._2, dim)
      else if (RealCodec.isPpm(payload)) {
        val (w, h, rgb) = RealCodec.ppmDecode(payload)
        RealCodec.imageFeatures(w, h, rgb, dim)
      } else FakeCodec.decodeToFeatures(payload, dim)

    /** Audio frames are 1024-sample windows; an image is one frame. */
    def frameCount(payload: Array[Byte], kind: String): Int =
      if (RealCodec.isWav(payload)) {
        val n = RealCodec.wavDecode(payload)._2.length
        Math.max(1, (n + 1023) / 1024)
      } else if (RealCodec.isPpm(payload)) 1
      else FakeCodec.frameCount(payload, kind)
  }

  final case class MediaBlob(doc_id: Long, kind: String, payload: Array[Byte],
                             width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, kind: String,
                                 feature: Array[Float], frames: Int)

  /** STUB decoder: deterministic features from payload bytes. Replace with
    * a real codec (JPEG/PNG/PCM decode) in a full deployment. */
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
    spark.read.parquet(s"$sfDir/documents.parquet")
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

  /** Resize: a REAL nearest-neighbor resample for P6 images; other
    * payloads go through the deterministic stub re-encode (the dataflow —
    * schema, typed map, partition preservation — is what this stage pins
    * down for the formats without a real codec). */
  def resize(spark: SparkSession, media: Dataset[MediaBlob],
             width: Int, height: Int): Dataset[ResizedBlob] = {
    import spark.implicits._
    media.map { blob =>
      if (RealCodec.isPpm(blob.payload))
        ResizedBlob(blob.doc_id, blob.kind, width, height,
          RealCodec.ppmResize(blob.payload, width, height))
      else {
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
      if (RealCodec.isWav(blob.payload)) {
        val samples = RealCodec.wavDecode(blob.payload)._2
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
            if (RealCodec.isPpm(blob.payload))
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
