package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Flac

/** FLAC codec: lossless round-trips across sample sizes, channel modes and
  * signal shapes; integrity-check rejection of tampered/truncated payloads.
  * Every round-trip asserts bit-exact sample recovery — the same property
  * the `flac_roundtrip` driver oracle proves end-to-end by formula.
  */
class FlacSpec extends AnyFunSuite {

  private def rt(channels: Array[Array[Int]], sr: Int, bps: Int, bs: Int = 4096): Array[Byte] = {
    val flac = Flac.encode(channels, sr, bps, bs)
    assert(Flac.isFlac(flac))
    val a = Flac.decode(flac)
    assert(a.sampleRate == sr, "sample rate")
    assert(a.bps == bps, "bps")
    assert(a.channels.length == channels.length, "channel count")
    channels.indices.foreach { c =>
      assert(a.channels(c).sameElements(channels(c)), s"channel $c samples differ")
    }
    flac
  }

  // deterministic "noise" without Random (keeps the spec replayable)
  private def mix(v: Long): Long = {
    var h = v * 0x9E3779B97F4A7C15L
    h ^= h >>> 32; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 29
    h
  }

  test("mono 16-bit: smooth sawtooth round-trips and compresses") {
    val n = 10000
    val s = Array.tabulate(n)(i => ((i * 7) % 4096) - 2048)
    val flac = rt(Array(s), 44100, 16)
    assert(flac.length < n * 2, s"sawtooth should compress (got ${flac.length} of ${n * 2})")
  }

  test("stereo 16-bit: correlated channels use stereo decorrelation profitably") {
    val n = 8000
    val l = Array.tabulate(n)(i => ((i * 11) % 8192) - 4096)
    val r = Array.tabulate(n)(i => l(i) + Math.floorMod(mix(i), 33L).toInt - 16)
    val joint = rt(Array(l, r), 48000, 16)
    // re-encode forcing independent channels is impossible via the public
    // API; instead verify joint-stereo beats the two-mono sum, which holds
    // for strongly correlated channels iff a side mode was chosen
    val monoL = Flac.encode(Array(l), 48000, 16)
    val monoR = Flac.encode(Array(r), 48000, 16)
    assert(joint.length < monoL.length + monoR.length,
      "correlated stereo should beat independent encodes")
  }

  test("pure noise round-trips (verbatim/high-rice path)") {
    val n = 5000
    val s = Array.tabulate(n)(i => Math.floorMod(mix(i + 7), 32768L).toInt - 16384)
    rt(Array(s), 16000, 16)
  }

  test("constant and silent frames (CONSTANT subframes)") {
    rt(Array(Array.fill(9000)(1234)), 8000, 16, bs = 1024)
    rt(Array(Array.fill(4096)(0), Array.fill(4096)(0)), 8000, 16)
  }

  test("wasted bits: samples sharing trailing zeros") {
    val n = 6000
    val s = Array.tabulate(n)(i => (((i * 5) % 2048) - 1024) * 8)
    rt(Array(s), 22050, 16)
  }

  test("8-bit and 24-bit sample sizes") {
    val s8 = Array.tabulate(3000)(i => ((i * 3) % 256) - 128)
    rt(Array(s8), 8000, 8)
    val s24 = Array.tabulate(3000)(i => (((i.toLong * 99991) % (1 << 24)) - (1 << 23)).toInt)
    rt(Array(s24, s24.map(v => -v - 1)), 96000, 24)
  }

  test("empty stream (zero samples, zero frames)") {
    val flac = Flac.encode(Array(Array.empty[Int]), 44100, 16)
    val a = Flac.decode(flac)
    assert(a.numSamples == 0 && a.sampleRate == 44100 && a.bps == 16)
  }

  test("short stream smaller than one block; non-table final block size") {
    rt(Array(Array.tabulate(37)(i => i * 100 - 1800)), 44100, 16)
    rt(Array(Array.tabulate(5000)(i => ((i * 13) % 2000) - 1000)), 44100, 16, bs = 4096)
  }

  test("many frames: multi-byte UTF-8 frame numbers (>127 frames)") {
    val n = 300 * 256 // 300 frames at block size 256
    val s = Array.tabulate(n)(i => ((i * 3) % 1024) - 512)
    rt(Array(s), 32000, 16, bs = 256)
  }

  test("extreme full-scale samples at every bps") {
    for (bps <- Seq(8, 16, 24)) {
      val lim = 1 << (bps - 1)
      val s = Array.tabulate(2048)(i => if (i % 2 == 0) -lim else lim - 1)
      rt(Array(s), 44100, bps)
    }
  }

  test("truncated payload rejected at every prefix length") {
    val flac = Flac.encode(Array(Array.tabulate(500)(i => i % 100 - 50)), 44100, 16)
    for (cut <- Seq(2, 4, 20, 41, flac.length / 2, flac.length - 1)) {
      intercept[IllegalArgumentException] { Flac.decode(flac.take(cut)) }
    }
  }

  test("bit flips are caught by CRC-8/CRC-16/MD5 (never silently wrong)") {
    val s = Array.tabulate(4000)(i => ((i * 7) % 4096) - 2048)
    val flac = Flac.encode(Array(s), 44100, 16)
    val audioStart = 4 + 4 + 34 // magic + metadata header + STREAMINFO
    var caught = 0
    var pos = audioStart
    while (pos < flac.length) {
      val tampered = flac.clone()
      tampered(pos) = (tampered(pos) ^ 0x10).toByte
      try {
        val a = Flac.decode(tampered)
        // a flip that decodes MUST NOT alter the audio (e.g. padding bits)
        assert(a.channels(0).sameElements(s), s"silent corruption at byte $pos")
      } catch { case _: IllegalArgumentException => caught += 1 }
      pos += 97
    }
    assert(caught > 0, "no tamper was ever detected")
  }

  test("hostile garbage rejected") {
    intercept[IllegalArgumentException] { Flac.decode(Array[Byte](1, 2, 3)) }
    intercept[IllegalArgumentException] {
      Flac.decode("fLaCxxxxxxxxxxxxxxxx".getBytes("US-ASCII"))
    }
    val zeros = new Array[Byte](256)
    zeros(0) = 'f'; zeros(1) = 'L'; zeros(2) = 'a'; zeros(3) = 'C'
    intercept[IllegalArgumentException] { Flac.decode(zeros) }
  }

  test("encoder rejects out-of-range samples and bad params") {
    intercept[IllegalArgumentException] { Flac.encode(Array(Array(40000)), 44100, 16) }
    intercept[IllegalArgumentException] { Flac.encode(Array.empty[Array[Int]], 44100, 16) }
    intercept[IllegalArgumentException] { Flac.encode(Array(Array(1), Array(1, 2)), 44100, 16) }
  }

  test("codec dispatch: FLAC payloads route through the real audio path") {
    import graft.ops.Multimodal.{Codec, RealCodec}
    val s = Array.tabulate(4096)(i => ((i * 7) % 4096) - 2048)
    val flac = Flac.encode(Array(s), 16000, 16)
    val wav = RealCodec.wavEncode(s.map(_.toShort), 16000)
    val fFlac = Codec.decodeToFeatures(flac, 16)
    val fWav = Codec.decodeToFeatures(wav, 16)
    assert(fFlac.sameElements(fWav), "FLAC and WAV of identical PCM must featurize identically")
    assert(Codec.frameCount(flac, "audio") == Codec.frameCount(wav, "audio"))
  }
}
