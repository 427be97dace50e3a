package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Ops, TextKernel}

/** Pipeline operators: dedup, similarity, text analysis, multimodal stub. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup groups match GROUP BY text") {
    val groups = Ops.dedupExact(docs).collect()
    val expected = docs.groupBy("text")
      .agg(min("doc_id"), count(lit(1))).count()
    assert(groups.length == expected)
    assert(groups.map(_.getLong(2)).sum == docs.count())
  }

  test("minhash LSH finds all high-jaccard pairs (vs brute force)") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val threshold = 0.5
    val brute = (for {
      (ida, ta) <- texts
      (idb, tb) <- texts
      if ida < idb
      j = TextKernel.jaccard(ta, tb, 3)
      if j >= threshold
    } yield (ida, idb)).toSet

    val lsh = Ops.dedupMinHash(spark, docs, threshold = threshold)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // LSH is a candidate filter + exact verify: no false positives, and at
    // this banding (16 bands x 4 rows) recall at j>=0.5 should be complete
    // on this corpus.
    assert(lsh.subsetOf(brute ++ brute)) // no false positives
    val recall = if (brute.isEmpty) 1.0 else lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall, brute=${brute.size}, lsh=${lsh.size}")
  }

  test("simhash: identical texts collide, perturbed texts stay close") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val c = "completely different content about spark query engines here"
    assert(TextKernel.simHash(a) == TextKernel.simHash(a))
    assert(TextKernel.hamming(TextKernel.simHash(a), TextKernel.simHash(b)) <=
      TextKernel.hamming(TextKernel.simHash(a), TextKernel.simHash(c)))
  }

  test("ann brute force matches local computation") {
    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = vecs.filter(_._1 % 25 == 0)
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val expected = queries.flatMap { case (qid, qv) =>
      vecs.map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, id, i + 1) }
    }.toSet
    val got = Ops.annBruteForce(spark,
      embeddings, embeddings.filter(col("vec_id") % 25 === 0), k = 5)
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("ann LSH achieves reasonable recall vs brute force") {
    val queries = embeddings.filter(col("vec_id") % 25 === 0)
    val brute = Ops.annBruteForce(spark, embeddings, queries, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ops.annLsh(spark, embeddings, queries, k = 5, bits = 8, tables = 6)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    // bits=8 is oversized for this 100-vector corpus (see the sizing rule
    // in Ops.annLsh) — 0.6 is the floor at these deliberately-starved
    // parameters; driver parameters at sf0.01 reach 0.93.
    assert(recall >= 0.6, s"recall $recall")
  }

  test("language ID recovers the majority of labels") {
    val out = Ops.langId(spark, docs).collect()
    assert(out.length == docs.count())
    val acc = out.count(r => r.getString(1) == r.getString(2)).toDouble / out.length
    // The synthetic corpus shares vocabulary across langs; just require
    // clearly-better-than-random (12 languages).
    assert(acc > 0.2, s"accuracy $acc")
  }

  test("language ID scans the documents table exactly once (cached tf table)") {
    val res = Ops.langId(spark, docs)
    val nodeNames = res.queryExecution.optimizedPlan
      .collect { case n => n.getClass.getSimpleName }
    // Both consumers (profiles + scoring) must read the cached tf table;
    // a direct file relation in the optimized plan means a second scan.
    assert(nodeNames.count(_ == "InMemoryRelation") == 2,
      s"expected 2 cache reads, plan nodes: $nodeNames")
    assert(!nodeNames.contains("LogicalRelation"),
      s"documents scanned directly, plan nodes: $nodeNames")
  }

  test("exact n-gram Jaccard join (prefix filtering) equals brute force exactly") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (t <- Seq(0.3, 0.5, 0.7)) {
      val brute = (for {
        (ia, ta) <- texts; (ib, tb) <- texts
        if ia < ib && TextKernel.jaccard(ta, tb, 3) >= t
      } yield (ia, ib)).toSet
      val got = Ops.dedupNgramExact(spark, docs, threshold = t)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"threshold $t: got=${got.size} brute=${brute.size}")
    }
  }

  test("duplicate clustering equals brute-force union-find on the pair graph") {
    import spark.implicits._
    val pairs = Ops.dedupMinHash(spark, docs, threshold = 0.4)
      .select("a_id", "b_id")
    val got = Ops.duplicateClusters(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Brute union-find on the collected pairs.
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // Canonical label = min id per component.
    val want = ids.groupBy(find).iterator.flatMap { case (_, members) =>
      val lbl = members.min; members.iterator.map(_ -> lbl)
    }.toMap
    assert(got == want)
    assert(edges.nonEmpty && got.nonEmpty)
  }

  test("duplicate clustering converges in O(log diameter) on a 512-chain") {
    import spark.implicits._
    // Worst case for plain label propagation: one path-shaped component.
    val chain = (0L until 511L).map(i => (i, i + 1))
    val pairs = chain.toDF("a_id", "b_id")
    val got = Ops.duplicateClusters(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 512 && got.values.forall(_ == 0L))
    // Pointer doubling halves path lengths per round: log2(512) = 9 (+
    // slack for the final no-change round); plain propagation needs 511.
    assert(Ops.lastClusterRounds <= 12,
      s"rounds=${Ops.lastClusterRounds} — pointer doubling regressed")
  }

  test("embedding LSH dedup recall floor vs brute force (driver params)") {
    val rows = embeddings.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val brute = (for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib && cos(va, vb) >= 0.4
    } yield (ia, ib)).toSet
    val lsh = Ops.dedupEmbedding(spark, embeddings,
        threshold = 0.4, bits = 4, tables = 20)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH must not produce false positives")
    val recall = if (brute.isEmpty) 1.0 else lsh.intersect(brute).size.toDouble / brute.size
    // Floor pins the parameterization: oracles mirror parameters, so only
    // this guard catches a silent recall trade from parameter drift.
    assert(recall >= 0.9, s"recall $recall, brute=${brute.size}, lsh=${lsh.size}")
  }

  test("quality scores and token counts are sane") {
    val q = Ops.qualityScore(docs).collect()
    q.foreach { r =>
      val quality = r.getDouble(r.fieldIndex("quality"))
      assert(quality >= 0.0 && quality <= 1.0)
    }
    val t = Ops.tokenCounts(docs).collect()
    t.foreach { r =>
      assert(r.getInt(r.fieldIndex("ws_tokens")) > 0)
      assert(r.getInt(r.fieldIndex("regex_tokens")) >= r.getInt(r.fieldIndex("ws_tokens")) - 1)
    }
  }

  test("fingerprints are whitespace-normalization invariant") {
    assert(TextKernel.fingerprint("Hello  World") ==
      TextKernel.fingerprint("hello world"))
    assert(TextKernel.fingerprint("hello world") !=
      TextKernel.fingerprint("hello earth"))
    val fps = Ops.fingerprints(spark, docs).collect()
    assert(fps.length == docs.count())
  }

  test("multimodal plumbing: schema, determinism, fixed feature shape") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(spark, media, featureDim = 32).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.feature.length == 32)
      assert(f.frames >= 1)
    }
    // Deterministic across runs and partitionings.
    val again = Multimodal.extractFeatures(spark,
      Multimodal.mediaTable(spark, sfDir).repartition(7), 32)
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    feats.foreach(f => assert(again(f.doc_id) == f.feature.toSeq))
  }
}

/** Typed top-K aggregator (map-side partial top-k). */
class TopKSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("top_k per group matches window ranking") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val r = new scala.util.Random(5)
    val rows = (0 until 5000).map { i =>
      (i % 7L, r.nextDouble(), i.toLong)
    }
    val df = rows.toDF("grp", "score", "id").repartition(9)
    val got = graft.ops.TopK.topKPerGroup(spark, df, "grp", "score", "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(t => (-t._2, t._3)).take(5).zipWithIndex.map {
        case ((_, _, id), i) => (g, (i + 1).toLong, id)
      }
    }.toSet
    assert(got == expected)
  }
}

/** Multimodal codecs (real WAV/PPM + stub fallback) and stage dataflow. */
class MultimodalStagesSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("codec round-trips hold under randomized payloads; truncation rejects") {
    import graft.ops.Multimodal.RealCodec
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(5000)
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768).map(_.toShort)
      val sr = 8000 + rnd.nextInt(40000)
      val wav = RealCodec.wavEncode(samples, sr)
      val (dsr, dec) = RealCodec.wavDecode(wav)
      assert(dsr == sr && java.util.Arrays.equals(dec, samples))
      // Any strict prefix of the byte stream must reject, not underflow.
      val cut = 13 + rnd.nextInt(wav.length - 14)
      intercept[IllegalArgumentException] { RealCodec.wavDecode(wav.take(cut)) }

      val (w, h) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(40))
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val ppm = RealCodec.ppmEncode(w, h, rgb)
      val (dw, dh, drgb) = RealCodec.ppmDecode(ppm)
      assert(dw == w && dh == h && java.util.Arrays.equals(drgb, rgb))
      intercept[IllegalArgumentException] {
        RealCodec.ppmDecode(ppm.take(ppm.length - 1 - rnd.nextInt(rgb.length)))
      }
    }
  }

  test("PNG round-trips bit-exactly under all five scanline filters") {
    import graft.ops.Multimodal.RealCodec
    val rnd = new scala.util.Random(1717)
    for (trial <- 1 to 25) {
      val (w, h) = (1 + rnd.nextInt(64), 1 + rnd.nextInt(48))
      // Mix structured content (gradients compress; exercises real filter
      // deltas) with noise.
      val rgb = Array.tabulate(w * h * 3) { i =>
        if (trial % 2 == 0) ((i / 3) % 256).toByte else rnd.nextInt(256).toByte
      }
      for (filter <- 0 to 4) {
        val png = RealCodec.pngEncode(w, h, rgb, filter)
        assert(RealCodec.isPng(png))
        val (dw, dh, back) = RealCodec.pngDecode(png)
        assert(dw == w && dh == h, s"filter $filter: ${dw}x$dh")
        assert(java.util.Arrays.equals(back, rgb), s"filter $filter pixels differ")
      }
      // Truncation rejects (never a silent zero-pad or underflow).
      val png = RealCodec.pngEncode(w, h, rgb, trial % 5)
      val cut = 8 + rnd.nextInt(png.length - 9)
      intercept[IllegalArgumentException] { RealCodec.pngDecode(png.take(cut)) }
    }
  }

  test("JPEG: uniform-block gray is EXACT; color/noise within JPEG tolerance; malformed rejects") {
    import graft.ops.Jpeg
    val rnd = new scala.util.Random(3434)
    // Uniform 8x8 blocks at flat quant 1: every AC is exactly 0 and the
    // DC survives exactly -> bit-exact round-trip despite a lossy format.
    for (trial <- 1 to 15) {
      val (bw, bh) = (1 + rnd.nextInt(6), 1 + rnd.nextInt(6))
      val (w, h) = (bw * 8, bh * 8)
      val gray = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w)
        gray(y * w + x) = ((trial * 37 + (y / 8) * bw + (x / 8)) * 29 % 256).toByte
      val jpg = Jpeg.encode(w, h, gray, quant = 1)
      assert(Jpeg.isJpeg(jpg))
      val (dw, dh, back) = Jpeg.decode(jpg)
      assert(dw == w && dh == h && back.length == w * h)
      assert(java.util.Arrays.equals(back, gray), s"trial $trial: uniform-block gray not exact")
      // It really compresses: uniform blocks are DC-only (EOB after DC).
      // Only meaningful once the ~300-byte header amortizes.
      if (w * h >= 4096)
        assert(jpg.length < w * h / 2, s"${jpg.length} bytes for ${w * h} px")
    }
    // Noise + gradients (gray and RGB): honest lossy behavior, error
    // bounded at flat quant 1 (DCT rounding + color convert only).
    for (trial <- 1 to 10) {
      val (w, h) = (8 + rnd.nextInt(40), 8 + rnd.nextInt(40)) // incl. non-x8
      val gray = Array.tabulate(w * h)(i =>
        if (trial % 2 == 0) rnd.nextInt(256).toByte else ((i * 3) % 256).toByte)
      val (gw2, gh2, gBack) = Jpeg.decode(Jpeg.encode(w, h, gray, quant = 1))
      assert(gw2 == w && gh2 == h)
      for (i <- 0 until w * h)
        assert(Math.abs((gBack(i) & 0xFF) - (gray(i) & 0xFF)) <= 2,
          s"gray err at $i: ${gBack(i) & 0xFF} vs ${gray(i) & 0xFF}")
      val rgb = Array.tabulate(w * h * 3)(i =>
        if (trial % 2 == 0) rnd.nextInt(256).toByte else ((i * 7) % 256).toByte)
      val (cw, ch, cBack) = Jpeg.decode(Jpeg.encode(w, h, rgb, quant = 1))
      assert(cw == w && ch == h && cBack.length == w * h * 3)
      var err = 0L
      for (i <- 0 until rgb.length)
        err += Math.abs((cBack(i) & 0xFF) - (rgb(i) & 0xFF))
      // Mean abs error per channel sample stays small (YCbCr round-trip
      // costs ~1 LSB; random noise worst-case a few LSB).
      assert(err.toDouble / rgb.length < 4.0, s"mean err ${err.toDouble / rgb.length}")
    }
    // Higher quant actually quantizes (more loss, smaller file).
    val g = Array.tabulate(64 * 64)(i => ((i * 13) % 256).toByte)
    val q1 = Jpeg.encode(64, 64, g, quant = 1)
    val q16 = Jpeg.encode(64, 64, g, quant = 16)
    assert(q16.length < q1.length)
    // Truncation / corruption rejects.
    val jpg = Jpeg.encode(16, 16, Array.fill(256)(77.toByte))
    intercept[IllegalArgumentException] { Jpeg.decode(jpg.take(jpg.length / 2)) }
    intercept[IllegalArgumentException] { Jpeg.decode(Array[Byte](1, 2, 3)) }
  }

  test("GIF LZW round-trips bit-exactly incl. dictionary-reset and KwKwK inputs") {
    import graft.ops.Multimodal.RealCodec
    val rnd = new scala.util.Random(2929)
    val palette = Array.tabulate(768)(i => ((i * 37 + 11) % 256).toByte)
    for (trial <- 1 to 25) {
      val (w, h) = (1 + rnd.nextInt(80), 1 + rnd.nextInt(60))
      val idx = trial % 3 match {
        case 0 => Array.fill(w * h)(rnd.nextInt(256).toByte) // noise: dict fills fast
        case 1 => Array.tabulate(w * h)(i => (i % 7).toByte) // runs: KwKwK-heavy
        case _ => Array.fill(w * h)(0.toByte)                // constant: aaa... KwKwK chain
      }
      val gif = RealCodec.gifEncode(w, h, idx, palette)
      assert(RealCodec.isGif(gif))
      val (dw, dh, rgb) = RealCodec.gifDecode(gif)
      assert(dw == w && dh == h)
      val want = idx.flatMap { b =>
        val p = (b & 0xFF) * 3
        Array(palette(p), palette(p + 1), palette(p + 2))
      }
      assert(java.util.Arrays.equals(rgb, want), s"trial $trial pixels differ")
    }
    // Force many dictionary resets: a big noise image (> 4096 new strings).
    val big = Array.fill(300 * 200)(rnd.nextInt(256).toByte)
    val (bw, bh, brgb) = RealCodec.gifDecode(RealCodec.gifEncode(300, 200, big, palette))
    assert(bw == 300 && bh == 200)
    assert(java.util.Arrays.equals(brgb, big.flatMap { b =>
      val p = (b & 0xFF) * 3
      Array(palette(p), palette(p + 1), palette(p + 2))
    }))
    // Truncation rejects.
    val g = RealCodec.gifEncode(40, 30, Array.fill(1200)(5.toByte), palette)
    intercept[IllegalArgumentException] { RealCodec.gifDecode(g.take(g.length / 2)) }
  }

  test("stereo WAV payloads are rejected, not silently decoded as mono") {
    import graft.ops.Multimodal.RealCodec
    import java.nio.{ByteBuffer, ByteOrder}
    // Hand-build a 2-channel PCM16 WAV; wavDecode must refuse it (the
    // old code read interleaved stereo as mono: wrong sample/frame math).
    val samples = 64
    val dataLen = samples * 2 * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(2) // PCM, STEREO
    buf.putInt(16000).putInt(16000 * 4)
    buf.putShort(4).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until samples * 2).foreach(i => buf.putShort(i.toShort))
    val e = intercept[IllegalArgumentException] { RealCodec.wavDecode(buf.array()) }
    assert(e.getMessage.contains("mono only"))
  }

  test("vocab ignores empty/whitespace-only documents (oracle words() parity)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, ""), (3L, "   "), (4L, "a c")).toDF("doc_id", "text")
    val got = graft.ops.Ops.vocab(docs, minCount = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // split(trim(''), '\s+') yields [''] — the empty token must NOT count.
    assert(got == Set(("a", 3L, 2L), ("b", 1L, 1L), ("c", 1L, 1L)), got.toString)
  }

  test("real WAV and PPM codecs round-trip bit-exactly; dispatch falls back") {
    import graft.ops.Multimodal.{Codec, FakeCodec, RealCodec}
    // WAV: encode -> decode returns the exact samples and rate.
    val samples = Array.tabulate(3000)(i => ((i * 37 + 11) % 65536 - 32768).toShort)
    val wav = RealCodec.wavEncode(samples, 22050)
    assert(RealCodec.isWav(wav))
    val (sr, dec) = RealCodec.wavDecode(wav)
    assert(sr == 22050 && java.util.Arrays.equals(dec, samples))
    // Chunk walker tolerates a foreign chunk between header and fmt/data.
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    assert(java.util.Arrays.equals(RealCodec.wavDecode(spliced)._2, samples))
    // PPM: encode -> decode returns the exact pixels.
    val rgb = Array.tabulate(10 * 6 * 3)(i => ((i * 7) % 256).toByte)
    val ppm = RealCodec.ppmEncode(10, 6, rgb)
    assert(RealCodec.isPpm(ppm))
    val (w, h, back) = RealCodec.ppmDecode(ppm)
    assert(w == 10 && h == 6 && java.util.Arrays.equals(back, rgb))
    // Header comments and whitespace runs parse.
    val weird = "P6\n# a comment\n10 6\n255\n".getBytes("US-ASCII") ++ rgb
    assert(java.util.Arrays.equals(RealCodec.ppmDecode(weird)._3, rgb))
    // Nearest-neighbor resize: target (x,y) = source (x*w/w2, y*h/h2).
    val (rw, rh, rr) = RealCodec.ppmDecode(RealCodec.ppmResize(ppm, 5, 3))
    assert(rw == 5 && rh == 3)
    for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3)
      assert(rr((y * 5 + x) * 3 + c) == rgb(((y * 2) * 10 + x * 2) * 3 + c))
    // Dispatch: real frame counts and well-formed features...
    assert(Codec.frameCount(wav, "audio") == 3) // ceil(3000/1024)
    assert(Codec.frameCount(ppm, "image") == 1)
    val af = Codec.decodeToFeatures(wav, 4)
    assert(af.length == 4 && af.forall(v => v >= 0f && v < 1f) && af.exists(_ > 0f))
    val imf = Codec.decodeToFeatures(ppm, 8)
    assert(imf.length == 8 && math.abs(imf.sum - 1.0) < 1e-6)
    // ...and unknown payloads fall back to the declared stub.
    val junk = "not a media payload".getBytes("US-ASCII")
    assert(java.util.Arrays.equals(
      Codec.decodeToFeatures(junk, 8), FakeCodec.decodeToFeatures(junk, 8)))
  }

  test("media pipeline stages decode real payloads end to end") {
    import graft.ops.Multimodal
    val spark = SparkTestBase.spark
    import spark.implicits._
    val samples = Array.tabulate(2500)(i => ((i * 13) % 65536 - 32768).toShort)
    val wavBlob = Multimodal.MediaBlob(1L, "audio",
      Multimodal.RealCodec.wavEncode(samples, 16000), 0, 0, 16000)
    val rgb = Array.tabulate(16 * 12 * 3)(i => ((i * 11) % 256).toByte)
    val ppmBlob = Multimodal.MediaBlob(2L, "image",
      Multimodal.RealCodec.ppmEncode(16, 12, rgb), 16, 12, 0)
    val media = spark.createDataset(Seq(wavBlob, ppmBlob))
    val feats = Multimodal.extractFeatures(spark, media, featureDim = 8)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).frames == 3 && feats(1L).feature.length == 8) // ceil(2500/1024)
    assert(feats(2L).frames == 1 && math.abs(feats(2L).feature.sum - 1.0) < 1e-6)
    val frames = Multimodal.sampleFrames(spark, media, stride = 2, featureDim = 4)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2)) // of frames 0..2
    assert(frames(2L).map(_.frame_idx).toSeq == Seq(0))
    // Per-window audio features match a direct window computation.
    val w0 = Multimodal.RealCodec.audioFeatures(samples.slice(0, 1024), 4)
    assert(frames(1L).find(_.frame_idx == 0).get.feature.toSeq == w0.toSeq)
    val resized = Multimodal.resize(spark, media, 8, 8).collect()
      .map(r => r.doc_id -> r).toMap
    val (rw, rh, _) = Multimodal.RealCodec.ppmDecode(resized(2L).payload)
    assert(rw == 8 && rh == 8)
  }

  test("resize and frame-sample stages are deterministic with fixed shapes") {
    val spark = SparkTestBase.spark
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val resized = Multimodal.resize(spark, media, 32, 32).collect()
    assert(resized.nonEmpty)
    resized.foreach(b => assert(b.width == 32 && b.height == 32 && b.payload.nonEmpty))
    val frames = Multimodal.sampleFrames(spark, media, stride = 2, featureDim = 16)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach(f => assert(f.feature.length == 16 && f.frame_idx % 2 == 0))
    // Deterministic.
    val again = Multimodal.sampleFrames(spark,
      Multimodal.mediaTable(spark, "/root/testdata/sf0.001").repartition(5), 2, 16)
      .collect().map(f => (f.doc_id, f.frame_idx) -> f.feature.toSeq).toMap
    frames.foreach(f => assert(again((f.doc_id, f.frame_idx)) == f.feature.toSeq))
  }
}

/** Aggregator-based ANN equals the window-based baseline. */
class AnnAggSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("annBruteForceAgg matches annBruteForce") {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val a = Ops.annBruteForce(spark, emb, queries, k = 5)
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val b = Ops.annBruteForceAgg(spark, emb, queries, k = 5)
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }
}

/** Scale-shape assertions: candidate-generation shuffles carry ids only,
  * never document text or embedding payloads. */
class PayloadFreeShuffleSpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

  private def shuffleOutputs(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: ShuffleExchangeExec => buf += s.output.map(_.name).toSeq
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
  }

  test("htmlToText strips tags, scripts, comments; unescapes entities") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val html = "<html><head><script>var x = 1 < 2;</script>" +
      "<style>.a { color: red; }</style></head>" +
      "<!-- a\ncomment --><body><p>Hello  <b>world</b></p>\n" +
      "<div>5 &lt; 6 &amp;&amp; 7 &gt; 4, &quot;q&#39;s&quot;</div></body></html>"
    val out = Ops.htmlToText(
      Seq((1L, html.getBytes("UTF-8"))).toDF("page_id", "html"))
      .select("extracted_text").head.getString(0)
    assert(out == "Hello world 5 < 6 && 7 > 4, \"q's\"", out)
  }

  test("PII detection and redaction handle the standard shapes") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "write to a.b+c@x-y.example or 555-123-4567 from 10.0.0.1 now"),
      (2L, "no pii here at all"),
      (3L, "two mails: u@a.io and v@b.co, ip 192.168.001.1")).toDF("doc_id", "text")
    val sig = Ops.piiSignals(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(sig(1L) == ((1, 1, 1)) && sig(2L) == ((0, 0, 0)) && sig(3L) == ((2, 0, 1)))
    val red = Ops.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "write to <EMAIL> or <PHONE> from <IP> now")
    assert(red(2L) == "no pii here at all")
    assert(red(3L) == "two mails: <EMAIL> and <EMAIL>, ip <IP>")
  }

  test("URL normalization canonicalizes scheme/host/port/utm/fragment") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTPS://Ex.Example:443/a/b?utm_source=x&id=7&utm_c=y#frag"),
      (2L, "http://h.example:80/p?utm_only=1"),
      (3L, "https://ok.example/clean?id=1"),
      (4L, "https://keep.example:8080/p"),
      (5L, "https://ex.example/utm_guide?id=1"),      // 'utm_' in the PATH
      (6L, "https://ex.example/p?a=1&myutm_x=2"),     // 'utm_' inside a name
      (7L, "https://ex.example/p?utm_a=1&utm_b=2&id=3")).toDF("doc_id", "url")
    val out = Ops.normalizeUrls(urls).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "https://ex.example/a/b?id=7")
    assert(out(2L) == "http://h.example/p")
    assert(out(3L) == "https://ok.example/clean?id=1")
    assert(out(4L) == "https://keep.example:8080/p") // non-default port kept
    // Only parameter-boundary utm_ strips; paths and other params survive.
    assert(out(5L) == "https://ex.example/utm_guide?id=1")
    assert(out(6L) == "https://ex.example/p?a=1&myutm_x=2")
    assert(out(7L) == "https://ex.example/p?id=3")
  }

  test("lineDedup removes exactly the corpus-frequent lines, preserving order") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // df(common) = 4 docs (within-doc repeats count once), df(shared) = 2.
    val in = Seq(
      (1L, "common\nunique one\nshared"),
      (2L, "shared\ncommon\nunique two"),
      (3L, "common\nunique three"),
      (4L, "common\ncommon")).toDF("doc_id", "text")
    val out = Ops.lineDedup(spark, in, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3, 2L, "unique one\nshared"),
      (2L, 3, 2L, "shared\nunique two"),
      (3L, 2, 1L, "unique three"),
      (4L, 2, 0L, ""))) // all lines removed -> empty doc, not a dropped row
  }

  test("lineDedup fallback: df aggregation shuffles fingerprints, not line text") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // 2-word lines (single-word lines are ALL corpus-frequent here, and an
    // all-boilerplate corpus lets AQE fold the empty kept-side join away).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", graft.ops.Ops.relineSql(2) + " AS text")
    val out = Ops.lineDedupShuffle(spark, docs, minDocs = 5)
    assert(out.agg(sum("n_kept")).head.getLong(0) > 0, "kept lines must survive")
    val shuffles = shuffleOutputs(out)
    // The doc-frequency aggregation exchanges (line_fp, doc_id) only.
    assert(shuffles.exists(s => s.exists(_ == "line_fp") && !s.exists(_ == "line")))
    // Line payloads cross the wire at most once (the per-doc reassembly);
    // the boilerplate set broadcasts into the anti join.
    assert(shuffles.count(_.exists(_ == "line")) <= 1, shuffles.toString)
  }

  test("dedupSpans shuffles carry (doc_id, pos, fp) only — never text") {
    val spark = SparkTestBase.spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // Broadcast path (the common case): the span merge runs inside the
    // probe scan, so the returned plan carries ZERO exchanges (the
    // two-level fp count ran eagerly at build time, map-side partials
    // bounding any hot fp).
    val out = Ops.dedupSpans(spark, docs, window = 4)
    assert(out.count() > 0, "sf0.001 tiny-vocab corpus must have dup spans")
    assert(shuffleOutputs(out).isEmpty, shuffleOutputs(out).toString)
    // Shuffle fallback (dup-fp set over the broadcast cap): exchanges
    // carry ids/fingerprints only — never document text — and stay at
    // two (fp semi-join + doc_id island merge).
    val fb = Ops.dedupSpans(spark, docs, window = 4, broadcastMaxFps = -1)
    assert(fb.count() > 0)
    val shuffles = shuffleOutputs(fb)
    assert(shuffles.nonEmpty)
    assert(shuffles.forall(!_.exists(_ == "text")), shuffles.toString)
    assert(shuffles.size <= 2, shuffles.toString)
  }

  test("lineDedup fast path: zero exchanges in the result plan, equals the shuffle path") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", graft.ops.Ops.relineSql(2) + " AS text")
    val fast = Ops.lineDedup(spark, docs, minDocs = 5) // default cap -> broadcast path
    // The corpus text never crosses an exchange: the returned plan is
    // scan -> project(drop_boiler_lines) with NO shuffle at all (the
    // fingerprint-only df aggregation ran eagerly at build time).
    assert(shuffleOutputs(fast).isEmpty, shuffleOutputs(fast).toString)
    val slow = Ops.lineDedupShuffle(spark, docs, minDocs = 5)
    val diff = fast.exceptAll(slow).count() + slow.exceptAll(fast).count()
    assert(diff == 0, s"fast/shuffle paths diverge on $diff rows")
    // All-dropped docs: single-word lines are corpus-frequent -> a corpus
    // of 1-word lines collapses to empty docs identically on both paths.
    val docs1 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", graft.ops.Ops.relineSql(1) + " AS text").limit(50)
    val f1 = Ops.lineDedup(spark, docs1, minDocs = 2)
    val s1 = Ops.lineDedupShuffle(spark, docs1, minDocs = 2)
    assert(f1.exceptAll(s1).count() + s1.exceptAll(f1).count() == 0)
    // Approx-df (the 10^12-doc path: HLL sketches combine map-side, so
    // the df exchange is per-fingerprint-per-partition, not per-pair):
    // equals the exact path when boilerplate df is well separated from
    // the threshold — here df(boiler) ~ hundreds vs minDocs=5 vs
    // df(content)=1, far beyond the 5% rsd.
    val fa = Ops.lineDedup(spark, docs, minDocs = 5, approxDfRsd = 0.05)
    assert(fa.exceptAll(slow).count() + slow.exceptAll(fa).count() == 0,
      "approx-df path diverged on a well-separated corpus")
    // NULL text: both paths must yield (null n_lines, 0, '') identically.
    val withNull = spark.sql(
      "SELECT 900 AS doc_id, CAST(NULL AS STRING) AS text " +
        "UNION ALL SELECT 901, 'a\nb\na\nb' UNION ALL SELECT 902, 'a\nb\nc'")
    val fn = Ops.lineDedup(spark, withNull, minDocs = 2).orderBy("doc_id").collect()
    val sn = Ops.lineDedupShuffle(spark, withNull, minDocs = 2).orderBy("doc_id").collect()
    assert(fn.toSeq == sn.toSeq, s"null-text divergence: ${fn.toSeq} vs ${sn.toSeq}")
    assert(fn(0).isNullAt(1) && fn(0).getLong(2) == 0L && fn(0).getString(3) == "")
  }

  test("lineDedupByDomain scopes boilerplate per domain; fast equals shuffle") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // "nav bar" appears in all 6 docs (3 per domain); "site a promo" only
    // inside domain a (3 docs). With minDocs = 4: the GLOBAL key drops
    // "nav bar" everywhere (df 6 >= 4), while the DOMAIN key keeps it
    // (per-domain df 3 < 4) — cross-site navigation chrome is not corpus
    // boilerplate. With minDocs = 3 the domain key drops both within
    // their domains.
    val docs = Seq(
      (1L, "a.example", "nav bar\nsite a promo\nbody one"),
      (2L, "a.example", "nav bar\nsite a promo\nbody two"),
      (3L, "a.example", "nav bar\nsite a promo\nbody three"),
      (4L, "b.example", "nav bar\nbody four"),
      (5L, "b.example", "nav bar\nbody five"),
      (6L, "b.example", "nav bar\nbody six")
    ).toDF("doc_id", "domain", "text")

    val global4 = Ops.lineDedup(spark, docs.drop("domain"), minDocs = 4)
      .orderBy("doc_id").collect().map(_.getString(3))
    val domain4 = Ops.lineDedupByDomain(spark, docs, minDocs = 4)
      .orderBy("doc_id").collect().map(_.getString(4))
    assert(global4(0) == "site a promo\nbody one") // global strips nav bar
    assert(domain4(0) == "nav bar\nsite a promo\nbody one") // scoped keeps it
    assert(domain4(3) == "nav bar\nbody four")

    val domain3 = Ops.lineDedupByDomain(spark, docs, minDocs = 3)
      .orderBy("doc_id").collect().map(_.getString(4))
    assert(domain3(0) == "body one" && domain3(3) == "body four")

    // Fast (broadcast kernel) == shuffle formulation, including a null
    // domain (groups as '') and a null text row.
    val messy = docs.unionByName(Seq(
      (7L, null.asInstanceOf[String], "nav bar\nbody seven"),
      (8L, "a.example", null.asInstanceOf[String])
    ).toDF("doc_id", "domain", "text"))
    val fast = Ops.lineDedupByDomain(spark, messy, minDocs = 2)
    assert(shuffleOutputs(fast).isEmpty, shuffleOutputs(fast).toString)
    val slow = Ops.lineDedupByDomain(spark, messy, minDocs = 2,
      broadcastMaxFps = -1)
    assert(fast.exceptAll(slow).count() + slow.exceptAll(fast).count() == 0)

    // lineDedupByUrl extracts the host with domainCap's pattern.
    val pages = docs.withColumn("url",
      concat(lit("https://"), col("domain"), lit("/page"))).drop("domain")
    val viaUrl = Ops.lineDedupByUrl(spark, pages, minDocs = 4)
      .orderBy("doc_id").collect().map(_.getString(4))
    assert(viaUrl.toSeq == domain4.toSeq)
  }

  test("repetitionSignals computes exact fractions per row, shuffle-free") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Ops.repetitionSignals(spark, Seq((1L, "a b\na b\nc d")).toDF("doc_id", "text"))
    val r = df.collect().head
    assert(r.getInt(1) == 3 && r.getInt(2) == 6)
    assert(math.abs(r.getDouble(3) - (1.0 - 2.0 / 3)) < 1e-12) // 2 distinct of 3 lines
    assert(math.abs(r.getDouble(4) - 6.0 / 9) < 1e-12)         // 6 of 9 chars in dup lines
    assert(math.abs(r.getDouble(5) - 2.0 / 6) < 1e-12)         // 'a' x2 of 6 words
    assert(math.abs(r.getDouble(6) - 2.0 / 5) < 1e-12)         // 'a b' x2 of 5 bigrams
    assert(shuffleOutputs(df).isEmpty, "per-row signals must not shuffle")
    // Single-word doc: no bigrams, nothing duplicated, no division blowups.
    val one = Ops.repetitionSignals(spark,
      Seq((2L, "solo")).toDF("doc_id", "text")).collect().head
    assert(one.getInt(1) == 1 && one.getInt(2) == 1)
    assert(one.getDouble(3) == 0.0 && one.getDouble(4) == 0.0 && one.getDouble(6) == 0.0)
  }

  test("repetitionSignals kernel equals the declarative HOF formulation") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // The whole sf0.001 corpus re-lined, plus handcrafted edge shapes:
    // leading newline (empty first word), trailing spaces, repeated empty
    // lines, a single char, heavy repetition.
    val edges = Seq(
      (100001L, "\na b"), (100002L, "a b  "), (100003L, "x\n\n\ny"),
      (100004L, "z"), (100005L, "w w w w\nw w\nw w"),
      (100006L, " padded \n padded ")).toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", graft.ops.Ops.relineSql(2) + " AS text")
      .unionByName(edges)
    def key(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id", "n_lines", "n_words",
      "cast(floor(dup_line_frac * 1e9) as bigint) AS a",
      "cast(floor(dup_char_frac * 1e9) as bigint) AS b",
      "cast(floor(top_word_frac * 1e9) as bigint) AS c",
      "cast(floor(top_bigram_frac * 1e9) as bigint) AS d")
    val fast = key(Ops.repetitionSignals(spark, docs))
    val ref = key(Ops.repetitionSignalsHof(docs))
    assert(fast.except(ref).isEmpty && ref.except(fast).isEmpty)
  }

  test("domainCap equals the window formulation and bounds per-domain rows") {
    val spark = SparkTestBase.spark
    val pages = graft.engine.Pages.pages(spark, "/root/testdata/sf0.001")
    val capped = Ops.domainCap(spark, pages, maxPerDomain = 3)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("domain").orderBy("page_id")
    val expect = pages
      .withColumn("domain", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3).select("domain", "page_id", "rnk")
    assert(capped.except(expect).isEmpty && expect.except(capped).isEmpty)
    assert(capped.groupBy("domain").count().agg(max("count")).head.getLong(0) <= 3)
    // Mixed-case schemes/hosts group under the lowercased real host, never
    // a shared '' domain (which would cap unrelated pages together).
    import spark.implicits._
    val mixed = Seq((1L, "HTTPS://Host-1.Example/a"), (2L, "https://host-1.example/b"),
      (3L, "HTTP://Other.Example/c")).toDF("page_id", "url")
    val got = Ops.domainCap(spark, mixed, maxPerDomain = 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("host-1.example", 1L), ("host-1.example", 2L),
      ("other.example", 3L)))
  }

  test("hashSplit is deterministic, content-addressed, and honors percentages") {
    val spark = SparkTestBase.spark
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val s1 = Ops.hashSplit(spark, corpus)
    // Identical texts can never straddle a split boundary (leakage guard).
    val perText = corpus.join(s1, "doc_id").groupBy("text")
      .agg(countDistinct("split").as("n"))
    assert(perText.agg(max("n")).head.getLong(0) == 1L)
    val frac = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = corpus.count().toDouble
    assert(frac("train") / n > 0.8 && frac("train") / n < 0.97, frac.toString)
    assert(frac.getOrElse("valid", 0L) + frac.getOrElse("test", 0L) > 0)
  }

  test("dedupMinHash: band-join and pair-dedup shuffles are text-free") {
    val spark = SparkTestBase.spark
    // Force shuffle joins so the candidate exchanges are observable (at
    // production scale neither side broadcasts).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Ops.dedupMinHash(spark, docs, threshold = 0.5)
    val shuffles = shuffleOutputs(df)
    assert(shuffles.nonEmpty)
    // Text may appear only in the final verification join (keyed by a_id /
    // b_id); the band-hash candidate shuffles must not carry it.
    shuffles.filter(_.exists(_.contains("band"))).foreach { cols =>
      assert(!cols.exists(_.contains("text")), cols.toString)
    }
    assert(shuffles.exists(_.exists(_.contains("band"))))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedupNgramExact: shingle/candidate shuffles are text-free") {
    val spark = SparkTestBase.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val df = Ops.dedupNgramExact(spark, docs, threshold = 0.5)
      val shuffles = shuffleOutputs(df)
      // Every shingle-keyed exchange (df join + candidate probe) is
      // id-only; text appears only in the final verification join.
      shuffles.filter(_.exists(_ == "fp")).foreach { cols =>
        assert(!cols.exists(_.contains("text")), cols.toString)
      }
      assert(shuffles.exists(_.exists(_ == "fp")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("annLsh: bucket-join and dedup shuffles are embedding-free") {
    val spark = SparkTestBase.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Ops.annLsh(spark, emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0), k = 5)
    val shuffles = shuffleOutputs(df)
    shuffles.filter(_.exists(_ == "bucket")).foreach { cols =>
      assert(!cols.exists(c => c.contains("embedding") || c.contains("vec" + "_val")), cols.toString)
    }
    assert(shuffles.exists(_.exists(_ == "bucket")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

/** IVF ANN: recall vs brute force at test scale. */
class AnnIvfSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("IVF achieves reasonable recall and never exceeds brute results") {
    val spark = SparkTestBase.spark
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val brute = Ops.annBruteForce(spark, emb, queries, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ops.annIvf(spark, emb, queries, k = 5, nCentroids = 32, nProbe = 8, nAssign = 2)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // Floor at the driver parameterization (nAssign=2); observed 0.85.
    assert(recall >= 0.8, s"recall $recall")
    println(s"IVF_RECALL=$recall")
  }

  test("IVF centroid assignment is exchange-free (map-side broadcast argmax)") {
    val spark = SparkTestBase.spark
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val centRows = emb
      .orderBy(expr("(vec_id * 48271) % 2147483647"), col("vec_id"))
      .limit(32).select("vec_id", "embedding").collect()
    val bc = spark.sparkContext.broadcast(new graft.ops.CentroidSet(
      centRows.map(_.getLong(0)), centRows.map(_.getSeq[Float](1).toArray)))
    val assigned = Ops.assignToCentroids(emb, "vec_id", "embedding", 2, bc)
    assigned.collect() // force execution so the final plan is the real one
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"IVF assignment must not shuffle; plan:\n$plan")
    // Same values as the reference crossJoin+Window argmax formulation.
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val cent = broadcast(emb
        .orderBy(expr("(vec_id * 48271) % 2147483647"), col("vec_id"))
        .limit(32).select(col("vec_id").as("cid"), col("embedding").as("c_vec")))
      graft.ops.OpsFunctions.register(spark)
      val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
      emb.select(col("vec_id"), col("embedding")).crossJoin(cent)
        .withColumn("csim", expr("cosine_similarity(embedding, c_vec)"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= 2).select("vec_id", "cid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val viaExpr = assigned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaExpr == viaWindow)
  }

  test("IVF-PQ recall floor vs brute force (driver params)") {
    val spark = SparkTestBase.spark
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val brute = Ops.annBruteForce(spark, emb, queries, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Ops.annIvfPq(spark, emb, queries, k = 5, nCentroids = 32,
        nProbe = 8, nAssign = 3, nSub = 16, nCodewords = 16, rerankDepth = 50)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    println(s"IVF_PQ_RECALL=$recall")
    // The exact re-rank bounds PQ loss to candidate selection: the IVF
    // probe recall is the ceiling. nAssign=3 (multi-assignment on the
    // index side) lifts it to 0.91 observed at driver params without
    // touching per-query probe cost (param sweep: (8,2)->0.83,
    // (16,2)->0.88, (8,3)->0.91, (12,3)->0.93).
    assert(recall >= 0.88, s"recall $recall")
  }

  test("IVF-PQ: raw vectors only reach the exact re-rank stage") {
    val spark = SparkTestBase.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Force shuffle joins so every exchange is observable.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      val queries = emb.filter(col("vec_id") % 25 === 0)
      val out = Ops.annIvfPq(spark, emb, queries, k = 5, nSub = 16, rerankDepth = 50)
      val shuffles = PlanProbe.shuffleOutputs(out)
      // Candidate-generation/ADC exchanges (keyed by cid or carrying codes)
      // must not move raw embedding payloads; embeddings may appear only in
      // the re-rank join, which processes <= rerankDepth rows per query.
      val candShuffles = shuffles.filter(s =>
        s.exists(_ == "cid") || s.exists(_ == "codes"))
      assert(candShuffles.nonEmpty)
      candShuffles.foreach { cols =>
        assert(!cols.exists(c => c.contains("embedding") || c.contains("q_vec")),
          cols.toString)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("PQ codes are well-formed and encode deterministically") {
    val spark = SparkTestBase.spark
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cwArr = Array.tabulate(16) { mi =>
      emb.orderBy(expr(s"(vec_id * ${16807L + 1000003L * mi}) % 2147483647"),
          col("vec_id"))
        .limit(16).select(col("embedding")).collect()
        .map(_.getSeq[Float](0).slice(mi * 4, (mi + 1) * 4).map(_.toDouble).toArray)
    }
    val cb = spark.sparkContext.broadcast(new graft.ops.PqCodebook(16, 16, 4, cwArr))
    val codes = emb.select(col("vec_id"),
      org.apache.spark.sql.GraftBridge.column(graft.ops.PqEncodeExpr(
        org.apache.spark.sql.GraftBridge.expression(col("embedding")), cb)).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes.nonEmpty)
    codes.foreach { case (_, cs) =>
      assert(cs.length == 16 && cs.forall(c => c >= 0 && c < 16))
    }
    // A codeword's own source subvector encodes to itself (distance 0).
    val cw0Owner = emb.orderBy(expr("(vec_id * 16807) % 2147483647"), col("vec_id"))
      .limit(1).select("vec_id").head.getLong(0)
    val ownCode = codes.toMap.apply(cw0Owner)
    assert(ownCode(0) == 0, s"owner of codeword (0,0) must encode subspace 0 to 0, got $ownCode")
  }
}

/** Shared physical-plan probe (shuffle output columns). */
object PlanProbe {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

  def shuffleOutputs(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: ShuffleExchangeExec => buf += s.output.map(_.name).toSeq
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
  }
}
