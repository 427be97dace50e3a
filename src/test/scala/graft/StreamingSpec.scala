package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.engine.StreamingTiles

/** Structured Streaming tile roll-up (windowed state + watermark). */
class StreamingSpec extends AnyFunSuite {

  test("windowed tile counts over a memory stream") {
    val spark = SparkTestBase.spark
    import spark.implicits._

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double, Double)]
    val events = input.toDF().toDF("ts", "lat", "lng")

    val tiles = StreamingTiles.windowedTileCounts(spark, events)
    val query = tiles.writeStream
      .format("memory")
      .queryName("tile_counts")
      .outputMode("update")
      .start()

    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 10:05:00")
    input.addData(
      (t0, 48.8566, 2.3522), (t0, 48.8570, 2.3530), // Paris, same tile
      (t1, 40.7128, -74.0060)) // NYC
    query.processAllAvailable()

    val rows = spark.sql("SELECT tile, cnt FROM tile_counts").collect()
    assert(rows.nonEmpty)
    val parisTile = graft.h3.H3.cellToParent(
      graft.h3.H3.latLngToCell(48.8566, 2.3522, 9), 5)
    val parisRow = rows.find(_.getLong(0) == parisTile)
    assert(parisRow.isDefined && parisRow.get.getLong(1) == 2)

    query.stop()
  }

  test("streaming geofence join matches the batch join on the same rows") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Paris-ish rectangle (non-round bounds to dodge boundary hits).
    val lats = Array(48.712345, 48.712345, 49.012345, 49.012345)
    val lngs = Array(2.112345, 2.612345, 2.612345, 2.112345)
    val polys = Seq(graft.engine.SpatialJoin.Poly(7,
      new graft.h3.Geo.GeoPolygon(
        graft.h3.Geo.ringFromDegrees(lats, lngs), Array.empty)))

    val data = Seq( // (id, lat, lng): 3 inside, 2 outside
      (1L, 48.8566, 2.3522), (2L, 48.9, 2.2), (3L, 48.75, 2.5),
      (4L, 40.7128, -74.006), (5L, 49.5, 2.3))

    val input = MemoryStream[(Long, Double, Double)]
    val events = input.toDF().toDF("id", "lat", "lng")
    val out = StreamingTiles.streamingGeofenceJoin(spark, events, polys)
    val query = out.writeStream.format("memory").queryName("geo_hits")
      .outputMode("append").start()
    input.addData(data: _*)
    query.processAllAvailable()
    val streamed = spark.sql("SELECT id, poly_id FROM geo_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    query.stop()

    val batch = graft.engine.SpatialJoin.pipJoin(spark,
        data.toDF("id", "lat", "lng")
          .withColumn("cell9", expr("h3_latlng_to_cell(lat, lng, 9)")),
        polys, res = 9)
      .select("id", "poly_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(1L, 2L, 3L))
  }

  test("shuffle-join path with salting matches broadcast path") {
    val spark = SparkTestBase.spark
    val sfDir = "/root/testdata/sf0.001"
    val pts = graft.engine.Pages.indexedPages(spark, sfDir)
    val url = getClass.getResource("/h3/shapes/Paris.geojson")
    val polys = Seq(graft.engine.SpatialJoin.Poly(1,
      graft.h3.Geo.parseGeoJson(scala.io.Source.fromURL(url).mkString)(0)))

    val bcast = graft.engine.SpatialJoin
      .pipJoin(spark, pts, polys, res = 9, broadcastCover = true)
      .select("poly_id", "page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val shuffled = graft.engine.SpatialJoin
      .pipJoin(spark, pts, polys, res = 9, broadcastCover = false)
      .select("poly_id", "page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bcast == shuffled && bcast.nonEmpty)
  }
}

/** Extension injection + salting distribution evidence. */
class ExtensionsAndSkewSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("H3Extensions injects functions + optimizer rule into a fresh session") {
    val base = SparkTestBase.spark
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.spark.H3Extensions().apply(_))
      .getOrCreate()
    try {
      val v = s2.sql("SELECT h3_cell_to_parent(h3_latlng_to_cell(48.85, 2.35, 9), 5) AS p")
        .collect()(0).getLong(0)
      assert(graft.h3.H3.getResolution(v) == 5)
    } finally {
      // Keep the shared context alive for other suites.
      graft.spark.H3Functions.register(base)
    }
  }

  test("salting spreads a hot cover cell across reducers") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    graft.spark.H3Functions.register(spark)
    // All probe rows land on ONE cover cell (extreme skew).
    val hot = graft.h3.H3.latLngToCell(48.8566, 2.3522, 5)
    val n = 20000
    val probe = spark.range(n).selectExpr(
      s"${hot}L AS anc", "id AS payload",
      "48.8 + id * 1e-9 AS lat", "2.3 + id * 1e-9 AS lng")
    val salts = 8
    val salted = probe.withColumn("salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"anc", $"lat", $"lng"),
        org.apache.spark.sql.functions.lit(salts)).cast("int"))
    val dist = salted.groupBy("salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dist.size == salts, s"salts used: ${dist.size}")
    // No bucket holds more than 2x the fair share.
    assert(dist.values.max < 2L * n / salts, dist.toString)
  }
}

/** flatMapGroupsWithState custom per-tile state. */
class StatefulStreamingSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("per-tile running totals across triggers") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double, Double)]
    val events = input.toDF().toDF("ts", "lat", "lng")
    val updates = graft.engine.StreamingTiles.tileVisitStats(spark, events)
    val q = updates.writeStream.format("memory")
      .queryName("tile_stats").outputMode("update").start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData((t, 48.8566, 2.3522), (t, 48.8566, 2.3522))
    q.processAllAvailable()
    input.addData((t, 48.8570, 2.3530))
    q.processAllAvailable()
    val tile = graft.h3.H3.cellToParent(
      graft.h3.H3.latLngToCell(48.8566, 2.3522, 9), 5)
    val rows = spark.sql(
      s"SELECT total, distinct_cells FROM tile_stats WHERE tile = $tile ORDER BY total")
      .collect()
    // Second trigger carries state: total reaches 3.
    assert(rows.nonEmpty && rows.last.getLong(0) == 3)
    q.stop()
  }
}

/** Bounded streaming state: the per-tile HLL sketch stays 64 bytes and
  * estimates distinct cells within normal HLL error. */
class HllStateSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("HLL estimate tracks true cardinality within ~25%") {
    for (n <- Seq(10, 100, 5000)) {
      val regs = new Array[Byte](graft.engine.StreamingTiles.HllRegisters)
      (0 until n).foreach(i => graft.engine.StreamingTiles.hllAdd(regs, i * 2654435761L + 17))
      val est = graft.engine.StreamingTiles.hllEstimate(regs)
      assert(math.abs(est - n).toDouble / n <= 0.25, s"n=$n est=$est")
    }
  }
  test("HLL is insensitive to duplicates") {
    val regs = new Array[Byte](graft.engine.StreamingTiles.HllRegisters)
    (0 until 10000).foreach(i => graft.engine.StreamingTiles.hllAdd(regs, (i % 7).toLong))
    val est = graft.engine.StreamingTiles.hllEstimate(regs)
    assert(est >= 5 && est <= 9, s"est=$est")
  }
}

/** Streaming dedup: first fingerprint within the watermark wins. */
class StreamingDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("duplicate texts are suppressed across triggers within the watermark") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = graft.engine.StreamingTiles.streamingDedup(spark, docs)
    val q = out.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData((t, 1L, "alpha beta gamma"), (t, 2L, "alpha  BETA gamma"))
    q.processAllAvailable()
    input.addData((t, 3L, "alpha beta gamma"), (t, 4L, "something else"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT doc_id FROM dedup_stream ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    // doc 2 is a normalization-equal dup of 1; doc 3 a later exact dup.
    assert(rows == Seq(1L, 4L), rows.toString)
    q.stop()
  }

  test("streaming decontamination equals the batch operator, statelessly") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalSet = Seq((101L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "xx alpha beta gamma delta epsilon yy"))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = graft.engine.StreamingTiles.streamingDecontaminate(
      spark, input.toDF().toDF("doc_id", "text"), evalSet, shingle = 5)
    val q = out.writeStream.format("memory")
      .queryName("decon_stream").outputMode("append").start()
    input.addData(batch: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT doc_id, n_hits, contaminated FROM decon_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    q.stop()
    val expected = graft.ops.Ops.decontaminate(
        spark, batch.toDF("doc_id", "text"), evalSet, shingle = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamed == expected && streamed.exists(_._3) && streamed.exists(!_._3))
  }

  test("streaming LM scoring equals the batch fast path, statelessly") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq((1L, "a b c a b c"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c a b c"), // all-trigram
      (11L, "a b x"), // backoff + oov
      (12L, "   ")) // zero tokens
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = graft.engine.StreamingTiles.streamingLmScore(
      spark, input.toDF().toDF("doc_id", "text"), reference)
    val q = out.writeStream.format("memory")
      .queryName("lm_stream").outputMode("append").start()
    input.addData(batch: _*)
    q.processAllAvailable()
    val streamed = spark.sql(
        "SELECT doc_id, n_tokens, n_tri, n_bi, n_uni, n_oov, score_fp FROM lm_stream")
      .collect().map(_.toString).toSet
    q.stop()
    // Batch equivalent: score the same docs against the same reference
    // model (train on reference only -> union the two frames, predicate
    // selects the reference ids).
    val expected = graft.ops.Ops.lmScore(spark,
        reference.union(batch.toDF("doc_id", "text")),
        org.apache.spark.sql.functions.col("doc_id") < 10L)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 10L)
      .collect().map(_.toString).toSet
    assert(streamed == expected, s"$streamed vs $expected")
    assert(streamed.size == 3)
  }

  test("quality SQL expression equals qualityScore's quality column") {
    val spark = SparkTestBase.spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaOp = graft.ops.Ops.qualityScore(docs)
      .selectExpr("doc_id", "cast(floor(quality * 1e9) as bigint) AS q")
    val viaSql = docs.selectExpr("doc_id",
      s"cast(floor((${graft.ops.Ops.qualitySql}) * 1e9) as bigint) AS q")
    assert(viaOp.except(viaSql).isEmpty && viaSql.except(viaOp).isEmpty)
  }

  test("streaming curation equals the batch gates+dedup+split on the same rows") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val good1 = "the cat and the dog walk to the park with a friend in the sun"
    val good2 = "a table of values is read by the query and the rows flow on"
    val lowq = "1 2 3 4 5 6 7 8 9 0 1 2 3 4 5"         // digit-heavy -> low quality
    val spammy = "spam spam spam spam spam spam spam"   // top_word_frac = 1.0

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingTiles.streamingCuration(spark, docs,
      watermark = "5 minutes", windowDuration = "10 minutes")
    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData((t0, 1L, good1), (t0, 2L, good1), // exact duplicate
      (t0, 3L, good2), (t0, 4L, lowq), (t0, 5L, spammy))
    q.processAllAvailable()
    // Advance the watermark far past the window end to finalize it.
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 9L, good1))
    q.processAllAvailable()

    val got = spark.sql(
      "SELECT split, n_docs, tokens FROM curated WHERE window.start = timestamp'2024-01-01 10:00:00'")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // Batch reference over the same first-window rows: same gates, one
    // survivor per fingerprint, same content-hash split.
    val batch = Seq((1L, good1), (2L, good1), (3L, good2), (4L, lowq), (5L, spammy))
      .toDF("doc_id", "text")
    graft.ops.OpsFunctions.register(spark)
    val want = batch
      .filter(expr("text_repetition(text)").getField("top_word_frac") <= 0.8)
      .filter(expr(graft.ops.Ops.qualitySql) >= 0.5)
      .dropDuplicates("text")
      .join(graft.ops.Ops.hashSplit(spark, batch).select("doc_id", "split"), "doc_id")
      .groupBy("split").agg(count(lit(1)).as("n_docs"),
        sum(expr("cast(ceil(length(text) / 4.0) as bigint)")).as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.toSeq.map(_._2).sum == 2,
      s"got=$got want=$want") // dup, low-quality and spammy rows are gone
    q.stop()
  }

  test("streaming sessionize finalizes sessions bit-equal to batch sessionize") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Deterministic bursty log: 12 users, bursts separated by >30min gaps
    val rnd = new scala.util.Random(41)
    val base = 1700000000000L
    val rows = (0 until 400).map { i =>
      val user = rnd.nextInt(12).toLong
      val burst = rnd.nextInt(6)                   // 6 well-separated bursts
      val off = burst * 3L * 3600000L + rnd.nextInt(20) * 60000L
      (i.toLong, new Timestamp(base + off), user, "view")
    }

    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val out = StreamingTiles.streamingSessionize(spark, events)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    input.addData(rows: _*)
    q.processAllAvailable()
    // sentinel far in the future advances the watermark past every
    // session's end + gap, finalizing them all
    input.addData((9999L, new Timestamp(base + 365L * 86400000L), 999L, "view"))
    q.processAllAvailable()

    val streamed = spark.sql(
        """SELECT user_id, first_event_id, n_events, start_us, end_us,
                  duration_us FROM sessions WHERE user_id <> 999""")
      .collect().map(_.toString).toSet

    val batch = graft.ops.Temporal.sessionize(spark,
        rows.toDF("event_id", "ts", "user_id", "event_type"))
      .select("user_id", "first_event_id", "n_events", "start_us",
        "end_us", "duration_us")
      .collect().map(_.toString).toSet
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
    assert(streamed.size > 12) // several sessions per user actually formed
    q.stop()
  }

  test("streaming KMV distinct estimate converges bit-equal to batch") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two groups: one below k (exact), one far above it (estimated);
    // data arrives across TWO triggers to exercise state carry-over
    val rows = (0 until 12000).map { i =>
      if (i % 4 == 0) ("small", s"value-${(i / 4) % 120}")
      else ("big", s"text-${(i * 31) % 4000}")
    }
    val trueSmall = rows.collect { case ("small", v) => v }.distinct.size
    val trueBig = rows.collect { case ("big", v) => v }.distinct.size
    val (first, second) = rows.splitAt(7000)

    val input = MemoryStream[(String, String)]
    val out = graft.engine.StreamingTiles.streamingApproxDistinct(
      spark, input.toDF().toDF("grp", "v"))
    val q = out.toDF().writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    input.addData(first: _*)
    q.processAllAvailable()
    input.addData(second: _*)
    q.processAllAvailable()
    // update mode re-emits per trigger: the LAST emission per group is
    // the drained-stream state
    val streamed = spark.sql(
        """SELECT grp, est_distinct FROM (
             SELECT grp, est_distinct,
                    row_number() OVER (PARTITION BY grp ORDER BY mono DESC) AS rn
             FROM (SELECT grp, est_distinct,
                          monotonically_increasing_id() AS mono FROM kmv_stream))
           WHERE rn = 1""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val batch = graft.ops.Ops.approxDistinct(spark,
        rows.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
    assert(trueSmall < 256 && batch("small") == trueSmall.toLong) // exact
    assert(trueBig > 256 &&
      math.abs(batch("big") - trueBig.toDouble) / trueBig < 0.1) // estimated
    q.stop()
  }
}
