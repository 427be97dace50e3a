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
