package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._
import graft.h3.{Dissolve, Geo, H3}

/** End-to-end north-rule pipeline: synthesize pages -> resumable
  * prefix-partitioned icelite write -> pruned read -> PIP join -> tile
  * roll-up, verified against direct computation. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("icelite-backed spatial pipeline equals the direct computation") {
    val root = java.nio.file.Files.createTempDirectory("pipeline").toString
    val pages = Pages.indexedPages(spark, sfDir)

    // Resumable write partitioned by the res-1 prefix (coarse buckets so
    // the manifest stays small at test scale), with lineage recorded.
    val withBucket = pages.withColumn("bucket",
      expr("h3_cell_to_parent(cell9, 0)"))
    Icelite.writeResumable(spark, withBucket, root, "bucket",
      lineage = s"$sfDir/events.parquet + documents.parquet @ res9")
    val snap = Icelite.currentSnapshot(root).get
    assert(snap.entries.forall(e => e.rows > 0 && e.lineage.nonEmpty))
    assert(snap.entries.map(_.rows).sum == pages.count())

    // Read back; join + rollup.
    val url = getClass.getResource("/h3/shapes/Paris.geojson")
    val polys = Seq(SpatialJoin.Poly(1,
      Geo.parseGeoJson(scala.io.Source.fromURL(url).mkString)(0)))
    val fromTable = SpatialJoin.pipJoin(spark, Icelite.read(spark, root), polys, res = 9)
      .groupBy(expr("h3_cell_to_parent(cell9, 5)").as("tile"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val direct = SpatialJoin.pipJoin(spark, pages, polys, res = 9)
      .groupBy(expr("h3_cell_to_parent(cell9, 5)").as("tile"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(fromTable == direct && direct.nonEmpty)
  }

  test("dissolve accepts compacted (heterogeneous) input") {
    val parent = H3.latLngToCell(48.85, 2.35, 6)
    val kids = H3.cellToChildren(parent, 8)
    val compacted = H3.compactSorted(kids.sortBy(H3.orderKey))
    assert(compacted.length == 1)
    val disk = H3.gridDisk(parent, 1)
    // Mixed: one compacted res-6 cell + res-8 children of a neighbor.
    val neighborKids = H3.cellToChildren(disk.find(_ != parent).get, 8)
    val (rings, outer) = Dissolve.dissolveToRings(compacted ++ neighborKids)
    assert(outer.count(identity) == 1) // contiguous blob -> single shell
    val (rings2, _) = Dissolve.dissolveToRings(kids ++ neighborKids)
    // Same geometry as the fully-uncompacted input.
    assert(rings.map(_.length).sorted.toSeq == rings2.map(_.length).sorted.toSeq)
  }
}
