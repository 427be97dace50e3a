package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.h3.{Dissolve, Geo, H3}

/** cellsToMultiPolygon / h3SetToLinkedGeo semantics. */
class DissolveSpec extends AnyFunSuite {

  test("single cell dissolves to its own boundary") {
    val cell = H3.latLngToCell(48.8566, 2.3522, 8)
    val (rings, outer) = Dissolve.dissolveToRings(Array(cell))
    assert(rings.length == 1 && outer(0))
    val b = H3.cellToBoundary(cell)
    assert(rings(0).length == b.length)
    // Same vertex set (rotation may differ).
    val want = (0 until b.length / 2).map(i => (b(2 * i), b(2 * i + 1))).toSet
    val got = (0 until rings(0).length / 2)
      .map(i => (rings(0)(2 * i), rings(0)(2 * i + 1))).toSet
    assert(got == want)
  }

  test("7-cell disk dissolves to one ring with 18+ vertexes, no holes") {
    val cell = H3.latLngToCell(48.8566, 2.3522, 8)
    val disk = H3.gridDisk(cell, 1)
    val (rings, outer) = Dissolve.dissolveToRings(disk)
    assert(rings.length == 1 && outer(0))
    assert(rings(0).length / 2 >= 18)
  }

  test("hollow ring dissolves to an outer ring plus a hole") {
    val cell = H3.latLngToCell(48.8566, 2.3522, 8)
    val ring = H3.gridRing(cell, 1)
    val (rings, outer) = Dissolve.dissolveToRings(ring)
    assert(rings.length == 2)
    assert(outer.count(identity) == 1)
    assert(outer.count(!_) == 1)
  }

  test("two disjoint blobs dissolve to two polygons") {
    val a = H3.gridDisk(H3.latLngToCell(48.85, 2.35, 8), 1)
    val b = H3.gridDisk(H3.latLngToCell(40.71, -74.0, 8), 1)
    val (rings, outer) = Dissolve.dissolveToRings(a ++ b)
    assert(rings.length == 2 && outer.forall(identity))
    val json = Dissolve.dissolveToGeoJson(a ++ b)
    val polys = Geo.parseGeoJson(json)
    assert(polys.length == 2)
  }

  test("dissolved Paris cover round-trips through the tiler") {
    val url = getClass.getResource("/h3/shapes/Paris.geojson")
    val paris = Geo.parseGeoJson(scala.io.Source.fromURL(url).mkString)
    val cover = Geo.polygonToCells(paris, 8, Geo.ContainsCentroid)
    val json = Dissolve.dissolveToGeoJson(cover)
    val outline = Geo.parseGeoJson(json)
    assert(outline.nonEmpty)
    // Tiling the dissolved outline reproduces the original cover.
    val recovered = Geo.polygonToCells(outline, 8, Geo.ContainsCentroid)
    assert(recovered.toSet == cover.toSet)
  }

  test("SQL surface: h3_cells_to_multi_polygon over collect_list") {
    val spark = SparkTestBase.spark
    val json = spark.sql("""
      SELECT h3_cells_to_multi_polygon(collect_list(d.dcell)) AS geo
      FROM (SELECT h3_latlng_to_cell(48.8566, 2.3522, 8) AS c)
      LATERAL VIEW h3_grid_disk(c, 2) d AS dcell
    """).collect()(0).getString(0)
    assert(json.contains("MultiPolygon"))
    val polys = Geo.parseGeoJson(json)
    assert(polys.length == 1)
  }
}

/** Distributed compaction correctness. */
class DistributedCompactSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("distributed compact of full child sets collapses to parents") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val r = new scala.util.Random(11)
    val parents = (0 until 50).map { _ =>
      H3.latLngToCell(r.nextDouble() * 160 - 80, r.nextDouble() * 360 - 180, 6)
    }.distinct
    val children = parents.flatMap(p => H3.cellToChildren(p, 8))
    val df = children.toDF("cell").repartition(13)
    val compacted = graft.engine.DistributedCompact
      .compact(spark, df).as[Long].collect().toSet
    assert(compacted == parents.toSet)
    // Round trip (uncompact generator already explodes rows).
    val back = graft.engine.DistributedCompact
      .uncompact(spark, compacted.toSeq.toDF("cell"), 8)
      .as[Long].collect().toSet
    assert(back == children.toSet)
  }

  test("distributed compact keeps partial sibling groups untouched") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val parent = H3.latLngToCell(48.85, 2.35, 6)
    val kids = H3.cellToChildren(parent, 7).drop(1) // 6 of 7 -> no collapse
    val compacted = graft.engine.DistributedCompact
      .compact(spark, kids.toSeq.toDF("cell")).as[Long].collect().toSet
    assert(compacted == kids.toSet)
  }
}

/** Explicit cell-prefix partitioning + pruning. */
class CellPartitioningSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("prefix-partitioned write prunes partitions on cell_p filters") {
    val spark = SparkTestBase.spark
    val pts = graft.engine.Pages.indexedPages(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("prefix").toString
    graft.engine.CellPartitioning.writePrefixPartitioned(spark, pts, "cell9", path)

    val parisPrefix = graft.h3.H3.cellToParent(
      graft.h3.H3.latLngToCell(48.8566, 2.3522, 9), 3)
    val reader = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("cell_p") === parisPrefix)
    val plan = reader.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || reader.count() > 0)
    // Only Paris-region rows come back.
    val rows = reader.selectExpr("h3_cell_to_parent(cell9, 3) AS p").collect()
    rows.foreach(r => assert(r.getLong(0) == parisPrefix))
    assert(rows.nonEmpty)
  }

  test("range repartition keeps prefix groups together") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val pts = graft.engine.Pages.indexedPages(spark, "/root/testdata/sf0.001")
    val parted = graft.engine.CellPartitioning
      .repartitionByCellRange(spark, pts, "cell9", 8)
    // Every res-5 prefix group lands in exactly one partition.
    val spread = parted
      .selectExpr("h3_cell_to_parent(cell9, 5) AS p", "spark_partition_id() AS pid")
      .groupBy("p").agg(org.apache.spark.sql.functions.countDistinct("pid").as("n"))
      .filter($"n" > 1).count()
    assert(spread == 0)
  }
}

/** Plotter: polyline -> cells. */
class LineToCellsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("line cells form a connected chain hitting both endpoints") {
    val lats = Array(48.8566, 48.9, 49.0)
    val lngs = Array(2.3522, 2.5, 2.4)
    val cells = Geo.lineToCells(lats, lngs, 8)
    assert(cells.nonEmpty && cells.distinct.length == cells.length)
    assert(cells.head == H3.latLngToCell(lats(0), lngs(0), 8))
    assert(cells.last == H3.latLngToCell(lats(2), lngs(2), 8))
    cells.sliding(2).foreach {
      case Array(a, b) => assert(H3.areNeighborCells(a, b), s"${a.toHexString}")
      case _ =>
    }
  }

  test("SQL generator over a GeoJSON LineString") {
    val spark = SparkTestBase.spark
    val n = spark.sql("""
      SELECT l.cell FROM (SELECT 1)
      LATERAL VIEW h3_line_to_cells(
        '{"type":"LineString","coordinates":[[2.3522,48.8566],[2.5,48.9]]}', 8) l AS cell
    """).count()
    assert(n >= 2)
  }
}

/** Heterogeneous (compacted) dissolve fast path: identical geometry to
  * dissolving the fully-uncompacted set, at O(perimeter) materialization. */
class CompactedDissolveSpec extends AnyFunSuite {

  private def ringSet(rings: Array[Array[Double]]): Set[Set[(Double, Double)]] =
    rings.map(r => (0 until r.length / 2).map(i => (r(2 * i), r(2 * i + 1))).toSet).toSet

  test("compacted Paris res-10 cover dissolves identically to the uncompacted set") {
    val url = getClass.getResource("/h3/shapes/Paris.geojson")
    val poly = Geo.parseGeoJson(scala.io.Source.fromURL(url).mkString)(0)
    val fine = Geo.polygonToCells(Array(poly), 10, 0)
    val compacted = H3.compactSorted(fine.sortBy(H3.orderKey).distinct)
    assert(compacted.length < fine.length / 4, s"${compacted.length} vs ${fine.length}")

    val (r1, o1) = Dissolve.dissolveToRings(compacted)
    val (r2, o2) = Dissolve.dissolveToRings(fine)
    assert(o1.count(identity) == o2.count(identity))
    assert(ringSet(r1) == ringSet(r2))
  }

  test("boundary refinement materializes O(perimeter), not O(area)") {
    val parent = H3.latLngToCell(48.85, 2.35, 4)
    val fine = H3.cellToChildren(parent, 10) // 7^6 = 117,649 cells
    val canon = Dissolve.canonicalize(Array(parent, H3.cellToChildren(
      graft.h3.H3.gridDisk(parent, 1).find(_ != parent).get, 5)(0)))
    // Mixed set: the res-4 parent + one res-5 neighbor child.
    val boundary = Dissolve.boundaryCellsOfCompacted(canon, 10)
    // Perimeter of a res-4 cell at res 10 is ~6*7^3 with the refinement
    // fan-out; assert it is far below the 117k-cell area.
    assert(boundary.length < fine.length / 5, s"boundary=${boundary.length} area=${fine.length}")
  }

  test("mixed-res blob with a hole dissolves like its uncompacted equivalent") {
    val center = H3.latLngToCell(48.85, 2.35, 7)
    val disk2 = H3.gridDisk(center, 2)
    // Remove the center (hole), mix resolutions: ring-2 cells uncompacted
    // to res 9, ring-1 kept at res 7.
    val ring1 = H3.gridRing(center, 1)
    val ring2 = H3.gridRing(center, 2)
    val mixed = ring1 ++ ring2.flatMap(c => H3.cellToChildren(c, 9))
    val flat = ring1.flatMap(c => H3.cellToChildren(c, 9)) ++
      ring2.flatMap(c => H3.cellToChildren(c, 9))
    val (r1, o1) = Dissolve.dissolveToRings(mixed)
    val (r2, o2) = Dissolve.dissolveToRings(flat)
    assert(o1.count(identity) == 1 && o1.count(!_) == 1) // shell + hole
    assert(ringSet(r1) == ringSet(r2))
  }

}

/** Distributed dissolve: groupBy canonical edge -> twin cancel -> link. */
class DistributedDissolveSpec extends AnyFunSuite {
  test("distributed dissolve of an EMPTY input returns an empty frame (not NPE)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("grp", "cell")
    val out = graft.engine.DistributedDissolve.dissolve(spark, empty, "grp", "cell")
    assert(out.columns.toSeq == Seq("grp", "geojson"))
    assert(out.count() == 0)
  }

  test("distributed dissolve equals the scalar kernel per group") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val centers = Seq(
      H3.latLngToCell(48.85, 2.35, 8),
      H3.latLngToCell(40.71, -74.0, 8),
      H3.latLngToCell(-16.9, 179.9995, 8)) // transmeridian
    val rows = centers.zipWithIndex.flatMap { case (c, g) =>
      H3.gridDisk(c, 2).map(cell => (g.toLong, cell))
    }
    val df = rows.toDF("grp", "cell").repartition(7)
    val got = graft.engine.DistributedDissolve.dissolve(spark, df, "grp", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Compare via re-tiling (ring start/order may legitimately differ).
    centers.zipWithIndex.foreach { case (c, g) =>
      val disk = H3.gridDisk(c, 2).toSet
      val retiled = Geo.polygonToCells(
        Geo.parseGeoJson(got(g.toLong)), 8, 0).toSet
      assert(retiled == disk, s"group $g")
    }
  }

  test("cellBoundaryEdges: single-cell region re-links to the refined cell outline") {
    for (res <- Seq(3, 7); depth <- Seq(0, 1, 2)) {
      val c = H3.latLngToCell(48.85, 2.35, res)
      val edges = Dissolve.cellBoundaryEdges(c, res + depth)
      // Perimeter shape: ~6 * 3^depth edges, never the 7^depth area.
      assert(edges.nonEmpty && edges.length <= 6 * math.pow(3, depth).toInt + 6)
      val retiled = Geo.polygonToCells(
        Geo.parseGeoJson(Dissolve.edgesToGeoJson(edges)), res + depth, 0).toSet
      assert(retiled == H3.cellToChildren(c, res + depth).toSet, s"res=$res depth=$depth")
    }
    // Pentagon root.
    val pent = H3.cellToCenterChild(
      graft.h3.H3.setBaseCell(graft.h3.H3.DefaultCellIndex, 4), 5)
    val pe = Dissolve.cellBoundaryEdges(pent, 7)
    val retiled = Geo.polygonToCells(
      Geo.parseGeoJson(Dissolve.edgesToGeoJson(pe)), 7, 0).toSet
    assert(retiled == H3.cellToChildren(pent, 7).toSet)
  }

  test("cellBoundaryEdges at random anchors: retile equals children, perimeter-bounded") {
    val rng = new scala.util.Random(1337)
    for (_ <- 0 until 25) {
      val res = 2 + rng.nextInt(6)
      val depth = 1 + rng.nextInt(2)
      val c = H3.latLngToCell(
        rng.nextDouble() * 170 - 85, rng.nextDouble() * 360 - 180, res)
      val edges = Dissolve.cellBoundaryEdges(c, res + depth)
      assert(edges.length <= 6 * math.pow(3, depth).toInt + 6,
        s"res=$res depth=$depth edges=${edges.length} — area-shaped growth")
      val retiled = Geo.polygonToCells(
        Geo.parseGeoJson(Dissolve.edgesToGeoJson(edges)), res + depth, 0).toSet
      assert(retiled == H3.cellToChildren(c, res + depth).toSet,
        s"res=$res depth=$depth cell=${c.toHexString}")
    }
  }

  test("distributed dissolve accepts mixed-res (compacted) input incl. ancestor dups") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val centers = Seq(
      H3.latLngToCell(48.85, 2.35, 8),
      H3.latLngToCell(-16.9, 179.9995, 8)) // transmeridian
    val rows = centers.zipWithIndex.flatMap { case (c, g) =>
      val ring = H3.gridDisk(c, 1).filterNot(_ == c)
      // ring at res 8 + center at res 8 + the center's res-9 children
      // (ancestor-covered -> must be deduped, not double-counted).
      (ring :+ c).map(cell => (g.toLong, cell)) ++
        H3.cellToChildren(c, 9).map(cell => (g.toLong, cell))
    }
    val df = rows.toDF("grp", "cell").repartition(5)
    val got = graft.engine.DistributedDissolve.dissolve(spark, df, "grp", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    centers.zipWithIndex.foreach { case (c, g) =>
      val want = H3.gridDisk(c, 1).flatMap(H3.cellToChildren(_, 9)).toSet
      val retiled = Geo.polygonToCells(
        Geo.parseGeoJson(got(g.toLong)), 9, 0).toSet
      assert(retiled == want, s"group $g")
    }
  }

  test("hollow region keeps its hole through the distributed path") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val center = H3.latLngToCell(48.85, 2.35, 8)
    val ring = H3.gridDisk(center, 2).filterNot(_ == center)
    val df = ring.toSeq.map(c => (1L, c)).toDF("grp", "cell")
    val geo = graft.engine.DistributedDissolve.dissolve(spark, df, "grp", "cell")
      .collect()(0).getString(1)
    val polys = Geo.parseGeoJson(geo)
    assert(polys.length == 1 && polys(0).holes.length == 1)
  }
}

/** Randomized mixed-resolution dissolve: any blob with a random subset of
  * cells replaced by their children must dissolve ring-identically to the
  * fully-uncompacted set — including blobs anchored at pentagons. */
class MixedDissolvePropertySpec extends AnyFunSuite {
  private def ringSet(rings: Array[Array[Double]]): Set[Set[(Double, Double)]] =
    rings.map(r => (0 until r.length / 2).map(i => (r(2 * i), r(2 * i + 1))).toSet).toSet

  private def checkBlob(anchor: Long, rng: scala.util.Random): Unit = {
    val res = H3.getResolution(anchor)
    val fineRes = res + 2
    // Random connected-ish blob: disk(2) minus a random subset.
    val blob = H3.gridDisk(anchor, 2).filter(_ => rng.nextDouble() > 0.25)
    if (blob.isEmpty) return
    // Randomly explode some cells one or two levels down. The first cell
    // always goes to fineRes so the mixed set's max resolution (which
    // fixes the outline granularity) matches the flat set's.
    val mixed = blob.zipWithIndex.flatMap { case (c, idx) =>
      if (idx == 0) H3.cellToChildren(c, fineRes)
      else rng.nextInt(3) match {
        case 0 => Array(c)
        case 1 => H3.cellToChildren(c, res + 1)
        case _ => H3.cellToChildren(c, fineRes)
      }
    }
    val flat = blob.flatMap(c => H3.cellToChildren(c, fineRes))
    val (r1, o1) = Dissolve.dissolveToRings(mixed)
    val (r2, o2) = Dissolve.dissolveToRings(flat)
    assert(o1.count(identity) == o2.count(identity),
      s"anchor=${anchor.toHexString} outer rings differ")
    assert(ringSet(r1) == ringSet(r2), s"anchor=${anchor.toHexString}")
  }

  test("random mixed-res blobs: DISTRIBUTED dissolve re-tiles like the scalar kernel") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val rng = new scala.util.Random(90210)
    val groups = (0 until 6).map { g =>
      val res = 4 + rng.nextInt(4)
      val anchor = H3.latLngToCell(
        rng.nextDouble() * 170 - 85, rng.nextDouble() * 360 - 180, res)
      val fineRes = res + 2
      val blob = H3.gridDisk(anchor, 2).filter(_ => rng.nextDouble() > 0.25)
      val mixed = blob.zipWithIndex.flatMap { case (c, idx) =>
        if (idx == 0) H3.cellToChildren(c, fineRes)
        else rng.nextInt(3) match {
          case 0 => Array(c)
          case 1 => H3.cellToChildren(c, res + 1)
          case _ => H3.cellToChildren(c, fineRes)
        }
      }
      (g.toLong, mixed, fineRes)
    }.filter(_._2.nonEmpty)
    val df = groups.flatMap { case (g, cells, _) => cells.map(c => (g, c)) }
      .toDF("grp", "cell").repartition(7)
    val got = graft.engine.DistributedDissolve.dissolve(spark, df, "grp", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    groups.foreach { case (g, cells, fineRes) =>
      val wantGeo = Dissolve.dissolveToGeoJson(cells)
      val want = Geo.polygonToCells(Geo.parseGeoJson(wantGeo), fineRes, 0).toSet
      val retiled = Geo.polygonToCells(
        Geo.parseGeoJson(got(g)), fineRes, 0).toSet
      assert(retiled == want, s"group $g")
    }
  }

  test("random mixed-res blobs dissolve like their uncompacted equivalents") {
    val rng = new scala.util.Random(4242)
    for (_ <- 0 until 30) {
      val res = 4 + rng.nextInt(5)
      val anchor = H3.latLngToCell(
        rng.nextDouble() * 170 - 85, rng.nextDouble() * 360 - 180, res)
      checkBlob(anchor, rng)
    }
  }

  test("pentagon-anchored mixed-res blobs dissolve identically") {
    val rng = new scala.util.Random(7)
    for (res <- 4 to 7; bc <- Seq(4, 38, 97, 117)) {
      val pent = H3.cellToCenterChild(
        graft.h3.H3.setBaseCell(graft.h3.H3.DefaultCellIndex, bc), res)
      checkBlob(pent, rng)
    }
  }
}
