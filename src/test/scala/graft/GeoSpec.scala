package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.h3.{Geo, H3}

/** Tiler golden counts + PIP invariants (reference tests
  * tests/api/geom/tiler.rs:97-200). */
class GeoSpec extends AnyFunSuite {

  private def shape(name: String): Array[Geo.GeoPolygon] = {
    val url = getClass.getResource(s"/h3/shapes/$name.geojson")
    Geo.parseGeoJson(scala.io.Source.fromURL(url).mkString)
  }

  private def count(name: String, res: Int, mode: Int): Int =
    Geo.polygonToCells(shape(name), res, mode).length

  test("Paris res-8 golden cover counts (164/118/203)") {
    assert(count("Paris", 8, Geo.ContainsCentroid) == 164)
    assert(count("Paris", 8, Geo.ContainsBoundary) == 118)
    assert(count("Paris", 8, Geo.IntersectsBoundary) == 203)
  }

  test("Rabi (transmeridian) res-8 golden cover counts (163/132/193)") {
    assert(count("Rabi", 8, Geo.ContainsCentroid) == 163)
    assert(count("Rabi", 8, Geo.ContainsBoundary) == 132)
    assert(count("Rabi", 8, Geo.IntersectsBoundary) == 193)
  }

  test("Holes res-4 golden cover counts (233/170/285)") {
    assert(count("Holes", 4, Geo.ContainsCentroid) == 233)
    assert(count("Holes", 4, Geo.ContainsBoundary) == 170)
    assert(count("Holes", 4, Geo.IntersectsBoundary) == 285)
  }

  test("centroid covers contain exactly the cells whose centers pass PIP") {
    val polys = shape("SanFrancisco")
    val cover = Geo.polygonToCells(polys, 8, Geo.ContainsCentroid).toSet
    // Every cover cell's center is inside.
    cover.foreach { cell =>
      val c = graft.h3.Proj.cellCenter(cell)
      assert(polys.exists(_.containsCentroid(c(0), c(1))), cell.toHexString)
    }
    // Every intersecting cell whose center is inside is in the cover.
    val all = Geo.polygonToCells(polys, 8, Geo.IntersectsBoundary)
    all.foreach { cell =>
      val c = graft.h3.Proj.cellCenter(cell)
      if (polys.exists(_.containsCentroid(c(0), c(1))))
        assert(cover.contains(cell), cell.toHexString)
    }
  }

  test("adjacent rectangles assign every cell uniquely under centroid mode") {
    def rect(latMin: Double, latMax: Double, lngMin: Double, lngMax: Double) =
      new Geo.GeoPolygon(Geo.ringFromDegrees(
        Array(latMin, latMin, latMax, latMax),
        Array(lngMin, lngMax, lngMax, lngMin)), Array.empty)
    // A 2x2 grid of adjacent rectangles sharing edges.
    val r00 = rect(48.0, 48.5, 2.0, 2.5)
    val r01 = rect(48.0, 48.5, 2.5, 3.0)
    val r10 = rect(48.5, 49.0, 2.0, 2.5)
    val r11 = rect(48.5, 49.0, 2.5, 3.0)
    val covers = Seq(r00, r01, r10, r11).map(p =>
      Geo.polygonToCells(Array(p), 7, Geo.ContainsCentroid).toSet)
    // Pairwise disjoint: no cell belongs to two rectangles.
    for (i <- covers.indices; j <- covers.indices if i < j)
      assert(covers(i).intersect(covers(j)).isEmpty, s"overlap $i-$j")
    // Union equals the cover of the bounding rectangle.
    val whole = Geo.polygonToCells(
      Array(rect(48.0, 49.0, 2.0, 3.0)), 7, Geo.ContainsCentroid).toSet
    assert(covers.reduce(_ union _) == whole)
  }

  test("annotated cover: full cells strictly inside, partial on boundary") {
    val polys = shape("Paris")
    val (full, partial) = Geo.annotatedCover(polys, 8)
    assert(full.nonEmpty && partial.nonEmpty)
    // Full cells (compacted, mixed res) uncompact into the intersects cover.
    val expanded = H3.uncompact(full, 8).toSet
    val all = Geo.polygonToCells(polys, 8, Geo.IntersectsBoundary).toSet
    assert(expanded.subsetOf(all))
    assert((expanded ++ partial.toSet) == all)
    // Partial cells' centers may be in or out; full cells' centers are in.
    expanded.foreach { cell =>
      val c = graft.h3.Proj.cellCenter(cell)
      assert(polys.exists(_.containsCentroid(c(0), c(1))))
    }
  }

  test("Covers mode returns the containing cell for sub-cell geometries") {
    // A tiny triangle well inside one res-5 cell.
    val tiny = new Geo.GeoPolygon(Geo.ringFromDegrees(
      Array(48.8566, 48.8567, 48.85665),
      Array(2.3522, 2.3523, 2.35225)), Array.empty)
    val cover = Geo.polygonToCells(Array(tiny), 5, Geo.Covers)
    assert(cover.length == 1)
    assert(cover(0) == graft.h3.H3.latLngToCell(48.8566, 2.3522, 5))
    // Covers at a fine resolution behaves like Intersects.
    val fine = Geo.polygonToCells(Array(tiny), 12, Geo.Covers)
    val intersects = Geo.polygonToCells(Array(tiny), 12, Geo.IntersectsBoundary)
    assert(fine.toSet == intersects.toSet && fine.nonEmpty)
  }

  test("transmeridian shapes produce non-empty covers on both sides") {
    val cells = Geo.polygonToCells(shape("Transmeridian"), 5, Geo.ContainsCentroid)
    assert(cells.nonEmpty)
    val lngs = cells.map(c => H3.cellToLng(c))
    assert(lngs.exists(_ > 170) && lngs.exists(_ < -170))
  }

  test("polygon covers at finer resolutions nest under coarser parents") {
    val polys = shape("Paris")
    val res7 = Geo.polygonToCells(polys, 7, Geo.ContainsCentroid).toSet
    val res9 = Geo.polygonToCells(polys, 9, Geo.ContainsCentroid)
    // Most res-9 cells' res-7 ancestors are in (or adjacent to) the res-7
    // cover; sanity-check the bulk overlap (boundary effects allowed).
    val inParent = res9.count(c => res7.contains(H3.cellToParent(c, 7)))
    assert(inParent.toDouble / res9.length > 0.9)
  }
}

/** Full-world coverage: the two HalfWorld covers partition the entire cell
  * space at each resolution (reference tests/api/geom/tiler.rs:252-293). */
class WorldCoverageSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.h3.{Geo, Tables}

  private def shape(name: String) = {
    val url = getClass.getResource(s"/h3/shapes/$name.geojson")
    Geo.parseGeoJson(scala.io.Source.fromURL(url).mkString)
  }

  test("HalfWorld_1 + HalfWorld_2 tile to exactly cell_count(res), disjoint") {
    for (res <- 0 to 2) {
      val c1 = Geo.polygonToCells(shape("HalfWorld_1"), res, 0).toSet
      val c2 = Geo.polygonToCells(shape("HalfWorld_2"), res, 0).toSet
      assert((c1 & c2).isEmpty, s"overlap at res $res")
      assert(c1.size + c2.size == Tables.CellCount(res),
        s"res=$res got ${c1.size}+${c2.size} want ${Tables.CellCount(res)}")
    }
  }
}
