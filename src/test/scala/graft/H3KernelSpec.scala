package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.h3.{H3, Tables}
import scala.io.Source

/** H3 upstream conformance fixtures, evaluated against the pure kernel. */
class H3KernelSpec extends AnyFunSuite {

  private def resource(name: String) =
    Source.fromInputStream(getClass.getResourceAsStream(s"/h3/$name"))

  test("latLngToCell matches all 70,868 conformance vectors") {
    var total = 0
    var pass = 0
    val src = resource("latLngToCell.txt")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val p = line.trim.split("\\s+")
        val cell = java.lang.Long.parseUnsignedLong(p(0), 16)
        val lat = p(1).toDouble
        var lng = p(2).toDouble
        if (lng > 180.0) lng -= 360.0
        total += 1
        if (H3.latLngToCell(lat, lng, H3.getResolution(cell)) == cell) pass += 1
      }
    } finally src.close()
    assert(total == 70868)
    assert(pass == total)
  }

  test("cellToLatLng center round-trips for all 118,853 boundary fixture ids") {
    var total = 0
    var pass = 0
    val src = resource("cellToBoundary.txt")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val cell = java.lang.Long.parseUnsignedLong(line.trim, 16)
        val c = H3.cellToLatLng(cell)
        total += 1
        if (H3.latLngToCell(c(0), c(1), H3.getResolution(cell)) == cell) pass += 1
      }
    } finally src.close()
    assert(pass == total)
  }

  test("boundary shape invariants (vertex count, center containment)") {
    val src = resource("cellToBoundary.txt")
    var checked = 0
    try {
      for (line <- src.getLines().grouped(37).map(_.head)) { // subsample
        val cell = java.lang.Long.parseUnsignedLong(line.trim, 16)
        val b = H3.cellToBoundary(cell)
        val nv = b.length / 2
        val minV = if (H3.isPentagon(cell)) 5 else 6
        assert(nv >= minV && nv <= 10, s"cell $line vertex count $nv")
        checked += 1
      }
    } finally src.close()
    assert(checked > 3000)
  }

  test("average edge length table matches fixture") {
    val src = resource("avgEdgeLen.txt")
    try {
      val lines = src.getLines().toArray
      for (res <- 0 to 15) {
        val rads = lines(res).split(",")(0).toDouble
        assert(math.abs(Tables.EdgeLengthRads(res) - rads) < 1e-15,
          s"res $res edge length")
      }
    } finally src.close()
  }

  test("validity: fixture ids valid, mutations invalid") {
    val valid = Seq(0x8a1fb46622dffffL, 0x8001fffffffffffL, 0x8f2834782b9c2abL)
    valid.foreach(c => assert(H3.isValidCell(c), c.toHexString))
    assert(!H3.isValidCell(0L))
    assert(!H3.isValidCell(0x8a1fb46622dfff0L)) // unused tail not all ones
    assert(!H3.isValidCell(0xfa1fb46622dffffL)) // high bit set
    assert(!H3.isValidCell(0x7a1fb46622dffffL)) // wrong mode
    // base cell > 121
    assert(!H3.isValidCell((0x8a1fb46622dffffL & ~(0x7fL << 45)) | (122L << 45)))
  }

  test("pentagon detection and deleted K subsequence") {
    // Base cell 4 is a polar pentagon: res-0 cell.
    val pent0 = H3.setBaseCell(H3.DefaultCellIndex, 4)
    assert(H3.isPentagon(pent0))
    // Its res-1 center child is a pentagon too.
    val pent1 = H3.cellToCenterChild(pent0, 1)
    assert(H3.isPentagon(pent1))
    // A K-leading digit under a pentagon base cell is invalid.
    val bad = H3.setDirection(H3.setResolution(pent0, 1), 1, H3.K)
    assert(!H3.isValidCell(bad))
    // Pentagons have 6 children, hexagons 7.
    assert(H3.cellToChildrenSize(pent0, 1) == 6)
    assert(H3.cellToChildren(pent0, 1).length == 6)
  }

  test("cell areas are close to the per-resolution averages") {
    val cell = H3.latLngToCell(48.864716, 2.349014, 9)
    val area = H3.cellAreaRads2(cell)
    val avg = Tables.AreaRads2(9)
    assert(area > avg * 0.5 && area < avg * 2.0)
  }

  test("great circle distance matches reference example") {
    // /root/reference/src/coord/latlng.rs doctest: Paris -> Shanghai.
    val d = H3.distanceRads(
      Math.toRadians(48.864716), Math.toRadians(2.349014),
      Math.toRadians(31.224361), Math.toRadians(121.469170))
    assert(math.abs(d - 1.453859220532047) < 1e-12)
  }
}
