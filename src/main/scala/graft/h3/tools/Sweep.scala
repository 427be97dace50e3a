package graft.h3.tools
import graft.h3.{Edges, H3}

object Sweep {
  def main(args: Array[String]): Unit = {
    val r = new scala.util.Random(20260816L)
    var n = 0
    var fails = 0
    val t0 = System.nanoTime()
    while (n < 500000) {
      val lat = r.nextDouble() * 179.98 - 89.99
      val lng = r.nextDouble() * 360.0 - 180.0
      val res = r.nextInt(16)
      val cell = H3.latLngToCell(lat, lng, res)
      if (!H3.isValidCell(cell)) { fails += 1; println(s"INVALID $lat $lng $res") }
      val c = H3.cellToLatLng(cell)
      if (H3.latLngToCell(c(0), c(1), res) != cell) {
        fails += 1; println(s"RT $lat $lng $res ${cell.toHexString}")
      }
      if (res >= 1) {
        val p = H3.cellToParent(cell, res - 1)
        if (!H3.cellToChildren(p, res).contains(cell)) {
          fails += 1; println(s"PARENT ${cell.toHexString}")
        }
        // vertex canonicality vs one neighbor
        val ring = H3.gridRing(cell, 1)
        if (ring.nonEmpty) {
          val shared = Edges.cellToVertexes(cell).toSet
            .intersect(Edges.cellToVertexes(ring(0)).toSet)
          if (H3.areNeighborCells(cell, ring(0)) && shared.size != 2) {
            fails += 1; println(s"VERTEX ${cell.toHexString} ${ring(0).toHexString} ${shared.size}")
          }
        }
        // disk-distance consistency
        val dd = H3.gridDiskDistances(cell, 2)
        var i = 0
        while (i < dd.length / 2) {
          val d = H3.gridDistance(cell, dd(2 * i))
          if (d >= 0 && d != dd(2 * i + 1)) {
            fails += 1; println(s"DIST ${cell.toHexString}")
          }
          i += 1
        }
      }
      n += 1
    }
    println(s"sweep: $n points, $fails failures, ${(System.nanoTime()-t0)/1e9}%s")
  }
}
