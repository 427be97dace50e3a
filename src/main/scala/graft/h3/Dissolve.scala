package graft.h3

import scala.collection.mutable

/** Dissolves a set of same-resolution cells into a MultiPolygon outline
  * (h3SetToLinkedGeo / cellsToMultiPolygon).
  *
  * Algorithm (parallel-friendly re-derivation of the reference's Solvent,
  * /root/reference/src/geom/solvent/): every cell contributes its directed
  * boundary edges; edges whose twin (the reverse edge) is also present are
  * interior and cancel; the surviving arcs are linked into closed rings by
  * walking canonical vertex keys (VertexIndex equality replaces float
  * coordinate matching); rings with positive signed area are outer shells,
  * negative ones are holes assigned to the containing shell.
  */
object Dissolve {

  final class Arc(val startVertex: Long, val endVertex: Long,
                  val coords: Array[Double]) // [lat,lng,...] degrees

  /** Dissolve to rings: returns (rings, isOuter) where each ring is
    * [lat0,lng0,lat1,lng1,...] in degrees (unclosed). */
  def dissolveToRings(cells0: Array[Long]): (Array[Array[Double]], Array[Boolean]) = {
    if (cells0.isEmpty) return (Array.empty, Array.empty)
    // Heterogeneous (compacted) input: uncompact to the finest resolution
    // so edge cancellation sees a uniform grid.
    var maxRes = 0
    var i = 0
    while (i < cells0.length) {
      val r = H3.getResolution(cells0(i))
      if (r > maxRes) maxRes = r
      i += 1
    }
    val mixed = cells0.exists(c => H3.getResolution(c) != maxRes)
    val cells = if (mixed) H3.uncompact(cells0, maxRes) else cells0
    val cellSet = new java.util.HashSet[Long](cells.length * 2)
    i = 0
    while (i < cells.length) { cellSet.add(cells(i)); i += 1 }

    // Surviving arcs keyed by their start vertex.
    val arcsByStart = new mutable.HashMap[Long, Arc]
    i = 0
    while (i < cells.length) {
      val cell = cells(i)
      val dirs = if (H3.isPentagon(cell)) Array(2, 3, 4, 5, 6)
                 else Array(1, 2, 3, 4, 5, 6)
      var d = 0
      while (d < dirs.length) {
        val packed = Traverse.neighborRotations(cell, dirs(d), 0)
        if (packed != 0) {
          val neighbor = Traverse.packedCell(packed)
          if (!cellSet.contains(neighbor)) {
            // Boundary edge: emit its arc.
            val startV = Edges.directionToVertex(cell, dirs(d))
            if (startV >= 0) {
              val endVnum = (startV + 1) % (if (H3.isPentagon(cell)) 5 else 6)
              val sv = Edges.cellToVertex(cell, startV)
              val ev = Edges.cellToVertex(cell, endVnum)
              val coords = Proj.cellBoundary(cell, startV, 2)
              val deg = new Array[Double](coords.length)
              var c = 0
              while (c < coords.length) { deg(c) = Math.toDegrees(coords(c)); c += 1 }
              arcsByStart(sv) = new Arc(sv, ev, deg)
            }
          }
        }
        d += 1
      }
      i += 1
    }

    // Link arcs into rings.
    val rings = new mutable.ArrayBuffer[Array[Double]]
    val isOuter = new mutable.ArrayBuffer[Boolean]
    while (arcsByStart.nonEmpty) {
      val first = arcsByStart.head._2
      val ring = new mutable.ArrayBuffer[Double]
      var cur = first
      var guard = 0
      var closed = false
      while (!closed && guard < 4000000) {
        arcsByStart.remove(cur.startVertex)
        // Append the arc's vertexes except the last one — it is the next
        // arc's start (or the ring start when closing).
        var c = 0
        while (c < cur.coords.length - 2) { ring += cur.coords(c); c += 1 }
        if (cur.endVertex == first.startVertex) closed = true
        else {
          arcsByStart.get(cur.endVertex) match {
            case Some(next) => cur = next
            case None => closed = true // degenerate; emit what we have
          }
        }
        guard += 1
      }
      // Drop the duplicated closing vertex (last pair == next arc start).
      val arr = ring.toArray
      rings += arr
      isOuter += signedArea(arr) > 0
    }
    (rings.toArray, isOuter.toArray)
  }

  /** Planar signed area (shoelace) in lng/lat degrees; >0 = CCW.
    * Transmeridian rings are evaluated in the +360-shifted frame so the
    * antimeridian jump doesn't corrupt the orientation. */
  def signedArea(ring: Array[Double]): Double = {
    val n = ring.length / 2
    // Detect an antimeridian crossing.
    var shifted = false
    var i = 0
    var j = n - 1
    while (i < n && !shifted) {
      if (Math.abs(ring(2 * i + 1) - ring(2 * j + 1)) > 180.0) shifted = true
      j = i
      i += 1
    }
    @inline def lngAt(idx: Int): Double = {
      val l = ring(2 * idx + 1)
      if (shifted && l < 0) l + 360.0 else l
    }
    var area = 0.0
    i = 0
    j = n - 1
    while (i < n) {
      area += (lngAt(j) + lngAt(i)) * (ring(2 * j) - ring(2 * i))
      j = i
      i += 1
    }
    -area / 2.0
  }

  /** GeoJSON MultiPolygon (degrees) of the dissolved cell set. Holes are
    * attached to the outer ring that contains their first vertex. */
  def dissolveToGeoJson(cells: Array[Long]): String = {
    if (cells.isEmpty) return """{"type":"MultiPolygon","coordinates":[]}"""
    val (rings, isOuter) = dissolveToRings(cells)
    val outers = rings.indices.filter(isOuter)
    val holes = rings.indices.filterNot(isOuter)

    // Assign each hole to the first outer ring containing its first vertex
    // (ringFromDegrees applies the transmeridian shift when needed).
    val outerRings = outers.map { oi =>
      val r = rings(oi)
      Geo.ringFromDegrees(
        Array.tabulate(r.length / 2)(i => r(2 * i)),
        Array.tabulate(r.length / 2)(i => r(2 * i + 1)))
    }
    val holesByOuter = mutable.Map.empty[Int, mutable.ArrayBuffer[Int]]
    for (hi <- holes) {
      val r = rings(hi)
      val lat = Math.toRadians(r(0))
      val lng = Math.toRadians(r(1))
      var assigned = false
      var o = 0
      while (o < outerRings.length && !assigned) {
        if (outerRings(o).position(lat, lng) != 0) {
          holesByOuter.getOrElseUpdate(o, mutable.ArrayBuffer.empty) += hi
          assigned = true
        }
        o += 1
      }
    }

    def ringJson(r: Array[Double]): String = {
      val n = r.length / 2
      val sb = new StringBuilder("[")
      var i = 0
      while (i <= n) { // close the ring
        val idx = i % n
        if (i > 0) sb += ','
        sb ++= s"[${r(2 * idx + 1)},${r(2 * idx)}]"
        i += 1
      }
      sb += ']'
      sb.toString
    }

    val polys = outers.zipWithIndex.map { case (oi, o) =>
      val parts = ringJson(rings(oi)) +:
        holesByOuter.getOrElse(o, mutable.ArrayBuffer.empty).map(hi => ringJson(rings(hi)))
      parts.mkString("[", ",", "]")
    }
    s"""{"type":"MultiPolygon","coordinates":[${polys.mkString(",")}]}"""
  }
}
