package graft.h3

import scala.collection.mutable

/** Dissolves a set of cells into a MultiPolygon outline
  * (h3SetToLinkedGeo / cellsToMultiPolygon).
  *
  * Algorithm (parallel-friendly re-derivation of the reference's Solvent,
  * /root/reference/src/geom/solvent/): every cell contributes its directed
  * boundary edges; edges whose twin (the reverse edge) is also present are
  * interior and cancel; the surviving arcs are linked into closed rings by
  * walking canonical vertex keys (VertexIndex equality replaces float
  * coordinate matching); rings with positive signed area are outer shells,
  * negative ones are holes assigned to the containing shell.
  *
  * Heterogeneous (compacted) input takes a boundary-refinement fast path
  * (the role of the reference's Gosper-walk, arc_set.rs:38-56 +
  * index/iterator/gosper.rs:76-260): instead of uncompacting the whole set
  * to the finest resolution (O(area)), only cells whose neighborhood is not
  * fully covered are recursively split, so work and memory are O(perimeter
  * x depth). Coverage tests use the canonicalized (compacted) set, where
  * "fully covered" is exactly "self or an ancestor is present".
  */
object Dissolve {

  final class Arc(val startVertex: Long, val endVertex: Long,
                  val coords: Array[Double]) // [lat,lng,...] degrees

  /** Emits the boundary arc of `cell` toward direction `dir` (whose
    * neighbor is outside the region). */
  private def emitArc(cell: Long, dir: Int,
                      arcsByStart: mutable.HashMap[Long, Arc]): Unit = {
    val startV = Edges.directionToVertex(cell, dir)
    if (startV < 0) return
    val endVnum = (startV + 1) % (if (H3.isPentagon(cell)) 5 else 6)
    val sv = Edges.cellToVertex(cell, startV)
    val ev = Edges.cellToVertex(cell, endVnum)
    val coords = Proj.cellBoundary(cell, startV, 2)
    val deg = new Array[Double](coords.length)
    var c = 0
    while (c < coords.length) { deg(c) = Math.toDegrees(coords(c)); c += 1 }
    arcsByStart(sv) = new Arc(sv, ev, deg)
  }

  /** Links surviving arcs into closed rings (destructive on the map). */
  private def linkRings(arcsByStart: mutable.HashMap[Long, Arc])
      : (Array[Array[Double]], Array[Boolean]) = {
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
      val arr = ring.toArray
      rings += arr
      isOuter += signedArea(arr) > 0
    }
    (rings.toArray, isOuter.toArray)
  }

  @inline private def neighborDirs(cell: Long): Array[Int] =
    if (H3.isPentagon(cell)) Array(2, 3, 4, 5, 6) else Array(1, 2, 3, 4, 5, 6)

  /** Bottom-up sibling collapse of a duplicate-free mixed-resolution set:
    * afterwards a position is fully covered iff itself or an ancestor is in
    * the set (complete child groups can no longer hide a parent). */
  def canonicalize(cells: Array[Long]): Array[Long] = {
    val set = new java.util.HashSet[Long](cells.length * 2)
    var maxRes = 0
    cells.foreach { c =>
      set.add(c)
      val r = H3.getResolution(c)
      if (r > maxRes) maxRes = r
    }
    var r = maxRes
    while (r >= 1) {
      val counts = new mutable.HashMap[Long, Int]
      val it = set.iterator()
      while (it.hasNext) {
        val c = it.next()
        if (H3.getResolution(c) == r) {
          val p = H3.cellToParent(c, r - 1)
          counts(p) = counts.getOrElse(p, 0) + 1
        }
      }
      counts.foreach { case (p, n) =>
        if (n == H3.cellToChildrenSize(p, r)) {
          H3.cellToChildren(p, r).foreach(set.remove)
          set.add(p)
        }
      }
      r -= 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Finest-resolution cells on (or near) the region boundary of a
    * canonicalized set: cells whose same-res neighborhood is fully covered
    * are pruned, everything else is split one level and re-examined —
    * O(perimeter x depth) instead of the O(area) full uncompaction.
    * Public for the perimeter-vs-area assertions in DissolveSpec. */
  def boundaryCellsOfCompacted(canon: Array[Long], maxRes: Int): Array[Long] = {
    val set = new java.util.HashSet[Long](canon.length * 2)
    canon.foreach(set.add)

    def coveredFully(c: Long): Boolean = {
      var r = H3.getResolution(c)
      while (r >= 0) {
        if (set.contains(H3.cellToParent(c, r))) return true
        r -= 1
      }
      false
    }

    def interior(c: Long): Boolean = {
      val dirs = neighborDirs(c)
      var d = 0
      while (d < dirs.length) {
        val packed = Traverse.neighborRotations(c, dirs(d), 0)
        if (packed == 0) return false
        if (!coveredFully(Traverse.packedCell(packed))) return false
        d += 1
      }
      true
    }

    val out = new mutable.ArrayBuffer[Long]
    def process(c: Long): Unit = {
      val r = H3.getResolution(c)
      if (r == maxRes) { out += c; return }
      if (interior(c)) return
      H3.cellToChildren(c, r + 1).foreach(process)
    }
    canon.foreach(process)
    out.toArray
  }

  /** Directed boundary edges of ONE cell's region at `targetRes`: the
    * outward edges of the cell's targetRes descendants that lie on its
    * boundary. This is the per-cell generator behind the mixed-resolution
    * DISTRIBUTED dissolve (the heterogeneous Solvent role, reference
    * arc_set.rs:38-56): every input cell emits O(perimeter x depth) edges
    * independently of the rest of its group, and edges between two
    * covered cells twin-cancel in the shuffle exactly as in the
    * homogeneous formulation. Interior descendants are pruned without
    * refinement (same argument as [[boundaryCellsOfCompacted]]: a finer
    * cell's neighbors have parents in {cell} U neighbors(cell), so a cell
    * whose same-res neighborhood is inside the root has no boundary
    * descendants). */
  def cellBoundaryEdges(root: Long, targetRes: Int): Array[Long] = {
    val rootRes = H3.getResolution(root)
    require(targetRes >= rootRes && targetRes <= 15,
      s"targetRes=$targetRes out of [$rootRes, 15]")
    if (targetRes == rootRes) return Edges.originToDirectedEdges(root)

    @inline def isDesc(c: Long): Boolean = H3.cellToParent(c, rootRes) == root

    val out = new mutable.ArrayBuilder.ofLong
    def process(c: Long): Unit = {
      val r = H3.getResolution(c)
      val dirs = neighborDirs(c)
      if (r == targetRes) {
        var d = 0
        while (d < dirs.length) {
          val packed = Traverse.neighborRotations(c, dirs(d), 0)
          if (packed != 0 && !isDesc(Traverse.packedCell(packed)))
            out += Edges.directedEdge(c, dirs(d))
          d += 1
        }
      } else {
        var interior = true
        var d = 0
        while (interior && d < dirs.length) {
          val packed = Traverse.neighborRotations(c, dirs(d), 0)
          if (packed == 0 || !isDesc(Traverse.packedCell(packed))) interior = false
          d += 1
        }
        if (!interior) H3.cellToChildren(c, r + 1).foreach(process)
      }
    }
    process(root)
    out.result()
  }

  /** Dissolve to rings: returns (rings, isOuter) where each ring is
    * [lat0,lng0,lat1,lng1,...] in degrees (unclosed). Accepts mixed
    * (compacted) input — see the class doc for the fast path. */
  def dissolveToRings(cells0: Array[Long]): (Array[Array[Double]], Array[Boolean]) = {
    if (cells0.isEmpty) return (Array.empty, Array.empty)
    val dedup = new java.util.LinkedHashSet[Long]()
    cells0.foreach(dedup.add)
    val cells = new Array[Long](dedup.size)
    val dit = dedup.iterator()
    var i = 0
    while (dit.hasNext) { cells(i) = dit.next(); i += 1 }

    var maxRes = 0
    i = 0
    while (i < cells.length) {
      val r = H3.getResolution(cells(i))
      if (r > maxRes) maxRes = r
      i += 1
    }
    val mixed = cells.exists(c => H3.getResolution(c) != maxRes)

    val arcsByStart = new mutable.HashMap[Long, Arc]
    if (!mixed) {
      val cellSet = new java.util.HashSet[Long](cells.length * 2)
      i = 0
      while (i < cells.length) { cellSet.add(cells(i)); i += 1 }
      i = 0
      while (i < cells.length) {
        val cell = cells(i)
        val dirs = neighborDirs(cell)
        var d = 0
        while (d < dirs.length) {
          val packed = Traverse.neighborRotations(cell, dirs(d), 0)
          if (packed != 0 && !cellSet.contains(Traverse.packedCell(packed)))
            emitArc(cell, dirs(d), arcsByStart)
          d += 1
        }
        i += 1
      }
    } else {
      // Boundary-refinement fast path: never materializes the full
      // uncompacted area.
      val canon = canonicalize(cells)
      val set = new java.util.HashSet[Long](canon.length * 2)
      canon.foreach(set.add)
      def coveredFully(c: Long): Boolean = {
        var r = H3.getResolution(c)
        while (r >= 0) {
          if (set.contains(H3.cellToParent(c, r))) return true
          r -= 1
        }
        false
      }
      boundaryCellsOfCompacted(canon, maxRes).foreach { cell =>
        val dirs = neighborDirs(cell)
        var d = 0
        while (d < dirs.length) {
          val packed = Traverse.neighborRotations(cell, dirs(d), 0)
          if (packed != 0 && !coveredFully(Traverse.packedCell(packed)))
            emitArc(cell, dirs(d), arcsByStart)
          d += 1
        }
      }
    }
    linkRings(arcsByStart)
  }

  /** Dissolve from pre-cancelled directed BOUNDARY edges (the distributed
    * formulation: groupBy canonical edge -> twin-cancel -> link): each
    * surviving edge contributes its arc keyed by canonical vertexes, then
    * rings link exactly as in the cell-set path. All edges must share one
    * resolution. */
  def edgesToRings(edges: Array[Long]): (Array[Array[Double]], Array[Boolean]) = {
    val arcsByStart = new mutable.HashMap[Long, Arc]
    var i = 0
    while (i < edges.length) {
      val e = edges(i)
      emitArc(Edges.edgeOrigin(e), Edges.getEdgeNum(e), arcsByStart)
      i += 1
    }
    linkRings(arcsByStart)
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
    renderGeoJson(rings, isOuter)
  }

  /** GeoJSON MultiPolygon of pre-cancelled boundary edges (distributed
    * dissolve final stage). */
  def edgesToGeoJson(edges: Array[Long]): String = {
    if (edges.isEmpty) return """{"type":"MultiPolygon","coordinates":[]}"""
    val (rings, isOuter) = edgesToRings(edges)
    renderGeoJson(rings, isOuter)
  }

  private def renderGeoJson(rings: Array[Array[Double]],
                            isOuter: Array[Boolean]): String = {
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
