package graft.h3

/** Directed edges and topological vertexes of H3 cells.
  *
  * Edge index: mode 2 in bits 59-62, edge number 1-6 in bits 56-58, origin
  * cell in bits 0-55. Vertex index: mode 4, vertex 0-5 in bits 56-58, owner
  * cell below (semantics per /root/reference/src/index/{edge,vertex}.rs).
  */
object Edges {
  import H3._

  @inline def getEdgeNum(bits: Long): Int = ((bits >>> 56) & 7L).toInt
  @inline private def setModeBits(bits: Long, mode: Int): Long =
    (bits & ~(0xFL << 59)) | (mode.toLong << 59)
  @inline private def clrHigh(bits: Long): Long = bits & ~(7L << 56)

  /** Hexagon direction -> first topological vertex (same face). */
  private val ToVertexHexagon: Array[Int] = Array(3, 1, 2, 5, 4, 0) // idx dir-1
  private val ToVertexPentagon: Array[Int] = Array(1, 2, 4, 3, 0) // idx dir-2

  /** Vertex number -> direction (same face). */
  private val ToDirectionHexagon: Array[Int] = Array(IJ, J, JK, K, IK, I)
  private val ToDirectionPentagon: Array[Int] = Array(IJ, J, JK, IK, I)

  /** Reverse direction from neighbor per direction (hexagons). */
  private val RevNeighborDirectionsHex: Array[Int] = Array(5, 3, 4, 1, 0, 2)

  /** Directions in CCW order. */
  private val DirectionsCCW: Array[Int] = Array(J, JK, K, IK, I, IJ)

  /** CCW rotations of a cell's vertex numbering vs its neighbor layout. */
  def vertexRotations(cell: Long): Int = {
    val ijk = new Proj.IJK(0, 0, 0)
    val face = Proj.cellToFaceIjk(cell, ijk)
    val baseCell = getBaseCell(cell)
    val leadingDir = firstAxe(cell)

    val baseFace = Tables.BaseCellData(baseCell)(0)
    var ccwRot60 = Tables.BaseCellRotationOnFace(baseCell)(face)
    if (ccwRot60 < 0) ccwRot60 = 0

    if (Tables.isPentagonBase(baseCell)) {
      // Direction-to-face mapping of this pentagon (rank among pentagons).
      val pentIdx =
        if (baseCell < 64)
          java.lang.Long.bitCount(Tables.BasePentagonsLo & ((1L << baseCell) - 1))
        else
          java.lang.Long.bitCount(Tables.BasePentagonsLo) +
            java.lang.Long.bitCount(Tables.BasePentagonsHi & ((1L << (baseCell - 64)) - 1))
      val dirFaces = Tables.PentagonDirectionFaces(pentIdx)

      val ikFace = dirFaces(IK - 2)
      val jkFace = dirFaces(JK - 2)

      if (face != baseFace &&
          ((baseCell == 4 || baseCell == 117) || face == ikFace))
        ccwRot60 = (ccwRot60 + 1) % 6

      if (leadingDir == JK && face == ikFace) ccwRot60 = (ccwRot60 + 5) % 6
      else if (leadingDir == IK && face == jkFace) ccwRot60 = (ccwRot60 + 1) % 6
    }
    ccwRot60
  }

  /** First topological vertex for a neighbor direction; -1 if invalid. */
  def directionToVertex(cell: Long, dir: Int): Int = {
    val pent = isPentagon(cell)
    if (dir == Center || (pent && dir == K)) return -1
    val rotations = vertexRotations(cell)
    if (pent) (ToVertexPentagon(dir - 2) + 5 - rotations) % 5
    else (ToVertexHexagon(dir - 1) + 6 - rotations) % 6
  }

  /** Direction for a vertex number. */
  def vertexToDirection(cell: Long, vertex: Int): Int = {
    val rotations = vertexRotations(cell)
    if (isPentagon(cell)) ToDirectionPentagon((vertex + rotations) % 5)
    else ToDirectionHexagon((vertex + rotations) % 6)
  }

  // -------------------------------------------------------------------
  // Directed edges.

  /** Directed edge from origin to a neighboring destination; 0 if the two
    * cells are not neighbors. */
  def cellsToDirectedEdge(origin: Long, destination: Long): Long = {
    val dir = Traverse.directionForNeighbor(origin, destination)
    if (dir == 0) 0L
    else setModeBits(origin, ModeEdge) | (dir.toLong << 56)
  }

  /** Directed edge from `origin` toward neighbor direction `dir` (1-6;
    * caller guarantees the direction exists — pentagons have no dir 1). */
  def directedEdge(origin: Long, dir: Int): Long =
    setModeBits(origin, ModeEdge) | (dir.toLong << 56)

  /** All directed edges from the origin (6 for hexagons, 5 for pentagons),
    * in canonical CCW order. */
  def originToDirectedEdges(origin: Long): Array[Long] = {
    val order = if (isPentagon(origin)) Array(2, 3, 5, 4, 6)
                else Array(1, 5, 4, 6, 2, 3)
    order.map(e => setModeBits(origin, ModeEdge) | (e.toLong << 56))
  }

  def edgeOrigin(edge: Long): Long = setModeBits(clrHigh(edge), ModeCell)

  def edgeDestination(edge: Long): Long = {
    val p = Traverse.neighborRotations(edgeOrigin(edge), getEdgeNum(edge), 0)
    if (p == 0) 0L else Traverse.packedCell(p)
  }

  def edgeReverse(edge: Long): Long =
    cellsToDirectedEdge(edgeDestination(edge), edgeOrigin(edge))

  def isValidDirectedEdge(value: Long): Boolean = {
    if (getMode(value) != ModeEdge) return false
    val cellBits = setModeBits(clrHigh(value), ModeCell)
    if (!isValidCell(cellBits)) return false
    val e = getEdgeNum(value)
    val minEdge = if (isPentagon(cellBits)) 2 else 1
    e >= minEdge && e <= 6
  }

  /** Edge boundary [lat0,lng0,lat1,lng1,(lat2,lng2)] in degrees (2 verts +
    * possible icosahedron-crossing distortion vertex). */
  def directedEdgeToBoundary(edge: Long): Array[Double] = {
    val origin = edgeOrigin(edge)
    val startVertex = directionToVertex(origin, getEdgeNum(edge))
    if (startVertex < 0) return Array.emptyDoubleArray
    val b = Proj.cellBoundary(origin, startVertex, 2)
    val out = new Array[Double](b.length)
    var i = 0
    while (i < b.length) { out(i) = Math.toDegrees(b(i)); i += 1 }
    out
  }

  def edgeLengthRads(edge: Long): Double = {
    val origin = edgeOrigin(edge)
    val startVertex = directionToVertex(origin, getEdgeNum(edge))
    if (startVertex < 0) return 0.0
    val b = Proj.cellBoundary(origin, startVertex, 2) // radians
    var sum = 0.0
    var i = 0
    while (i < b.length / 2 - 1) {
      sum += H3.distanceRads(b(2 * i), b(2 * i + 1), b(2 * i + 2), b(2 * i + 3))
      i += 1
    }
    sum
  }

  def edgeLengthKm(edge: Long): Double = edgeLengthRads(edge) * EarthRadiusKm
  def edgeLengthM(edge: Long): Double = edgeLengthKm(edge) * 1000.0

  // -------------------------------------------------------------------
  // Vertexes.

  @inline private def vertexCount(cell: Long): Int =
    if (isPentagon(cell)) 5 else 6

  @inline private def cellLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(orderKey(a), orderKey(b)) < 0

  /** Canonical vertex index for vertex `v` of `cell`; 0 if out of range.
    * The owner is the lowest-indexed of the (up to) 3 cells sharing it. */
  def cellToVertex(cell: Long, vertex: Int): Long = {
    val count = vertexCount(cell)
    val res = getResolution(cell)
    if (vertex < 0 || vertex >= count) return 0L

    var owner = cell
    var ownerVertex = vertex

    // Center children always own their vertexes.
    if (res != 0 && getDirection(cell, res) != Center) {
      val left = vertexToDirection(cell, vertex)
      val leftPacked = Traverse.neighborRotations(cell, left, 0)
      if (leftPacked == 0) return 0L
      val leftCell = Traverse.packedCell(leftPacked)
      val leftRotation = Traverse.packedRot(leftPacked)
      if (cellLt(leftCell, owner)) owner = leftCell

      if (res == 0 || getDirection(leftCell, res) != Center) {
        val rightVertex = (vertex + count - 1) % count
        val right = vertexToDirection(cell, rightVertex)
        val rightPacked = Traverse.neighborRotations(cell, right, 0)
        if (rightPacked == 0) return 0L
        val rightCell = Traverse.packedCell(rightPacked)
        val rightRotation = Traverse.packedRot(rightPacked)

        if (cellLt(rightCell, owner)) {
          owner = rightCell
          val dir =
            if (isPentagon(owner)) Traverse.directionForNeighbor(owner, cell)
            else DirectionsCCW((RevNeighborDirectionsHex(right - 1) + rightRotation) % 6)
          ownerVertex = directionToVertex(owner, dir)
        }
      }

      if (owner == Traverse.packedCell(leftPacked)) {
        val dir =
          if (isPentagon(owner)) Traverse.directionForNeighbor(owner, cell)
          else DirectionsCCW((RevNeighborDirectionsHex(left - 1) + leftRotation) % 6)
        ownerVertex = (directionToVertex(owner, dir) + 1) % vertexCount(owner)
      }
    }

    setModeBits(owner, ModeVertex) | (ownerVertex.toLong << 56)
  }

  /** All canonical vertexes of a cell. */
  def cellToVertexes(cell: Long): Array[Long] =
    Array.tabulate(vertexCount(cell))(v => cellToVertex(cell, v))

  def vertexOwner(vertexIndex: Long): Long =
    setModeBits(clrHigh(vertexIndex), ModeCell)

  @inline def getVertexNum(vertexIndex: Long): Int =
    ((vertexIndex >>> 56) & 7L).toInt

  /** Vertex coordinates [latDeg, lngDeg]. */
  def vertexToLatLng(vertexIndex: Long): Array[Double] = {
    val owner = vertexOwner(vertexIndex)
    val b = Proj.cellBoundary(owner, getVertexNum(vertexIndex), 1)
    Array(Math.toDegrees(b(0)), Math.toDegrees(b(1)))
  }

  def isValidVertex(value: Long): Boolean = {
    if (getMode(value) != ModeVertex) return false
    val ownerBits = setModeBits(clrHigh(value), ModeCell)
    if (!isValidCell(ownerBits)) return false
    val v = getVertexNum(value)
    if (v >= vertexCount(ownerBits)) return false
    // Canonicality: recreate and compare.
    cellToVertex(ownerBits, v) == value
  }

  /** Any-mode index validity (cell, directed edge, or vertex). */
  def isValidIndex(value: Long): Boolean =
    isValidCell(value) || isValidDirectedEdge(value) || isValidVertex(value)

  // -------------------------------------------------------------------
  // Local IJ coordinates (SQL surface).

  /** Local (i, j) of `cell` anchored at `origin`; null encoded as
    * Int.MinValue pair on failure. Packed as (i << 32) | (j & 0xffffffff),
    * Long.MinValue on failure. */
  def cellToLocalIj(origin: Long, cell: Long): Long = {
    val ijk = new Proj.IJK(0, 0, 0)
    if (!Traverse.toLocalIjk(origin, cell, ijk)) return Long.MinValue
    val i = ijk.i - ijk.k
    val j = ijk.j - ijk.k
    (i.toLong << 32) | (j.toLong & 0xFFFFFFFFL)
  }

  /** Inverse of [[cellToLocalIj]]; 0 on failure. */
  def localIjToCell(origin: Long, i: Int, j: Int): Long = {
    val ijk = new Proj.IJK(i, j, 0)
    ijk.normalize()
    Traverse.localIjkToCell(origin, ijk)
  }

  /** Icosahedron faces intersected by the cell, as a 20-bit mask. */
  def icosahedronFaces(cell0: Long): Int = {
    var cell = cell0
    val pent = isPentagon(cell)
    var res = getResolution(cell)
    if (pent && !isClass3(res)) {
      // Class II pentagons have all vertices on icosahedron edges; use the
      // center child's faces instead (same set).
      cell = cellToCenterChild(cell, res + 1)
      res += 1
    }
    val ijk = new Proj.IJK(0, 0, 0)
    val face = Proj.cellToFaceIjk(cell, ijk)
    val n = if (pent) 5 else 6
    val vertFace = new Array[Int](6)
    val vi = new Array[Int](6)
    val vj = new Array[Int](6)
    val vk = new Array[Int](6)
    val adjRes = Proj.cellVertices(ijk, face, res, n, vertFace, vi, vj, vk)
    var mask = 0
    var v = 0
    val scratch = new Proj.IJK(0, 0, 0)
    while (v < n) {
      scratch.set(vi(v), vj(v), vk(v))
      var f = vertFace(v)
      if (pent) {
        var ov = Proj.adjustOverageClass2(scratch, f, adjRes, false, substrate = true)
        while (ov >= 0) {
          f = ov
          ov = Proj.adjustOverageClass2(scratch, f, adjRes, false, substrate = true)
        }
      } else {
        val ov = Proj.adjustOverageClass2(scratch, f, adjRes, false, substrate = true)
        if (ov >= 0) f = ov
      }
      mask |= (1 << f)
      v += 1
    }
    mask
  }

  def maxFaceCount(cell: Long): Int = if (isPentagon(cell)) 5 else 2
}
