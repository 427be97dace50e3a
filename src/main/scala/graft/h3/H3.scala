package graft.h3

/** H3 cell index kernel: bit layout, validity, hierarchy, ordering.
  *
  * Pure JVM, zero Spark dependencies; every method is static so Catalyst
  * codegen can call straight into it.
  *
  * Index layout (64-bit): bit 63 unused(0); 59-62 mode(=1 for cells);
  * 56-58 unused(0); 52-55 resolution; 45-51 base cell; then 15 x 3-bit
  * direction digits (res 1 digit at bits 42-44 ... res 15 at bits 0-2),
  * unused digits filled with 0b111.
  * (Semantics cross-checked with /root/reference/src/index/cell.rs:151-178,
  * 1948-2158 and index/bits.rs.)
  */
object H3 {
  final val MaxRes = 15
  final val ModeCell = 1
  final val ModeEdge = 2
  final val ModeVertex = 4

  /** Resolution 0, base cell 0 cell index. */
  final val DefaultCellIndex = 0x08001fffffffffffL

  /** Mask of the 45 direction bits. */
  final val DirectionsMask = 0x00001fffffffffffL

  // Direction codes.
  final val Center = 0
  final val K = 1
  final val J = 2
  final val JK = 3
  final val I = 4
  final val IK = 5
  final val IJ = 6

  /** rotate a direction 60deg counter-clockwise / clockwise. */
  val DirRotCCW: Array[Int] = Array(0, 5, 3, 1, 6, 4, 2)
  val DirRotCW: Array[Int] = Array(0, 3, 6, 2, 5, 1, 4)

  @inline def getResolution(bits: Long): Int = ((bits >>> 52) & 0xF).toInt

  @inline def setResolution(bits: Long, res: Int): Long =
    (bits & ~(0xFL << 52)) | (res.toLong << 52)

  @inline def clrResolution(bits: Long): Long = bits & ~(0xFL << 52)

  @inline def getBaseCell(bits: Long): Int = ((bits >>> 45) & 0x7F).toInt

  @inline def setBaseCell(bits: Long, cell: Int): Long =
    (bits & ~(0x7FL << 45)) | (cell.toLong << 45)

  @inline def getMode(bits: Long): Int = ((bits >>> 59) & 0xF).toInt

  /** Bit offset of the direction digit for resolution `res` (1..15). */
  @inline def directionOffset(res: Int): Int = 3 * (MaxRes - res)

  @inline def getDirection(bits: Long, res: Int): Int =
    ((bits >>> directionOffset(res)) & 7L).toInt

  @inline def setDirection(bits: Long, res: Int, dir: Int): Long = {
    val off = directionOffset(res)
    (bits & ~(7L << off)) | (dir.toLong << off)
  }

  @inline def clrDirection(bits: Long, res: Int): Long =
    bits & ~(7L << directionOffset(res))

  /** Fills digits below `res` with the 0b111 unused pattern. */
  @inline def setUnused(bits: Long, res: Int): Long =
    bits | ((1L << directionOffset(res)) - 1)

  @inline def isClass3(res: Int): Boolean = (res & 1) == 1

  /** First non-center direction digit, or 0 if none (all center / res 0). */
  def firstAxe(bits: Long): Int = {
    val res = getResolution(bits)
    if (res == 0) return 0
    val dirs = bits & DirectionsMask
    val bitIndex = java.lang.Long.numberOfLeadingZeros(dirs) - 19
    var r = bitIndex / 3 + 1
    if (r > res) r = res
    getDirection(bits, r)
  }

  /** Rotates the cell 60 degrees `count` times (ccw or cw). */
  def rotate60(bits0: Long, count: Int, ccw: Boolean): Long = {
    if (count == 0) return bits0
    var bits = bits0
    val table = if (ccw) DirRotCCW else DirRotCW
    val res = getResolution(bits)
    var r = 1
    while (r <= res) {
      var d = getDirection(bits, r)
      var c = 0
      while (c < count) { d = table(d); c += 1 }
      bits = setDirection(bits, r, d)
      r += 1
    }
    bits
  }

  /** Rotates a pentagonal cell 60 degrees once, skipping the deleted K axe. */
  def pentagonRotate60(bits0: Long, ccw: Boolean): Long = {
    var bits = bits0
    val res = getResolution(bits)
    if (res == 0) return bits
    // Direction that would be rotated onto the K axe.
    val trigger = if (ccw) JK else IK
    val double = firstAxe(bits) == trigger
    val table = if (ccw) DirRotCCW else DirRotCW
    var r = 1
    while (r <= res) {
      var d = table(getDirection(bits, r))
      if (double) d = table(d)
      bits = setDirection(bits, r, d)
      r += 1
    }
    bits
  }

  /** True when the 64-bit value is a valid H3 cell index. */
  def isValidCell(value: Long): Boolean = {
    // Reserved bits (63 and 56-58) must be zero.
    if (((value >>> 56) & 0x87L) != 0) return false
    if (getMode(value) != ModeCell) return false
    val base = getBaseCell(value)
    if (base > 121) return false
    val res = getResolution(value)
    // Unused tail must be all ones.
    val unusedBits = 3 * (MaxRes - res)
    val unusedMask = (1L << unusedBits) - 1
    if ((~value & unusedMask) != 0) return false
    // Used digits must not contain the 0b111 pattern.
    val dirsMask = if (res == 0) 0L else (1L << (res * 3)) - 1
    val dirs = (value >>> unusedBits) & dirsMask
    if (res > 0 && hasUnusedDirection(dirs)) return false
    // Pentagons cannot have a leading K digit (deleted subsequence).
    if (Tables.isPentagonBase(base) && res != 0) {
      val offset = 64 - res * 3
      if ((java.lang.Long.numberOfLeadingZeros(dirs << offset) + 1) % 3 == 0)
        return false
    }
    true
  }

  /** Null-byte trick over 3-bit chunks: detects a 0b111 triplet. */
  @inline private def hasUnusedDirection(dirs: Long): Boolean = {
    val lo = 0x1249249249249L // 0b001 repeated over 45 bits
    val hi = 0x4924924924924L // 0b100 repeated over 45 bits
    ((~dirs - lo) & (dirs & hi)) != 0
  }

  def isPentagon(bits: Long): Boolean = {
    val base = getBaseCell(bits)
    if (!Tables.isPentagonBase(base)) return false
    val res = getResolution(bits)
    val unusedBits = 3 * (MaxRes - res)
    val dirsMask = if (res == 0) 0L else (1L << (res * 3)) - 1
    ((bits >>> unusedBits) & dirsMask) == 0
  }

  /** Parent at coarser resolution; 0 when `res` is finer than the cell's. */
  def cellToParent(cell: Long, res: Int): Long = {
    if (res < 0 || res > getResolution(cell)) return 0L
    setUnused(setResolution(cell, res), res)
  }

  /** Center child at finer resolution; 0 when `res` is coarser. */
  def cellToCenterChild(cell: Long, res: Int): Long = {
    val cur = getResolution(cell)
    if (res < cur || res > MaxRes) return 0L
    val start = directionOffset(cur)
    val stop = directionOffset(res)
    val mask = (1L << (start - stop)) - 1
    setResolution(cell, res) & ~(mask << stop)
  }

  def cellToChildrenSize(cell: Long, res: Int): Long = {
    val cur = getResolution(cell)
    if (res < cur) return 0L
    if (res == cur) return 1L
    val n = res - cur
    if (isPentagon(cell)) Tables.PentChildren(n) else Tables.HexChildren(n)
  }

  /** Rank of the cell within its parent's ordered children at `parentRes`. */
  def cellToChildPos(cell: Long, parentRes: Int): Long = {
    val res = getResolution(cell)
    if (parentRes > res || parentRes < 0) return -1L
    val parent = cellToParent(cell, parentRes)
    var pos = 0L
    if (isPentagon(parent)) {
      var r = parentRes + 1
      while (r <= res) {
        val parentIsPent = isPentagon(cellToParent(cell, r - 1))
        var digit = getDirection(cell, r)
        if (parentIsPent && digit > 0) digit -= 1
        if (digit != 0) {
          val diff = res - r
          val hexCount = Tables.HexChildren(diff)
          val count0 =
            if (parentIsPent) Tables.PentChildren(diff) else hexCount
          pos += (digit - 1).toLong * hexCount + count0
        }
        r += 1
      }
    } else {
      var r = parentRes + 1
      while (r <= res) {
        pos += getDirection(cell, r).toLong * Tables.HexChildren(res - r)
        r += 1
      }
    }
    pos
  }

  /** Child of `cell` at ordered position `pos` at resolution `res`; 0 if none. */
  def childPosToCell(cell: Long, pos0: Long, res: Int): Long = {
    if (res < getResolution(cell) || res > MaxRes) return 0L
    if (pos0 < 0 || pos0 >= cellToChildrenSize(cell, res)) return 0L
    var pos = pos0
    var child = setResolution(cell, res)
    var curRes = getResolution(cell)
    if (isPentagon(cell)) {
      var r = curRes + 1
      var done = false
      while (r <= res && !done) {
        curRes = r
        val diff = res - r
        val pentCount = Tables.PentChildren(diff)
        if (pos < pentCount) {
          child = setDirection(child, r, 0)
        } else {
          val count = Tables.HexChildren(diff)
          pos -= pentCount
          child = setDirection(child, r, (pos / count + 2).toInt)
          pos %= count
          done = true
        }
        r += 1
      }
    }
    var r = curRes + 1
    while (r <= res) {
      val count = Tables.HexChildren(res - r)
      child = setDirection(child, r, (pos / count).toInt)
      pos %= count
      r += 1
    }
    child
  }

  /** All children of `cell` at resolution `res` (carry-increment walk). */
  def cellToChildren(cell: Long, res: Int): Array[Long] = {
    val n = cellToChildrenSize(cell, res)
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n.toInt)
    val parentRes = getResolution(cell)
    var scratch = {
      val range = res - parentRes
      if (range == 0) cell
      else {
        val mask = (1L << (range * 3)) - 1
        setResolution(cell & ~(mask << directionOffset(res)), res)
      }
    }
    var skipRes = if (isPentagon(cell)) res else -1
    var idx = 0
    val count = n.toInt
    while (idx < count) {
      out(idx) = scratch
      idx += 1
      if (idx < count) {
        var r = res
        var break = false
        while (r > parentRes && !break) {
          // Increment digit at r with carry propagation (0b111 wraps to 0).
          scratch += 1L << directionOffset(r)
          var d = getDirection(scratch, r)
          if (skipRes == r && d == K) {
            scratch += 1L << directionOffset(r)
            d = getDirection(scratch, r)
            skipRes -= 1
          }
          if (d > IJ) {
            scratch = clrDirection(scratch, r)
            r -= 1
          } else break = true
        }
      }
    }
    out
  }

  /** Sort key that groups parents adjacent to children (resolution cleared). */
  @inline def orderKey(cell: Long): Long = clrResolution(cell)

  /** Compacts a set of same-resolution unique cells into a minimal cover.
    * Input must be sorted by [[orderKey]] and duplicate-free.
    * Returns the compacted array (heterogeneous resolutions). */
  def compactSorted(cells: Array[Long]): Array[Long] = {
    if (cells.isEmpty) return cells
    val res = getResolution(cells(0))
    if (res == 0) return cells
    val out = new Array[Long](cells.length)
    var wr = 0
    var rd = 0
    while (rd < cells.length) {
      val cell = cells(rd)
      var collapsed = false
      if (getDirection(cell, res) == 0) {
        var r = 0
        while (r < res && !collapsed) {
          val parent = cellToParent(cell, r)
          val count = cellToChildrenSize(parent, res)
          if (count <= (cells.length - rd).toLong) {
            val expected = lastSibling(cell, r)
            if (cells(rd + count.toInt - 1) == expected) {
              // Whole branch present: collapse to parent and recheck the
              // parent against even coarser levels on the next pass.
              out(wr) = parent
              wr += 1
              rd += count.toInt
              collapsed = true
            }
          }
          r += 1
        }
      }
      if (!collapsed) {
        out(wr) = cell
        wr += 1
        rd += 1
      }
    }
    // A single pass suffices: each candidate is checked against every
    // ancestor level, coarsest first, before being emitted.
    java.util.Arrays.copyOf(out, wr)
  }

  /** Last sibling needed for `cell` to compact into resolution `res`. */
  private def lastSibling(cell: Long, res: Int): Long = {
    val diff = getResolution(cell) - res
    val mask = (1L << (diff * 3)) - 1
    val offset = directionOffset(getResolution(cell))
    val newDirs = (0x00001b6db6db6db6L & mask) << offset
    (cell & ~(mask << offset)) | newDirs
  }

  /** Expands a compacted set back to cells at `res`. Guarded against
    * pathological blow-ups (> 100M output cells) to keep SQL usage safe. */
  def uncompact(cells: Array[Long], res: Int): Array[Long] = {
    var total = 0L
    var i = 0
    while (i < cells.length) { total += cellToChildrenSize(cells(i), res); i += 1 }
    require(total <= 100000000L,
      s"uncompact would produce $total cells (max 100M); use a coarser resolution")
    val out = new Array[Long](total.toInt)
    var off = 0
    i = 0
    while (i < cells.length) {
      val kids = cellToChildren(cells(i), res)
      System.arraycopy(kids, 0, out, off, kids.length)
      off += kids.length
      i += 1
    }
    out
  }

  /** Next cell in cell-prefix order at the same resolution, or 0 at the end. */
  def succ(cell: Long): Long = {
    val IjMask = 0x36DB6DB6DB6DB6L // 0o666666666666666
    val res = getResolution(cell)
    val off = directionOffset(res)
    var bits = cell >>> off
    val bitpos = java.lang.Long.numberOfTrailingZeros(bits ^ IjMask)
    val respos = bitpos / 3
    bits &= ~((1L << (respos * 3)) - 1)
    bits = setUnused(bits << off, res)
    if (respos < res) {
      val one = 1L << (off + respos * 3)
      bits += one
      if (isValidCell(bits)) bits else bits + one
    } else {
      val base = getBaseCell(cell)
      if (base == 121) 0L else setBaseCell(bits, base + 1)
    }
  }

  /** Previous cell in cell-prefix order at the same resolution, or 0. */
  def pred(cell: Long): Long = {
    val res = getResolution(cell)
    val off = directionOffset(res)
    var bits = cell >>> off
    val bitpos = java.lang.Long.numberOfTrailingZeros(bits)
    val respos = bitpos / 3
    bits |= 0x36DB6DB6DB6DB6L & ((1L << (respos * 3)) - 1)
    bits = setUnused(bits << off, res)
    if (respos < res) {
      val one = 1L << (off + respos * 3)
      bits -= one
      if (isValidCell(bits)) bits else bits - one
    } else {
      val base = getBaseCell(cell)
      if (base == 0) 0L else setBaseCell(bits, base - 1)
    }
  }

  /** First cell at resolution `res` in cell-prefix order. */
  def firstCell(res: Int): Long =
    setUnused(setResolution(DefaultCellIndex & ~DirectionsMask, res), res)

  /** Last cell at resolution `res` in cell-prefix order. */
  def lastCell(res: Int): Long = {
    var bits = setBaseCell(setResolution(DefaultCellIndex, res), 121)
    var r = 1
    while (r <= res) { bits = setDirection(bits, r, IJ); r += 1 }
    setUnused(bits, res)
  }

  def cellToString(cell: Long): String = java.lang.Long.toHexString(cell)

  def stringToCell(s: String): Long =
    try {
      val v = java.lang.Long.parseUnsignedLong(s.trim, 16)
      if (isValidCell(v)) v else 0L
    } catch { case _: NumberFormatException => 0L }

  // ---------------------------------------------------------------------
  // Measurement helpers.

  final val EarthRadiusKm = 6371.007180918475

  /** Haversine great-circle distance in radians. */
  def distanceRads(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val sinLat = Math.sin((lat2 - lat1) * 0.5)
    val sinLng = Math.sin((lng2 - lng1) * 0.5)
    val a = Math.fma(sinLat, sinLat,
      Math.cos(lat1) * Math.cos(lat2) * sinLng * sinLng)
    2.0 * Math.atan2(Math.sqrt(a), Math.sqrt(1.0 - a))
  }

  /** Haversine distance in radians between two points in degrees. */
  def greatCircleDistanceRads(lat1Deg: Double, lng1Deg: Double,
                              lat2Deg: Double, lng2Deg: Double): Double =
    distanceRads(Math.toRadians(lat1Deg), Math.toRadians(lng1Deg),
      Math.toRadians(lat2Deg), Math.toRadians(lng2Deg))

  /** Haversine distance in kilometers between two points in degrees. */
  def greatCircleDistanceKm(lat1Deg: Double, lng1Deg: Double,
                            lat2Deg: Double, lng2Deg: Double): Double =
    greatCircleDistanceRads(lat1Deg, lng1Deg, lat2Deg, lng2Deg) * EarthRadiusKm

  /** Haversine distance in meters between two points in degrees. */
  def greatCircleDistanceM(lat1Deg: Double, lng1Deg: Double,
                           lat2Deg: Double, lng2Deg: Double): Double =
    greatCircleDistanceRads(lat1Deg, lng1Deg, lat2Deg, lng2Deg) * EarthRadiusKm * 1000.0

  // ---------------------------------------------------------------------
  // Projection facade (implemented in Proj).

  /** Point (degrees) to containing cell at `res`; 0 on invalid input. */
  def latLngToCell(latDeg: Double, lngDeg: Double, res: Int): Long = {
    if (res < 0 || res > MaxRes) return 0L
    if (java.lang.Double.isNaN(latDeg) || java.lang.Double.isInfinite(latDeg) ||
        java.lang.Double.isNaN(lngDeg) || java.lang.Double.isInfinite(lngDeg)) return 0L
    Proj.latLngToCell(Math.toRadians(latDeg), Math.toRadians(lngDeg), res)
  }

  /** Cell center latitude in degrees. */
  def cellToLat(cell: Long): Double = Math.toDegrees(Proj.cellCenter(cell)(0))

  /** Cell center longitude in degrees. */
  def cellToLng(cell: Long): Double = Math.toDegrees(Proj.cellCenter(cell)(1))

  /** Cell center as [latDeg, lngDeg]. */
  def cellToLatLng(cell: Long): Array[Double] = {
    val c = Proj.cellCenter(cell)
    Array(Math.toDegrees(c(0)), Math.toDegrees(c(1)))
  }

  /** Cell boundary as [lat0,lng0, lat1,lng1, ...] in degrees. */
  def cellToBoundary(cell: Long): Array[Double] = {
    val b = Proj.cellBoundary(cell)
    val out = new Array[Double](b.length)
    var i = 0
    while (i < b.length) { out(i) = Math.toDegrees(b(i)); i += 1 }
    out
  }

  /** Cell area in square radians (Cagnoli + Kahan, matches reference). */
  def cellAreaRads2(cell: Long): Double = Proj.cellAreaRads2(cell)

  def cellAreaKm2(cell: Long): Double =
    cellAreaRads2(cell) * EarthRadiusKm * EarthRadiusKm

  def cellAreaM2(cell: Long): Double = cellAreaKm2(cell) * 1e6

  // ---------------------------------------------------------------------
  // Traversal facade (implemented in Traverse).

  /** Cells within grid distance k; even slots cell, odd slots distance. */
  def gridDiskDistances(origin: Long, k: Int): Array[Long] =
    Traverse.gridDiskDistances(origin, k)

  def gridDisk(origin: Long, k: Int): Array[Long] = {
    val packed = Traverse.gridDiskDistances(origin, k)
    val out = new Array[Long](packed.length / 2)
    var i = 0
    while (i < out.length) { out(i) = packed(2 * i); i += 1 }
    out
  }

  def gridRing(origin: Long, k: Int): Array[Long] = Traverse.gridRing(origin, k)

  /** Grid distance between two cells; -1 when undefined (pentagon etc). */
  def gridDistance(a: Long, b: Long): Long = Traverse.gridDistance(a, b)

  def areNeighborCells(a: Long, b: Long): Boolean = Traverse.areNeighbors(a, b)

  /** Line of cells between two indexes, empty on failure. */
  def gridPathCells(a: Long, b: Long): Array[Long] = Traverse.gridPathCells(a, b)

  def maxGridDiskSize(k: Int): Long = 3L * k * (k + 1) + 1
}
