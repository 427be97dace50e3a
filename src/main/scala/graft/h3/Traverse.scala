package graft.h3

import scala.collection.mutable

/** Grid traversal: unidirectional neighbor stepping, k-rings, local IJK
  * coordinates, grid distance and grid paths.
  *
  * Semantics match the reference implementation
  * (/root/reference/src/grid/{algo,iterator}.rs, coord/localij.rs,
  * index/cell.rs:1294-1363,1702-1834).
  */
object Traverse {
  import H3._
  import Tables._
  import Proj.IJK

  /** Directions for walking a hexagonal ring CCW around direction I. */
  private val RingDirections: Array[Int] = Array(J, JK, K, IK, I, IJ)

  /** Packs (cell, rotations) into one long: rotations live in bits 56-58
    * which are always zero in a valid cell index. 0 = failure (pentagon
    * K-axe distortion). */
  @inline def packedCell(packed: Long): Long = packed & ~(7L << 56)
  @inline def packedRot(packed: Long): Int = ((packed >>> 56) & 7L).toInt

  /** One neighbor step from `origin` in `dir`, with `rotations` pre-applied
    * ccw rotations. Returns packed (cell, newRotations), or 0 when the
    * translation would cross a pentagon's deleted K axe. */
  def neighborRotations(origin: Long, dir0: Int, rotations0: Int): Long = {
    var rotations = rotations0
    var current = origin
    var dir = dir0
    var c = 0
    while (c < rotations % 6) { dir = DirRotCCW(dir); c += 1 }
    // (rotations can exceed 6; normalize via modulo above)

    val originRes = getResolution(origin)
    var res = originRes
    var r = originRes
    var break = false
    while (r >= 1 && !break) {
      val from = getDirection(current, r)
      var next = 0
      if (isClass3(r)) {
        current = setDirection(current, r, NewDirectionII(from)(dir))
        next = NewAdjustmentII(from)(dir)
      } else {
        current = setDirection(current, r, NewDirectionIII(from)(dir))
        next = NewAdjustmentIII(from)(dir)
      }
      if (next == Center) break = true
      else {
        dir = next
        res = r - 1
        r -= 1
      }
    }

    val oldBaseCell = getBaseCell(origin)
    var newRotations = 0
    if (res == 0) {
      // The step propagated all the way to the base cell.
      val nb = BaseCellNeighbors(oldBaseCell)(dir)
      if (nb >= 0) {
        current = setBaseCell(current, nb)
        newRotations = BaseCellNeighbor60CCWRots(oldBaseCell)(dir)
      } else {
        // Deleted K vertex at the base cell level: borders IK instead.
        val nbIk = BaseCellNeighbors(oldBaseCell)(IK)
        current = setBaseCell(current, nbIk)
        current = rotate60(current, 1, ccw = true)
        rotations += 1
        newRotations = BaseCellNeighbor60CCWRots(oldBaseCell)(IK)
      }
    }

    val newBaseCell = getBaseCell(current)
    if (Tables.isPentagonBase(newBaseCell)) {
      var alreadyAdjustedK = false
      if (firstAxe(current) == K) {
        if (oldBaseCell == newBaseCell) {
          val oldLeading = firstAxe(origin)
          if (oldLeading == 0) return 0L // undefined: K direction deleted here
          if (oldLeading == JK) {
            current = rotate60(current, 1, ccw = true)
            rotations += 1
          } else if (oldLeading == IK) {
            current = rotate60(current, 1, ccw = false)
            rotations += 5
          }
        } else {
          val oldHomeFace = BaseCellData(oldBaseCell)(0)
          if (Proj.isCwOffset(newBaseCell, oldHomeFace))
            current = rotate60(current, 1, ccw = false)
          alreadyAdjustedK = true
        }
      }

      var i = 0
      while (i < newRotations) {
        current = pentagonRotate60(current, ccw = true)
        i += 1
      }

      if (oldBaseCell != newBaseCell) {
        val leading = firstAxe(current)
        if (newBaseCell == 4 || newBaseCell == 117) {
          // Polar pentagons have all-I neighbors.
          if (oldBaseCell != 118 && oldBaseCell != 8 && leading != JK)
            rotations += 1
        } else if (!alreadyAdjustedK && leading == IK) {
          rotations += 1
        }
      }
    } else if (newRotations != 0) {
      current = rotate60(current, newRotations, ccw = true)
    }

    current | (((rotations + newRotations) % 6).toLong << 56)
  }

  /** Direction from origin to a neighboring cell, or 0 if not neighbors. */
  def directionForNeighbor(origin: Long, destination: Long): Int = {
    val start = if (isPentagon(origin)) 2 else 1
    var d = start
    while (d <= 6) {
      val p = neighborRotations(origin, d, 0)
      if (p != 0 && packedCell(p) == destination) return d
      d += 1
    }
    0
  }

  /** Cells within grid distance k as [cell0,dist0,cell1,dist1,...].
    * Tries the O(1)-state spiral first, falls back to BFS near pentagons. */
  def gridDiskDistances(origin: Long, k: Int): Array[Long] = {
    val fast = gridDiskDistancesFast(origin, k)
    if (fast != null) fast else gridDiskDistancesSafe(origin, k)
  }

  /** Spiral walk; null when a pentagon (or distortion) is encountered. */
  def gridDiskDistancesFast(origin0: Long, k: Int): Array[Long] = {
    if (isPentagon(origin0)) return null
    val n = (3L * k * (k + 1) + 1).toInt
    val out = new Array[Long](2 * n)
    out(0) = origin0
    out(1) = 0
    if (k == 0) return out
    var idx = 1
    var origin = origin0
    var rotations = 0
    var ring = 1
    while (ring <= k) {
      // Step outward to the next ring, then walk its 6 sides; the walk ends
      // back on the ring's start cell, which is emitted last.
      val p = neighborRotations(origin, I, rotations)
      if (p == 0) return null
      origin = packedCell(p)
      rotations = packedRot(p)
      var side = 0
      while (side < 6) {
        var pos = 0
        while (pos < ring) {
          val q = neighborRotations(origin, RingDirections(side), rotations)
          if (q == 0) return null
          origin = packedCell(q)
          rotations = packedRot(q)
          if (isPentagon(origin)) return null
          out(2 * idx) = origin
          out(2 * idx + 1) = ring
          idx += 1
          pos += 1
        }
        side += 1
      }
      ring += 1
    }
    if (idx == n) out else java.util.Arrays.copyOf(out, 2 * idx)
  }

  /** BFS with a seen-set; pentagon-proof. */
  def gridDiskDistancesSafe(origin: Long, k: Int): Array[Long] = {
    val seen = new mutable.HashSet[Long]
    val queue = new java.util.ArrayDeque[Long]
    val dists = new java.util.ArrayDeque[Int]
    val outCells = new mutable.ArrayBuilder.ofLong
    val outDists = new mutable.ArrayBuilder.ofLong
    queue.add(origin)
    dists.add(0)
    var count = 0
    while (!queue.isEmpty) {
      val cell = queue.poll()
      val ring = dists.poll()
      if (ring <= k && seen.add(cell)) {
        if (ring < k) {
          var d = 0
          while (d < 6) {
            val p = neighborRotations(cell, RingDirections(d), 0)
            if (p != 0) {
              queue.add(packedCell(p))
              dists.add(ring + 1)
            }
            d += 1
          }
        }
        outCells += cell
        outDists += ring
        count += 1
      }
    }
    val cells = outCells.result()
    val ds = outDists.result()
    val out = new Array[Long](2 * count)
    var i = 0
    while (i < count) { out(2 * i) = cells(i); out(2 * i + 1) = ds(i); i += 1 }
    out
  }

  /** Hollow ring at exactly distance k. */
  def gridRing(origin: Long, k: Int): Array[Long] = {
    if (k == 0) return Array(origin)
    val fast = gridRingFast(origin, k)
    if (fast != null) return fast
    // Fallback: filter the safe disk.
    val disk = gridDiskDistancesSafe(origin, k)
    val out = new mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < disk.length / 2) {
      if (disk(2 * i + 1) == k) out += disk(2 * i)
      i += 1
    }
    out.result()
  }

  def gridRingFast(origin0: Long, k: Int): Array[Long] = {
    if (isPentagon(origin0)) return null
    var origin = origin0
    var rotations = 0
    var i = 0
    while (i < k) {
      val p = neighborRotations(origin, I, rotations)
      if (p == 0) return null
      origin = packedCell(p)
      rotations = packedRot(p)
      if (isPentagon(origin)) return null
      i += 1
    }
    val lastIndex = origin
    val out = new Array[Long](6 * k)
    var idx = 0
    var direction = 0
    while (direction < 6) {
      var pos = 0
      while (pos < k) {
        out(idx) = origin
        idx += 1
        val p = neighborRotations(origin, RingDirections(direction), rotations)
        if (p == 0) return null
        origin = packedCell(p)
        rotations = packedRot(p)
        if (isPentagon(origin)) return null
        pos += 1
      }
      direction += 1
    }
    if (origin != lastIndex) null else out
  }

  // -------------------------------------------------------------------
  // Local IJK coordinates (anchored by an origin cell).

  /** Base cell whose home coordinates are IJK (0,0,0). */
  private val OriginBaseCell = 2

  /** Direction from one base cell to a neighboring one; -1 if not adjacent. */
  private def baseCellDirection(from: Int, to: Int): Int = {
    val row = BaseCellNeighbors(from)
    var d = 0
    while (d < 7) {
      if (row(d) == to) return d
      d += 1
    }
    -1
  }

  /** IJK coords of `bits` within its own base cell's coordinate system. */
  private def baseCellLocalIjk(bits: Long, res: Int, out: IJK): Unit = {
    out.set(0, 0, 0)
    var r = 1
    while (r <= res) {
      out.downAp7(isClass3(r))
      out.moveNeighbor(getDirection(bits, r))
      r += 1
    }
  }

  /** Computes local IJK coordinates of `index` anchored at `origin`.
    * Returns false on failure (pentagon distortion / not unfoldable). */
  def toLocalIjk(origin: Long, index0: Long, out: IJK): Boolean = {
    val originRes = getResolution(origin)
    if (originRes != getResolution(index0)) return false
    var index = index0
    val originBase = getBaseCell(origin)
    val base = getBaseCell(index)

    var dir = Center
    var revDir = Center
    if (originBase != base) {
      dir = baseCellDirection(originBase, base)
      if (dir < 0) return false
      revDir = baseCellDirection(base, originBase)
    }

    val originOnPent = Tables.isPentagonBase(originBase)
    val indexOnPent = Tables.isPentagonBase(base)

    if (dir != Center) {
      val baseCellRotations = BaseCellNeighbor60CCWRots(originBase)(dir)
      if (indexOnPent) {
        var i = 0
        var bits = index
        while (i < baseCellRotations) {
          revDir = if (revDir == IK) DirRotCW(DirRotCW(revDir)) else DirRotCW(revDir)
          bits = pentagonRotate60(bits, ccw = false)
          i += 1
        }
        index = bits
      } else {
        var i = 0
        while (i < baseCellRotations) { revDir = DirRotCW(revDir); i += 1 }
        index = rotate60(index, baseCellRotations, ccw = false)
      }
    }

    baseCellLocalIjk(index, originRes, out)

    if (dir != Center) {
      var pentagonRotationsCount = 0
      var directionRotations = 0
      if (originOnPent) {
        val leading = firstAxe(origin)
        if (failedDirection(leading, dir)) return false
        pentagonRotationsCount = PentagonRotations(leading)(dir)
        if (pentagonRotationsCount < 0) return false
        directionRotations = pentagonRotationsCount
      } else if (indexOnPent) {
        val leading = firstAxe(index)
        if (failedDirection(leading, revDir)) return false
        pentagonRotationsCount = PentagonRotations(revDir)(leading)
        if (pentagonRotationsCount < 0) return false
      }

      var i = 0
      while (i < pentagonRotationsCount) { out.rotate60(ccw = false); i += 1 }

      val offset = new IJK(0, 0, 0)
      offset.moveNeighbor(dir)
      var r = originRes
      while (r >= 1) {
        offset.downAp7(isClass3(r))
        r -= 1
      }
      i = 0
      while (i < directionRotations) { offset.rotate60(ccw = false); i += 1 }

      out.i += offset.i; out.j += offset.j; out.k += offset.k
      out.normalize()
    } else if (originOnPent && indexOnPent) {
      val originLeading = firstAxe(origin)
      val indexLeading = firstAxe(index)
      if (failedDirection(originLeading, indexLeading)) return false
      val rotations = PentagonRotations(originLeading)(indexLeading)
      if (rotations < 0) return false
      var i = 0
      while (i < rotations) { out.rotate60(ccw = false); i += 1 }
    }
    true
  }

  @inline private def failedDirection(originDir: Int, indexDir: Int): Boolean = {
    val offset = originDir * 7 + indexDir
    (FailedDirections & (1L << offset)) != 0
  }

  /** Reverse tables for unfolding (localIjkToCell). */
  private val PentRotRev: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0), Array(-1, -1, -1, -1, -1, -1, -1),
    Array(0, 1, 0, 0, 0, 0, 0), Array(0, 1, 0, 0, 0, 1, 0),
    Array(0, 5, 0, 0, 0, 0, 0), Array(0, 5, 0, 5, 0, 0, 0),
    Array(0, 0, 0, 0, 0, 0, 0))

  private val PentRotRevNonpolar: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0), Array(-1, -1, -1, -1, -1, -1, -1),
    Array(0, 1, 0, 0, 0, 0, 0), Array(0, 1, 0, 0, 0, 1, 0),
    Array(0, 5, 0, 0, 0, 0, 0), Array(0, 1, 0, 5, 1, 1, 0),
    Array(0, 0, 0, 0, 0, 0, 0))

  private val PentRotRevPolar: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0), Array(-1, -1, -1, -1, -1, -1, -1),
    Array(0, 1, 1, 1, 1, 1, 1), Array(0, 1, 0, 0, 0, 1, 0),
    Array(0, 1, 0, 0, 1, 1, 1), Array(0, 1, 0, 5, 1, 1, 0),
    Array(0, 1, 1, 0, 1, 1, 1))

  /** Recovers a cell from local IJK coordinates anchored at `anchor`.
    * Returns 0 on failure. */
  def localIjkToCell(anchor: Long, ijkIn: IJK): Long = {
    val res = getResolution(anchor)
    val originBase = getBaseCell(anchor)
    val originOnPent = Tables.isPentagonBase(originBase)

    var bits = setResolution(DefaultCellIndex, res)

    if (res == 0) {
      if (ijkIn.i > 1 || ijkIn.j > 1 || ijkIn.k > 1) return 0L
      val dir = ijkIn.toDirection
      val newBase = BaseCellNeighbors(originBase)(dir)
      if (newBase < 0) return 0L
      return setBaseCell(bits, newBase)
    }

    // Build digits from finest resolution up.
    val ijk = new IJK(ijkIn.i, ijkIn.j, ijkIn.k)
    val last = new IJK(0, 0, 0)
    val lastCenter = new IJK(0, 0, 0)
    var r = res
    while (r >= 1) {
      last.copyFrom(ijk)
      if (isClass3(r)) {
        ijk.upAp7(true)
        lastCenter.copyFrom(ijk)
        lastCenter.downAp7(true)
      } else {
        ijk.upAp7(false)
        lastCenter.copyFrom(ijk)
        lastCenter.downAp7(false)
      }
      last.i -= lastCenter.i; last.j -= lastCenter.j; last.k -= lastCenter.k
      last.normalize()
      bits = setDirection(bits, r, last.toDirection)
      r -= 1
    }

    if (ijk.i > 1 || ijk.j > 1 || ijk.k > 1) return 0L
    var dir = ijk.toDirection
    var baseCell = if (dir == Center) originBase
                   else BaseCellNeighbors(originBase)(dir)
    if (dir != Center && baseCell < 0 && !originOnPent) return 0L
    var indexOnPent = baseCell >= 0 && Tables.isPentagonBase(baseCell)

    if (dir != Center) {
      var pentagonRotations = 0
      if (originOnPent) {
        val leading = firstAxe(anchor)
        pentagonRotations = PentRotRev(leading)(dir)
        if (pentagonRotations < 0) return 0L
        var i = 0
        while (i < pentagonRotations) { dir = DirRotCCW(dir); i += 1 }
        baseCell = BaseCellNeighbors(originBase)(dir)
        if (baseCell < 0) return 0L
        indexOnPent = Tables.isPentagonBase(baseCell)
      }
      if (baseCell < 0) return 0L
      val baseCellRotations = BaseCellNeighbor60CCWRots(originBase)(dir)

      if (indexOnPent) {
        val revDir = baseCellDirection(baseCell, originBase)
        bits = rotate60(bits, baseCellRotations, ccw = true)
        val leading = firstAxe(bits)
        val rot =
          if (baseCell == 4 || baseCell == 117) PentRotRevPolar(revDir)(leading)
          else PentRotRevNonpolar(revDir)(leading)
        if (rot < 0) return 0L
        var i = 0
        while (i < rot) { bits = pentagonRotate60(bits, ccw = true); i += 1 }
      } else {
        bits = rotate60(bits, pentagonRotations + baseCellRotations, ccw = true)
      }
    } else if (originOnPent && indexOnPent) {
      val originLeading = firstAxe(anchor)
      val indexLeading = firstAxe(bits)
      val rotations = PentRotRev(originLeading)(indexLeading)
      if (rotations < 0) return 0L
      bits = rotate60(bits, rotations, ccw = true)
    }

    if (indexOnPent && firstAxe(bits) == K) return 0L
    if (baseCell < 0) return 0L
    setBaseCell(bits, baseCell)
  }

  /** Grid distance between two same-resolution cells; -1 when undefined. */
  def gridDistance(a: Long, b: Long): Long = {
    val src = new IJK(0, 0, 0)
    val dst = new IJK(0, 0, 0)
    if (!toLocalIjk(a, a, src)) return -1L
    if (!toLocalIjk(a, b, dst)) return -1L
    val di = src.i - dst.i
    val dj = src.j - dst.j
    val dk = src.k - dst.k
    val m = Math.min(di, Math.min(dj, dk))
    Math.max(Math.abs(di - m), Math.max(Math.abs(dj - m), Math.abs(dk - m)))
  }

  /** Line of cells from a to b inclusive; empty array on failure. */
  def gridPathCells(a: Long, b: Long): Array[Long] = {
    val src = new IJK(0, 0, 0)
    val dst = new IJK(0, 0, 0)
    if (!toLocalIjk(a, a, src)) return Array.emptyLongArray
    if (!toLocalIjk(a, b, dst)) return Array.emptyLongArray
    val di = src.i - dst.i
    val dj = src.j - dst.j
    val dk = src.k - dst.k
    val m = Math.min(di, Math.min(dj, dk))
    val distance =
      Math.max(Math.abs(di - m), Math.max(Math.abs(dj - m), Math.abs(dk - m)))

    // Cube coordinates for linear interpolation.
    val sci = -src.i + src.k
    val scj = src.j - src.k
    val sck = -sci - scj
    val eci = -dst.i + dst.k
    val ecj = dst.j - dst.k
    val eck = -eci - ecj

    val inv = if (distance == 0) 0.0 else 1.0 / distance
    val iStep = (eci - sci) * inv
    val jStep = (ecj - scj) * inv
    val kStep = (eck - sck) * inv

    val out = new Array[Long](distance + 1)
    val ijk = new IJK(0, 0, 0)
    var n = 0
    while (n <= distance) {
      // Round cube coordinates, keeping i+j+k = 0.
      val fi = sci + iStep * n
      val fj = scj + jStep * n
      val fk = sck + kStep * n
      var ri = Math.round(fi).toInt
      var rj = Math.round(fj).toInt
      var rk = Math.round(fk).toInt
      val iDiff = Math.abs(ri - fi)
      val jDiff = Math.abs(rj - fj)
      val kDiff = Math.abs(rk - fk)
      if (iDiff > jDiff && iDiff > kDiff) ri = -rj - rk
      else if (jDiff > kDiff) rj = -ri - rk
      else rk = -ri - rj
      ijk.set(-ri, rj, 0)
      ijk.normalize()
      val cell = localIjkToCell(a, ijk)
      if (cell == 0L) return Array.emptyLongArray
      out(n) = cell
      n += 1
    }
    out
  }

  /** True when the two same-resolution cells share an edge. */
  def areNeighbors(a: Long, b: Long): Boolean = {
    if (a == b) return false
    val res = getResolution(a)
    if (res != getResolution(b)) return false
    if (res > 0) {
      // Same-parent fast path.
      val pa = cellToParent(a, res - 1)
      if (pa == cellToParent(b, res - 1)) {
        val da = getDirection(a, res)
        val db = getDirection(b, res)
        if (da == Center || db == Center) return true
        // Neighbor sets in cw / ccw order.
        val cw = Array(Center, JK, IJ, J, IK, K, I)
        val ccw = Array(Center, IK, JK, K, IJ, I, J)
        if (cw(da) == db || ccw(da) == db) return true
      }
    }
    val disk = gridDiskDistances(a, 1)
    var i = 0
    while (i < disk.length / 2) {
      if (disk(2 * i) == b && disk(2 * i + 1) == 1) return true
      i += 1
    }
    false
  }
}
