package graft.h3

/** Icosahedral gnomonic projection pipeline: lat/lng <-> FaceIJK <-> cell.
  *
  * Re-derivation of the face-centered IJK coordinate math of H3
  * (see /root/reference/src/coord/{vec2d,vec3d,ijk,faceijk}.rs for the
  * reference semantics). All angles in radians. Uses JDK17 `Math.fma`
  * to match the reference's pervasive `mul_add` for bit-stable rounding.
  */
object Proj {
  import H3._
  import Tables._

  final val Epsilon = 1e-16
  final val Res0UGnomonic = 0.381966011250105
  final val InvRes0UGnomonic = 2.618033988749896
  final val Ap7RotRads = 0.3334731722518321
  final val Sqrt32 = 0.8660254037844386
  final val RSin60 = 1.1547005383792515
  final val TwoPi = 2.0 * Math.PI

  val Sqrt7Powers: Array[Double] = Array(
    1.0, 2.6457513110645907, 7.0, 18.520259177452136, 49.00000000000001,
    129.64181424216497, 343.0000000000001, 907.4926996951549,
    2401.000000000001, 6352.448897866085, 16807.000000000007,
    44467.1422850626, 117649.00000000007, 311269.9959954382,
    823543.0000000006, 2178889.971968068, 5764801.0)

  val InvSqrt7Powers: Array[Double] = Array(
    1.0, 0.3779644730092272, 0.14285714285714285, 0.05399492471560388,
    0.02040816326530612, 0.007713560673657697, 0.002915451895043731,
    0.0011019372390939565, 0.0004164931278633901, 0.00015741960558485093,
    0.00005949901826619858, 0.00002248851508355013, 0.000008499859752314082,
    0.000003212645011935733, 0.0000012142656789020115,
    0.0000004589492874193903, 0.00000017346652555743034)

  @inline def toPositiveAngle(a: Double): Double =
    if (a < 0) a + TwoPi else if (a >= TwoPi) a - TwoPi else a

  // Precomputed north/east tangent bases at each face center (constants of
  // the grid; avoids recomputing a normalization per indexed point).
  private val FaceNorthX = new Array[Double](20)
  private val FaceNorthY = new Array[Double](20)
  private val FaceNorthZ = new Array[Double](20)
  private val FaceEastX = new Array[Double](20)
  private val FaceEastY = new Array[Double](20)
  private val FaceEastZ = new Array[Double](20)
  locally {
    var f = 0
    while (f < 20) {
      val cx = FaceCenterX(f); val cy = FaceCenterY(f); val cz = FaceCenterZ(f)
      var nx = -cz * cx
      var ny = -cz * cy
      var nz = Math.fma(-cz, cz, 1.0)
      val norm = Math.sqrt(Math.fma(nx, nx, Math.fma(ny, ny, nz * nz)))
      if (norm > 0) { val s = 1.0 / norm; nx *= s; ny *= s; nz *= s }
      FaceNorthX(f) = nx; FaceNorthY(f) = ny; FaceNorthZ(f) = nz
      FaceEastX(f) = Math.fma(ny, cz, -(nz * cy))
      FaceEastY(f) = Math.fma(nz, cx, -(nx * cz))
      FaceEastZ(f) = Math.fma(nx, cy, -(ny * cx))
      f += 1
    }
  }

  // cos/sin of the class-II (FaceAxesAzRadsCII) and class-III (that minus
  // Ap7RotRads) axis azimuths, precomputed per face: latLngToCell needs
  // cos(theta)/sin(theta) for theta = A - az(face->p), which expands by the
  // angle-difference identities to dot products against these constants and
  // the point's own tangent components — no atan2/cos/sin on the hot path.
  private val FaceAxCos2 = new Array[Double](20)
  private val FaceAxSin2 = new Array[Double](20)
  private val FaceAxCos3 = new Array[Double](20)
  private val FaceAxSin3 = new Array[Double](20)
  locally {
    var f = 0
    while (f < 20) {
      val a2 = FaceAxesAzRadsCII(f)
      val a3 = a2 - Ap7RotRads
      FaceAxCos2(f) = Math.cos(a2); FaceAxSin2(f) = Math.sin(a2)
      FaceAxCos3(f) = Math.cos(a3); FaceAxSin3(f) = Math.sin(a3)
      f += 1
    }
  }

  /** Azimuth from the face center to (bx,by,bz); scale-invariant atan2 of
    * tangent-plane projections against the precomputed basis. */
  @inline private def faceAzimuth(face: Int, bx: Double, by: Double, bz: Double): Double = {
    val cx = FaceCenterX(face); val cy = FaceCenterY(face); val cz = FaceCenterZ(face)
    val dot = Math.fma(bx, cx, Math.fma(by, cy, bz * cz))
    val px = Math.fma(-dot, cx, bx)
    val py = Math.fma(-dot, cy, by)
    val pz = Math.fma(-dot, cz, bz)
    Math.atan2(
      Math.fma(px, FaceEastX(face), Math.fma(py, FaceEastY(face), pz * FaceEastZ(face))),
      Math.fma(px, FaceNorthX(face), Math.fma(py, FaceNorthY(face), pz * FaceNorthZ(face))))
  }

  // -------------------------------------------------------------------
  // Mutable IJK scratch (JIT-scalarizable; never escapes the kernel).

  final class IJK(var i: Int, var j: Int, var k: Int) {
    @inline def set(ni: Int, nj: Int, nk: Int): Unit = { i = ni; j = nj; k = nk }
    @inline def copyFrom(o: IJK): Unit = { i = o.i; j = o.j; k = o.k }

    @inline def normalize(): Unit = {
      val m = Math.min(i, Math.min(j, k))
      i -= m; j -= m; k -= m
    }

    /** IJK of the aperture-7 parent (ccw for Class III, cw for Class II). */
    def upAp7(ccw: Boolean): Unit = {
      val di = i - k
      val dj = j - k
      if (ccw) {
        val ni = Math.round((3 * di - dj) / 7.0).toInt
        val nj = Math.round((di + 2 * dj) / 7.0).toInt
        set(ni, nj, 0)
      } else {
        val ni = Math.round((2 * di + dj) / 7.0).toInt
        val nj = Math.round((3 * dj - di) / 7.0).toInt
        set(ni, nj, 0)
      }
      normalize()
    }

    /** IJK of the center child in the aperture-7 grid one level finer. */
    def downAp7(ccw: Boolean): Unit = {
      var ni = 0; var nj = 0; var nk = 0
      if (ccw) {
        ni = 3 * i + 1 * j + 0 * k
        nj = 0 * i + 3 * j + 1 * k
        nk = 1 * i + 0 * j + 3 * k
      } else {
        ni = 3 * i + 0 * j + 1 * k
        nj = 1 * i + 3 * j + 0 * k
        nk = 0 * i + 1 * j + 3 * k
      }
      set(ni, nj, nk)
      normalize()
    }

    /** IJK of the center child in the aperture-3 grid one level finer. */
    def downAp3(ccw: Boolean): Unit = {
      var ni = 0; var nj = 0; var nk = 0
      if (ccw) {
        ni = 2 * i + 1 * j + 0 * k
        nj = 0 * i + 2 * j + 1 * k
        nk = 1 * i + 0 * j + 2 * k
      } else {
        ni = 2 * i + 0 * j + 1 * k
        nj = 1 * i + 2 * j + 0 * k
        nk = 0 * i + 1 * j + 2 * k
      }
      set(ni, nj, nk)
      normalize()
    }

    @inline def moveNeighbor(dir: Int): Unit = {
      i += (dir >> 2) & 1
      j += (dir >> 1) & 1
      k += dir & 1
      normalize()
    }

    def rotate60(ccw: Boolean): Unit = {
      var ni = 0; var nj = 0; var nk = 0
      if (ccw) {
        ni = 1 * i + 0 * j + 1 * k
        nj = 1 * i + 1 * j + 0 * k
        nk = 0 * i + 1 * j + 1 * k
      } else {
        ni = 1 * i + 1 * j + 0 * k
        nj = 0 * i + 1 * j + 1 * k
        nk = 1 * i + 0 * j + 1 * k
      }
      set(ni, nj, nk)
      normalize()
    }

    /** Unit-vector direction digit of this (normalized) coordinate. */
    @inline def toDirection: Int = (i << 2) | (j << 1) | k
  }

  // -------------------------------------------------------------------
  // Point -> cell.

  /** lat/lng in radians to the containing cell at `res`. */
  def latLngToCell(lat: Double, lng: Double, res: Int): Long = {
    // n-vector.
    val cosLat = Math.cos(lat)
    val x = Math.cos(lng) * cosLat
    val y = Math.sin(lng) * cosLat
    val z = Math.sin(lat)

    // Closest icosahedron face by squared chord distance.
    var face = 0
    var sqd = 5.0
    var f = 0
    while (f < 20) {
      val dx = x - FaceCenterX(f)
      val dy = y - FaceCenterY(f)
      val dz = z - FaceCenterZ(f)
      val d = Math.fma(dx, dx, Math.fma(dy, dy, dz * dz))
      if (d < sqd) { face = f; sqd = d }
      f += 1
    }

    // Gnomonic projection onto face-local 2D hex coordinates.
    // tan(acos(1 - sqd/2)) computed directly from the chord:
    // 1-x^2 = (sqd/2)(2 - sqd/2) with x = 1 - sqd/2.
    var vx = 0.0
    var vy = 0.0
    // r = acos(1 - sqd/2) ~ sqrt(sqd) near zero, so r < Epsilon <=> sqd < Epsilon^2.
    if (sqd >= Epsilon * Epsilon) {
      val half = sqd * 0.5
      val tanR = Math.sqrt(half * (2.0 - half)) / (1.0 - half)
      val rScaled = tanR * InvRes0UGnomonic * Sqrt7Powers(res)
      // theta = A(face,class) - az(face->p); instead of atan2 + cos + sin
      // (three libm calls per row on the engine's hottest path), expand
      // cos/sin(theta) by the angle-difference identities over the
      // point's own tangent components s = p.east, c = p.north (the
      // projection onto the tangent plane drops out of both dot products
      // because the basis is orthogonal to the face normal):
      //   cos(theta) = (cosA * c + sinA * s) / h,  h = hypot(c, s)
      //   sin(theta) = (sinA * c - cosA * s) / h
      // h > 0 whenever sqd is over the epsilon gate (the tangent
      // component vanishes only at the face center itself).
      val s = Math.fma(x, FaceEastX(face), Math.fma(y, FaceEastY(face), z * FaceEastZ(face)))
      val c = Math.fma(x, FaceNorthX(face), Math.fma(y, FaceNorthY(face), z * FaceNorthZ(face)))
      val invH = 1.0 / Math.sqrt(Math.fma(s, s, c * c))
      val class3 = isClass3(res)
      val cosA = if (class3) FaceAxCos3(face) else FaceAxCos2(face)
      val sinA = if (class3) FaceAxSin3(face) else FaceAxSin2(face)
      val rh = rScaled * invH
      vx = rh * Math.fma(cosA, c, sinA * s)
      vy = rh * Math.fma(sinA, c, -(cosA * s))
    }

    // Quantize 2D -> IJK (DGGRID rounding).
    val ijk = new IJK(0, 0, 0)
    hex2dToCoordIJK(vx, vy, ijk)

    // FaceIJK -> cell index.
    faceIjkToCell(face, ijk, res)
  }

  /** Azimuth in radians from vector a to vector b on the unit sphere. */
  def azimuth(ax: Double, ay: Double, az: Double,
              bx: Double, by: Double, bz: Double): Double = {
    // North/east tangent basis at a (north pole reference).
    var nx = -az * ax
    var ny = -az * ay
    var nz = Math.fma(-az, az, 1.0)
    var norm = Math.sqrt(Math.fma(nx, nx, Math.fma(ny, ny, nz * nz)))
    if (norm > 0) { val s = 1.0 / norm; nx *= s; ny *= s; nz *= s }
    else { nx = 0; ny = 0; nz = 0 }
    val ex = Math.fma(ny, az, -(nz * ay))
    val ey = Math.fma(nz, ax, -(nx * az))
    val ez = Math.fma(nx, ay, -(ny * ax))
    // Project b onto the tangent plane at a.
    val dot = Math.fma(bx, ax, Math.fma(by, ay, bz * az))
    var px = Math.fma(1.0, bx, -dot * ax)
    var py = Math.fma(1.0, by, -dot * ay)
    var pz = Math.fma(1.0, bz, -dot * az)
    norm = Math.sqrt(Math.fma(px, px, Math.fma(py, py, pz * pz)))
    if (norm > 0) { val s = 1.0 / norm; px *= s; py *= s; pz *= s }
    else { px = 0; py = 0; pz = 0 }
    Math.atan2(
      Math.fma(px, ex, Math.fma(py, ey, pz * ez)),
      Math.fma(px, nx, Math.fma(py, ny, pz * nz)))
  }

  /** 2D cartesian -> nearest hex center in IJK coordinates (DGGRID). */
  def hex2dToCoordIJK(x: Double, y: Double, out: IJK): Unit = {
    val a1 = Math.abs(x)
    val a2 = Math.abs(y)

    val x2 = a2 * RSin60
    val x1 = a1 + x2 / 2.0

    val m1 = x1.toInt
    val m2 = x2.toInt

    val r1 = x1 - m1
    val r2 = x2 - m2

    var i = 0
    var j = 0
    if (r1 < 0.5) {
      if (r1 < 1.0 / 3.0) {
        i = m1
        j = m2 + (if (r2 >= (1.0 + r1) / 2.0) 1 else 0)
      } else {
        i = m1 + (if ((1.0 - r1) <= r2 && r2 < (2.0 * r1)) 1 else 0)
        j = m2 + (if (r2 >= (1.0 - r1)) 1 else 0)
      }
    } else if (r1 < 2.0 / 3.0) {
      j = m2 + (if (r2 >= (1.0 - r1)) 1 else 0)
      i = m1 + (if (Math.fma(2.0, r1, -1.0) >= r2 || r2 >= (1.0 - r1)) 1 else 0)
    } else {
      i = m1 + 1
      j = m2 + (if (r2 >= (r1 / 2.0)) 1 else 0)
    }

    // Fold across the axes if necessary.
    if (x < 0.0) {
      val offset = j % 2
      val axisI = (j + offset) / 2
      val diff = i - axisI
      i -= 2 * diff + offset
    }
    if (y < 0.0) {
      i -= (2 * j + 1) / 2
      j = -j
    }

    out.set(i, j, 0)
    out.normalize()
  }

  /** FaceIJK address -> cell index at `res`. */
  def faceIjkToCell(face: Int, ijk: IJK, res: Int): Long = {
    var bits = setResolution(DefaultCellIndex, res)

    if (res == 0) {
      // ijk components must be within [0,2] for base cell lookup.
      if (ijk.i > 2 || ijk.j > 2 || ijk.k > 2) return 0L
      val packed = FaceIjkBaseCells(face)(ijk.i * 9 + ijk.j * 3 + ijk.k)
      return setBaseCell(bits, packed >> 3)
    }

    // Build the index digits finest resolution up. All-local arithmetic
    // (no scratch objects) — this is the hottest loop of the engine.
    var i = ijk.i; var j = ijk.j; var k = ijk.k
    var r = res
    while (r >= 1) {
      val li = i; val lj = j; val lk = k
      val di = i - k
      val dj = j - k
      var ci = 0; var cj = 0; var ck = 0
      // round(a / 7.0) over integers == floorDiv(2a + 7, 14) exactly
      // (a/7 can never land on a .5 boundary, and the double division's
      // error is far below the 1/14 distance to one) — keeps the hottest
      // loop in pure integer arithmetic.
      if (isClass3(r)) {
        // upAp7 ccw.
        i = Math.floorDiv(2 * (3 * di - dj) + 7, 14)
        j = Math.floorDiv(2 * (di + 2 * dj) + 7, 14)
        k = 0
        var m = Math.min(i, Math.min(j, k))
        i -= m; j -= m; k -= m
        // downAp7 ccw of the parent = center of last level.
        ci = 3 * i + j
        cj = 3 * j + k
        ck = i + 3 * k
        m = Math.min(ci, Math.min(cj, ck))
        ci -= m; cj -= m; ck -= m
      } else {
        // upAp7 cw.
        i = Math.floorDiv(2 * (2 * di + dj) + 7, 14)
        j = Math.floorDiv(2 * (3 * dj - di) + 7, 14)
        k = 0
        var m = Math.min(i, Math.min(j, k))
        i -= m; j -= m; k -= m
        // downAp7 cw.
        ci = 3 * i + k
        cj = i + 3 * j
        ck = j + 3 * k
        m = Math.min(ci, Math.min(cj, ck))
        ci -= m; cj -= m; ck -= m
      }
      var xi = li - ci; var xj = lj - cj; var xk = lk - ck
      val m2 = Math.min(xi, Math.min(xj, xk))
      xi -= m2; xj -= m2; xk -= m2
      bits = setDirection(bits, r, (xi << 2) | (xj << 1) | xk)
      r -= 1
    }
    ijk.set(i, j, k)

    if (i > 2 || j > 2 || k > 2) return 0L
    val packed = FaceIjkBaseCells(face)(i * 9 + j * 3 + k)
    val baseCell = packed >> 3
    val rotations = packed & 7
    bits = setBaseCell(bits, baseCell)

    if (Tables.isPentagonBase(baseCell)) {
      if (firstAxe(bits) == K) {
        // Force rotation out of the missing k-axes subsequence.
        if (isCwOffset(baseCell, face)) bits = rotate60(bits, 1, ccw = false)
        else bits = rotate60(bits, 1, ccw = true)
      }
      var c = 0
      while (c < rotations) { bits = pentagonRotate60(bits, ccw = true); c += 1 }
    } else {
      bits = rotate60(bits, rotations, ccw = true)
    }
    bits
  }

  @inline def isCwOffset(baseCell: Int, face: Int): Boolean = {
    val md = BaseCellData(baseCell)
    md(4) == face || md(5) == face
  }

  // -------------------------------------------------------------------
  // Cell -> FaceIJK (with overage adjustment).

  /** Result face of the last [[cellToFaceIjk]] call is returned via the
    * 2-element out array: out(0)=face. Coordinates land in `ijk`. */
  def cellToFaceIjk(cell: Long, ijk: IJK): Int = {
    var bits = cell
    val baseCell = getBaseCell(cell)
    val res = getResolution(cell)

    // Adjust for the pentagonal missing sequence.
    if (Tables.isPentagonBase(baseCell) && firstAxe(bits) == IK)
      bits = rotate60(bits, 1, ccw = false)

    var face = baseFaceIjk(baseCell, ijk)
    var r = 1
    while (r <= res) {
      ijk.downAp7(isClass3(r))
      ijk.moveNeighbor(getDirection(bits, r))
      r += 1
    }
    val possibleOverage = Tables.isPentagonBase(baseCell) ||
      res != 0 || ijk.i != 0 || ijk.j != 0 || ijk.k != 0
    if (!possibleOverage) return face

    val origI = ijk.i; val origJ = ijk.j; val origK = ijk.k

    // If Class III, drop into the next finer Class II grid.
    var class2Res = res
    if (isClass3(res)) {
      ijk.downAp7(false)
      class2Res = res + 1
    }

    val isPent4 = Tables.isPentagonBase(baseCell) && firstAxe(bits) == I

    val ov = adjustOverageClass2(ijk, face, class2Res, isPent4, substrate = false)
    if (ov >= 0) {
      face = ov
      if (Tables.isPentagonBase(baseCell)) {
        var again = adjustOverageClass2(ijk, face, class2Res, false, substrate = false)
        while (again >= 0) {
          face = again
          again = adjustOverageClass2(ijk, face, class2Res, false, substrate = false)
        }
      }
      if (class2Res != res) ijk.upAp7(false)
    } else if (class2Res != res) {
      ijk.set(origI, origJ, origK)
    }
    face
  }

  /** Home face + coords of a base cell, written into `ijk`; returns face. */
  @inline def baseFaceIjk(baseCell: Int, ijk: IJK): Int = {
    val md = BaseCellData(baseCell)
    ijk.set(md(1), md(2), md(3))
    md(0)
  }

  /** Adjusts coordinates across an icosahedron edge when they overflow the
    * face. Returns the new face, or -1 when no overage, or -2 when on a
    * substrate face edge. `class2Res` in 0..16 (even = Class II).
    */
  def adjustOverageClass2(ijk: IJK, face: Int, class2Res: Int,
                          isPent4: Boolean, substrate: Boolean): Int = {
    val factor = if (substrate) 3 else 1
    val dimension = ijk.i + ijk.j + ijk.k
    val maxDim = MaxDimByCIIRes(class2Res) * factor

    if (substrate && dimension == maxDim) return -2
    if (dimension <= maxDim) return -1

    var quadrant = 0
    if (ijk.k > 0) {
      if (ijk.j > 0) quadrant = 3 // JK
      else {
        // Adjust for the pentagonal missing sequence.
        if (isPent4) {
          // Rotate about the pentagon center to skip the missing sequence.
          val oi = ijk.i - maxDim
          val oj = ijk.j
          val ok = ijk.k
          // rotate60 cw of (oi,oj,ok)
          val ni = 1 * oi + 1 * oj + 0 * ok
          val nj = 0 * oi + 1 * oj + 1 * ok
          val nk = 1 * oi + 0 * oj + 1 * ok
          ijk.set(ni + maxDim, nj, nk)
        }
        quadrant = 2 // KI
      }
    } else quadrant = 1 // IJ

    val newFace = FaceNeighborFace(face)(quadrant)
    val geom = FaceNeighborGeom(face)(quadrant)
    val ccwRot60 = geom(3)

    var c = 0
    while (c < ccwRot60) { ijk.rotate60(ccw = true); c += 1 }

    val unitScale = UnitScaleByCIIRes(class2Res) * factor
    ijk.i += geom(0) * unitScale
    ijk.j += geom(1) * unitScale
    ijk.k += geom(2) * unitScale
    ijk.normalize()

    if (substrate && (ijk.i + ijk.j + ijk.k) == maxDim) return -2
    newFace
  }

  // -------------------------------------------------------------------
  // Cell -> lat/lng center.

  /** Cell center as [latRad, lngRad]. */
  def cellCenter(cell: Long): Array[Double] = {
    val ijk = new IJK(0, 0, 0)
    val face = cellToFaceIjk(cell, ijk)
    val res = getResolution(cell)
    val out = new Array[Double](2)
    faceIjkToLatLng(face, ijk, res, substrate = false, out)
    out
  }

  /** FaceIJK center -> lat/lng radians into out[0], out[1].
    * `res` is an extended resolution (0..16) when substrate. */
  def faceIjkToLatLng(face: Int, ijk: IJK, res: Int, substrate: Boolean,
                      out: Array[Double]): Unit = {
    // IJK -> 2D hex coordinates.
    val di = (ijk.i - ijk.k).toDouble
    val dj = (ijk.j - ijk.k).toDouble
    val vx = Math.fma(0.5, -dj, di)
    val vy = dj * Sqrt32
    vec2dToLatLng(vx, vy, face, res, substrate, out)
  }

  /** Face-local 2D -> lat/lng radians (inverse gnomonic). */
  def vec2dToLatLng(vx: Double, vy: Double, face: Int, res: Int,
                    substrate: Boolean, out: Array[Double]): Unit = {
    val r = Math.sqrt(Math.fma(vx, vx, vy * vy))
    if (r < Epsilon) {
      out(0) = Math.asin(FaceCenterZ(face))
      out(1) = Math.atan2(FaceCenterY(face), FaceCenterX(face))
      return
    }

    var scale = InvSqrt7Powers(res)
    if (substrate) scale /= 3.0

    val q = r * scale * Res0UGnomonic
    if (q < Epsilon) {
      out(0) = Math.asin(FaceCenterZ(face))
      out(1) = Math.atan2(FaceCenterY(face), FaceCenterX(face))
      return
    }
    val invHyp = 1.0 / Math.sqrt(Math.fma(q, q, 1.0))
    val cosR = invHyp
    val sinR = q * invHyp

    var theta = Math.atan2(vy, vx)
    if (!substrate && isClass3(res))
      theta = toPositiveAngle(theta + Ap7RotRads)
    theta = toPositiveAngle(FaceAxesAzRadsCII(face) - theta)

    val cx = FaceCenterX(face)
    val cy = FaceCenterY(face)
    val cz = FaceCenterZ(face)

    // Tangent basis at the face center.
    var nx = -cz * cx
    var ny = -cz * cy
    var nz = Math.fma(-cz, cz, 1.0)
    var norm = Math.sqrt(Math.fma(nx, nx, Math.fma(ny, ny, nz * nz)))
    if (norm > 0) { val s = 1.0 / norm; nx *= s; ny *= s; nz *= s }
    val ex = Math.fma(ny, cz, -(nz * cy))
    val ey = Math.fma(nz, cx, -(nx * cz))
    val ez = Math.fma(nx, cy, -(ny * cx))

    val sinT = Math.sin(theta)
    val cosT = Math.cos(theta)
    // dir = cosT*north + sinT*east; p = cosR*center + sinR*dir.
    val dx = Math.fma(cosT, nx, sinT * ex)
    val dy = Math.fma(cosT, ny, sinT * ey)
    val dz = Math.fma(cosT, nz, sinT * ez)
    var px = Math.fma(cosR, cx, sinR * dx)
    var py = Math.fma(cosR, cy, sinR * dy)
    var pz = Math.fma(cosR, cz, sinR * dz)
    norm = Math.sqrt(Math.fma(px, px, Math.fma(py, py, pz * pz)))
    if (norm > 0) { val s = 1.0 / norm; px *= s; py *= s; pz *= s }
    else { px = 0; py = 0; pz = 0 }

    out(0) = Math.asin(pz)
    out(1) = Math.atan2(py, px)
  }

  // -------------------------------------------------------------------
  // Cell boundary.

  /** Vertices of an origin-centered cell in a Class II substrate grid
    * (aperture sequence 33r), CCW from the i-axis. */
  private val VertsCII: Array[Int] = Array(2,1,0, 1,2,0, 0,2,1, 0,1,2, 1,0,2, 2,0,1)

  /** Same for Class III (aperture sequence 33r7r). */
  private val VertsCIII: Array[Int] = Array(5,4,0, 1,5,0, 0,5,4, 0,1,5, 4,0,5, 5,0,1)

  /** Cell boundary as [lat0,lng0,lat1,lng1,...] radians (<= 10 vertices). */
  def cellBoundary(cell: Long): Array[Double] = cellBoundary(cell, 0, -1)

  /** Boundary starting at topological vertex `start`, `length` vertexes
    * (-1 = full loop). Used for edge boundaries (length 2) and single
    * vertexes (length 1). */
  def cellBoundary(cell: Long, start: Int, length: Int): Array[Double] = {
    val ijk = new IJK(0, 0, 0)
    val face = cellToFaceIjk(cell, ijk)
    val res = getResolution(cell)
    if (H3.isPentagon(cell))
      pentagonBoundary(face, ijk, res, start, if (length < 0) 5 else length)
    else hexagonBoundary(face, ijk, res, start, if (length < 0) 6 else length)
  }

  /** Computes substrate vertices for the cell; returns adjusted resolution.
    * `vertFaces`/`vertI/J/K` must have length >= nVerts. */
  private[h3] def cellVertices(center: IJK, face: Int, res: Int, nVerts: Int,
                           vertFace: Array[Int], vi: Array[Int],
                           vj: Array[Int], vk: Array[Int]): Int = {
    // Adjust center to an aperture 33r substrate grid.
    center.downAp3(true)
    center.downAp3(false)
    var adjRes = res
    val verts = if (isClass3(res)) {
      center.downAp7(false)
      adjRes = res + 1
      VertsCIII
    } else VertsCII

    var v = 0
    while (v < nVerts) {
      vertFace(v) = face
      var i = center.i + verts(3 * v)
      var j = center.j + verts(3 * v + 1)
      var k = center.k + verts(3 * v + 2)
      val m = Math.min(i, Math.min(j, k))
      i -= m; j -= m; k -= m
      vi(v) = i; vj(v) = j; vk(v) = k
      v += 1
    }
    adjRes
  }

  def hexagonBoundary(faceIn: Int, center: IJK, res: Int,
                      start: Int = 0, length: Int = 6): Array[Double] = {
    val vertFace = new Array[Int](6)
    val vi = new Array[Int](6)
    val vj = new Array[Int](6)
    val vk = new Array[Int](6)
    val centerFace = faceIn
    val adjRes = cellVertices(center, faceIn, res, 6, vertFace, vi, vj, vk)

    val buf = new Array[Double](2 * 10)
    var n = 0
    val out = new Array[Double](2)
    val scratch = new IJK(0, 0, 0)

    // One extra iteration for the full loop (last-edge distortion vertex).
    val stop = start + length + (if (length == 6) 1 else 0)
    var lastFace = -1
    var lastOverage = -1 // -1 none, -2 face edge, >=0 new face
    var vert = start
    while (vert < stop) {
      val v = vert % 6
      scratch.set(vi(v), vj(v), vk(v))
      var fface = vertFace(v)
      // Hexagon vertices adjust at most once (reference semantics).
      val overage = adjustOverageClass2(scratch, fface, adjRes, false, substrate = true)
      if (overage >= 0) fface = overage
      val finalFace = fface

      if (isClass3(res) && vert > start && finalFace != lastFace && lastOverage != -2) {
        // The cell edge crosses an icosahedron edge: add the intersection
        // vertex, projected through the *center* face.
        val lastV = (v + 5) % 6
        val o0x = {
          val di = (vi(lastV) - vk(lastV)).toDouble
          val dj = (vj(lastV) - vk(lastV)).toDouble
          Math.fma(0.5, -dj, di)
        }
        val o0y = (vj(lastV) - vk(lastV)).toDouble * Sqrt32
        val o1x = {
          val di = (vi(v) - vk(v)).toDouble
          val dj = (vj(v) - vk(v)).toDouble
          Math.fma(0.5, -dj, di)
        }
        val o1y = (vj(v) - vk(v)).toDouble * Sqrt32

        val maxDim = MaxDimByCIIRes(adjRes).toDouble
        val v0x = 3.0 * maxDim; val v0y = 0.0
        val v1x = -1.5 * maxDim; val v1y = 3.0 * Sqrt32 * maxDim
        val v2x = -1.5 * maxDim; val v2y = -3.0 * Sqrt32 * maxDim

        val face2 = if (lastFace == centerFace) finalFace else lastFace
        var e0x = 0.0; var e0y = 0.0; var e1x = 0.0; var e1y = 0.0
        AdjacentFaceDir(centerFace)(face2) match {
          case 1 => e0x = v0x; e0y = v0y; e1x = v1x; e1y = v1y // IJ
          case 3 => e0x = v1x; e0y = v1y; e1x = v2x; e1y = v2y // JK
          case 2 => e0x = v2x; e0y = v2y; e1x = v0x; e1y = v0y // KI
          case _ => // not adjacent: no intersection vertex
        }

        val s1x = o1x - o0x; val s1y = o1y - o0y
        val s2x = e1x - e0x; val s2y = e1y - e0y
        val t = Math.fma(s2x, o0y - e0y, -s2y * (o0x - e0x)) /
          Math.fma(-s2x, s1y, s1x * s2y)
        val ix = Math.fma(t, s1x, o0x)
        val iy = Math.fma(t, s1y, o0y)

        val eps = 1.1920928955078125e-7 // f32::EPSILON as in the reference
        val atV0 = Math.abs(ix - o0x) <= eps && Math.abs(iy - o0y) <= eps
        val atV1 = Math.abs(ix - o1x) <= eps && Math.abs(iy - o1y) <= eps
        if (!atV0 && !atV1) {
          vec2dToLatLng(ix, iy, centerFace, adjRes, substrate = true, out)
          buf(2 * n) = out(0); buf(2 * n + 1) = out(1); n += 1
        }
      }

      if (vert < start + length) {
        val di = (scratch.i - scratch.k).toDouble
        val dj = (scratch.j - scratch.k).toDouble
        vec2dToLatLng(Math.fma(0.5, -dj, di), dj * Sqrt32, finalFace, adjRes,
          substrate = true, out)
        buf(2 * n) = out(0); buf(2 * n + 1) = out(1); n += 1
      }

      lastFace = finalFace
      lastOverage = overage
      vert += 1
    }
    java.util.Arrays.copyOf(buf, 2 * n)
  }

  def pentagonBoundary(faceIn: Int, center: IJK, res: Int,
                       start: Int = 0, length: Int = 5): Array[Double] = {
    val vertFace = new Array[Int](5)
    val vi = new Array[Int](5)
    val vj = new Array[Int](5)
    val vk = new Array[Int](5)
    val adjRes = cellVertices(center, faceIn, res, 5, vertFace, vi, vj, vk)

    val buf = new Array[Double](2 * 10)
    var n = 0
    val out = new Array[Double](2)
    val scratch = new IJK(0, 0, 0)

    val stop = start + length + (if (length == 5) 1 else 0)
    var lastFace = -1
    var lastI = 0; var lastJ = 0; var lastK = 0
    var vert = start
    while (vert < stop) {
      val v = vert % 5
      scratch.set(vi(v), vj(v), vk(v))
      var fface = vertFace(v)
      // Pentagon vertex overage: loop until stable.
      var ov = adjustOverageClass2(scratch, fface, adjRes, false, substrate = true)
      while (ov >= 0) {
        fface = ov
        ov = adjustOverageClass2(scratch, fface, adjRes, false, substrate = true)
      }

      if (isClass3(res) && vert > start) {
        // All Class III pentagon edges cross icosahedron edges.
        val o0x = {
          val di = (lastI - lastK).toDouble
          val dj = (lastJ - lastK).toDouble
          Math.fma(0.5, -dj, di)
        }
        val o0y = (lastJ - lastK).toDouble * Sqrt32

        // Translate the current vertex into the last face's system.
        val dirToLast = AdjacentFaceDir(fface)(lastFace)
        val nf = FaceNeighborFace(fface)(dirToLast)
        val geom = FaceNeighborGeom(fface)(dirToLast)
        val t = new IJK(scratch.i, scratch.j, scratch.k)
        var c = 0
        while (c < geom(3)) { t.rotate60(ccw = true); c += 1 }
        val unitScale = UnitScaleByCIIRes(adjRes) * 3
        t.i += geom(0) * unitScale
        t.j += geom(1) * unitScale
        t.k += geom(2) * unitScale
        t.normalize()
        val o1x = {
          val di = (t.i - t.k).toDouble
          val dj = (t.j - t.k).toDouble
          Math.fma(0.5, -dj, di)
        }
        val o1y = (t.j - t.k).toDouble * Sqrt32

        val maxDim = MaxDimByCIIRes(adjRes).toDouble
        val v0x = 3.0 * maxDim; val v0y = 0.0
        val v1x = -1.5 * maxDim; val v1y = 3.0 * Sqrt32 * maxDim
        val v2x = -1.5 * maxDim; val v2y = -3.0 * Sqrt32 * maxDim

        var e0x = 0.0; var e0y = 0.0; var e1x = 0.0; var e1y = 0.0
        AdjacentFaceDir(nf)(fface) match {
          case 1 => e0x = v0x; e0y = v0y; e1x = v1x; e1y = v1y
          case 3 => e0x = v1x; e0y = v1y; e1x = v2x; e1y = v2y
          case 2 => e0x = v2x; e0y = v2y; e1x = v0x; e1y = v0y
          case _ =>
        }
        val s1x = o1x - o0x; val s1y = o1y - o0y
        val s2x = e1x - e0x; val s2y = e1y - e0y
        val tt = Math.fma(s2x, o0y - e0y, -s2y * (o0x - e0x)) /
          Math.fma(-s2x, s1y, s1x * s2y)
        val ix = Math.fma(tt, s1x, o0x)
        val iy = Math.fma(tt, s1y, o0y)
        vec2dToLatLng(ix, iy, nf, adjRes, substrate = true, out)
        buf(2 * n) = out(0); buf(2 * n + 1) = out(1); n += 1
      }

      if (vert < start + length) {
        val di = (scratch.i - scratch.k).toDouble
        val dj = (scratch.j - scratch.k).toDouble
        vec2dToLatLng(Math.fma(0.5, -dj, di), dj * Sqrt32, fface, adjRes,
          substrate = true, out)
        buf(2 * n) = out(0); buf(2 * n + 1) = out(1); n += 1
      }

      lastFace = fface
      lastI = scratch.i; lastJ = scratch.j; lastK = scratch.k
      vert += 1
    }
    java.util.Arrays.copyOf(buf, 2 * n)
  }

  // -------------------------------------------------------------------
  // Cell area (Cagnoli spherical ring area with Kahan summation).

  def cellAreaRads2(cell: Long): Double = {
    val b = cellBoundary(cell) // radians
    val n = b.length / 2
    if (n == 0) return 0.0

    var sum = 0.0
    var corr = 0.0
    @inline def add(value: Double): Unit = {
      val y = value - corr
      val t = sum + y
      corr = (t - sum) - y
      sum = t
    }
    @inline def cagnoli(sinA: Double, cosA: Double, sinB: Double, cosB: Double,
                        delta: Double): Double = {
      val sa = sinA * sinB
      val ca = cosA * cosB
      val sinD = Math.sin(delta)
      val cosD = Math.cos(delta)
      -2.0 * Math.atan2(sa * sinD, Math.fma(sa, cosD, ca))
    }

    val fstLat = Math.fma(b(0), 0.5, Math.PI * 0.25)
    val sinFst = Math.sin(fstLat)
    val cosFst = Math.cos(fstLat)
    var sinA = sinFst
    var cosA = cosFst
    var ax = b(1)
    var i = 1
    while (i < n) {
      val lat = Math.fma(b(2 * i), 0.5, Math.PI * 0.25)
      val sinB = Math.sin(lat)
      val cosB = Math.cos(lat)
      add(cagnoli(sinA, cosA, sinB, cosB, b(2 * i + 1) - ax))
      sinA = sinB; cosA = cosB; ax = b(2 * i + 1)
      i += 1
    }
    add(cagnoli(sinA, cosA, sinFst, cosFst, b(1) - ax))
    var total = sum + corr
    if (total < 0) total += 4.0 * Math.PI
    total
  }
}
