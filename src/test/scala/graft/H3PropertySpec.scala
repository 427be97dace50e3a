package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.h3.H3

/** Deterministic randomized property tests (seeded; replaces the
  * reference's fuzz targets). */
class H3PropertySpec extends AnyFunSuite {

  private val N = 2000

  private def rng = new scala.util.Random(42)

  private def randomCells(r: scala.util.Random, n: Int,
                          minRes: Int = 0, maxRes: Int = 15): Seq[Long] =
    (0 until n).map { _ =>
      val lat = r.nextDouble() * 179.8 - 89.9
      val lng = r.nextDouble() * 360.0 - 180.0
      val res = minRes + r.nextInt(maxRes - minRes + 1)
      H3.latLngToCell(lat, lng, res)
    }

  test("cell -> center -> cell round-trips") {
    val r = rng
    randomCells(r, N).foreach { cell =>
      val c = H3.cellToLatLng(cell)
      assert(H3.latLngToCell(c(0), c(1), H3.getResolution(cell)) == cell)
    }
  }

  test("parent of children is identity; children distinct and valid") {
    val r = rng
    randomCells(r, 500, maxRes = 13).foreach { cell =>
      val res = H3.getResolution(cell)
      val kids = H3.cellToChildren(cell, res + 2)
      assert(kids.length == H3.cellToChildrenSize(cell, res + 2))
      assert(kids.distinct.length == kids.length)
      kids.foreach { k =>
        assert(H3.isValidCell(k))
        assert(H3.cellToParent(k, res) == cell)
      }
    }
  }

  test("childPos / childAt are inverse") {
    val r = rng
    randomCells(r, N, minRes = 2).foreach { cell =>
      val res = H3.getResolution(cell)
      val parentRes = res - 2
      val pos = H3.cellToChildPos(cell, parentRes)
      val parent = H3.cellToParent(cell, parentRes)
      assert(H3.childPosToCell(parent, pos, res) == cell,
        s"cell ${cell.toHexString}")
    }
  }

  test("compact(children) == parent; uncompact(compact) == children") {
    val r = rng
    randomCells(r, 300, maxRes = 12).foreach { cell =>
      val res = H3.getResolution(cell)
      val kids = H3.cellToChildren(cell, res + 2)
      val compacted = H3.compactSorted(kids.sortBy(H3.orderKey))
      assert(compacted.toSeq == Seq(cell), s"cell ${cell.toHexString}")
      assert(H3.uncompact(compacted, res + 2).sorted.toSeq == kids.sorted.toSeq)
    }
  }

  test("compact keeps partial sibling groups untouched") {
    val r = rng
    randomCells(r, 200, minRes = 1, maxRes = 12).foreach { cell =>
      val res = H3.getResolution(cell)
      val kids = H3.cellToChildren(cell, res + 1)
      val partial = kids.drop(1).sortBy(H3.orderKey) // remove one child
      val compacted = H3.compactSorted(partial)
      assert(compacted.sorted.toSeq == partial.sorted.toSeq)
    }
  }

  test("disk size is 3k(k+1)+1 away from pentagons; ring is the k-shell") {
    val r = rng
    randomCells(r, 800, minRes = 1).foreach { cell =>
      val k = 1 + r.nextInt(4)
      val disk = H3.gridDiskDistances(cell, k)
      val n = disk.length / 2
      val cells = (0 until n).map(i => disk(2 * i)).toSet
      assert(cells.size == n)
      val hasPentagon = (0 until n).exists(i => H3.isPentagon(disk(2 * i)))
      if (!hasPentagon) {
        assert(n == 3 * k * (k + 1) + 1, s"cell ${cell.toHexString} k=$k")
        val ring = H3.gridRing(cell, k).toSet
        assert(ring.size == 6 * k)
        assert(ring.subsetOf(cells))
        val shell = (0 until n).filter(i => disk(2 * i + 1) == k)
          .map(i => disk(2 * i)).toSet
        assert(ring == shell)
      }
    }
  }

  test("disk around a pentagon origin works via the safe path") {
    for (res <- 1 to 10) {
      val pent = H3.cellToCenterChild(H3.setBaseCell(H3.DefaultCellIndex, 4), res)
      assert(H3.isPentagon(pent))
      val disk = H3.gridDisk(pent, 2)
      // Pentagon disks have one fewer cell per ring: 1 + 5 + 10.
      assert(disk.length == 16, s"res $res disk ${disk.length}")
      assert(disk.distinct.length == disk.length)
    }
  }

  test("gridDistance agrees with disk ring distance") {
    val r = rng
    randomCells(r, 500, minRes = 1).foreach { cell =>
      val disk = H3.gridDiskDistances(cell, 3)
      (0 until disk.length / 2).foreach { i =>
        val d = H3.gridDistance(cell, disk(2 * i))
        if (d >= 0) assert(d == disk(2 * i + 1), s"cell ${cell.toHexString}")
      }
    }
  }

  test("grid path length is distance + 1 and steps are neighbors") {
    val r = rng
    (0 until 500).foreach { _ =>
      val lat = r.nextDouble() * 140 - 70
      val lng = r.nextDouble() * 360 - 180
      val res = 5 + r.nextInt(5)
      val a = H3.latLngToCell(lat, lng, res)
      val b = H3.latLngToCell(lat + 0.05, lng + 0.05, res)
      val d = H3.gridDistance(a, b)
      if (d >= 0) {
        val path = H3.gridPathCells(a, b)
        if (path.nonEmpty) {
          assert(path.length == d + 1)
          assert(path.head == a && path.last == b)
          path.sliding(2).foreach {
            case Array(x, y) => assert(x == y || H3.areNeighborCells(x, y))
            case _ =>
          }
        }
      }
    }
  }

  test("areNeighborCells matches ring-1 membership") {
    val r = rng
    randomCells(r, 300, minRes = 1).foreach { cell =>
      val ring = H3.gridRing(cell, 1).toSet
      ring.foreach(n => assert(H3.areNeighborCells(cell, n)))
      assert(!H3.areNeighborCells(cell, cell))
      val far = H3.gridRing(cell, 3)
      if (far.nonEmpty) assert(!H3.areNeighborCells(cell, far.head))
    }
  }

  test("string round-trip") {
    val r = rng
    randomCells(r, N).foreach { cell =>
      assert(H3.stringToCell(H3.cellToString(cell)) == cell)
    }
  }

  test("succ produces the next valid cell in prefix order") {
    val r = rng
    randomCells(r, N).foreach { cell =>
      val next = H3.succ(cell)
      if (next != 0L) {
        assert(H3.isValidCell(next))
        assert(java.lang.Long.compareUnsigned(H3.orderKey(next), H3.orderKey(cell)) > 0)
      }
    }
  }
}
