package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.h3.{Edges, H3}

/** Directed edge + vertex semantics (reference: index/{edge,vertex}.rs). */
class EdgeVertexSpec extends AnyFunSuite {

  test("reference doctest: edge 0x13a194e699ab7fff") {
    val e = 0x13a194e699ab7fffL
    assert(Edges.isValidDirectedEdge(e))
    assert(Edges.getEdgeNum(e) == 3)
    assert(Edges.edgeOrigin(e) == 0x8a194e699ab7fffL)
    assert(Edges.edgeDestination(e) == 0x8a194e699a97fffL)
    assert(math.abs(Edges.edgeLengthRads(e) - 1.1795418098325597e-5) < 1e-11)
    assert(math.abs(Edges.edgeLengthKm(e) - 0.07514869340636812) < 1e-8)
  }

  test("reference doctest: vertex 0x2222597fffffffff") {
    val v = 0x2222597fffffffffL
    assert(Edges.isValidVertex(v))
    assert(Edges.getVertexNum(v) == 2)
    assert(Edges.vertexOwner(v) == 0x822597fffffffffL)
  }

  private def randomCells(n: Int): Seq[Long] = {
    val r = new scala.util.Random(7)
    (0 until n).map { _ =>
      H3.latLngToCell(r.nextDouble() * 170 - 85, r.nextDouble() * 360 - 180,
        1 + r.nextInt(12))
    }
  }

  test("edges: origin/destination/reverse round-trips") {
    randomCells(500).foreach { cell =>
      val edges = Edges.originToDirectedEdges(cell)
      assert(edges.length == (if (H3.isPentagon(cell)) 5 else 6))
      edges.foreach { e =>
        assert(Edges.isValidDirectedEdge(e), s"edge ${e.toHexString}")
        assert(Edges.edgeOrigin(e) == cell)
        val dest = Edges.edgeDestination(e)
        assert(dest != 0L)
        assert(H3.areNeighborCells(cell, dest))
        assert(Edges.cellsToDirectedEdge(cell, dest) == e)
        val rev = Edges.edgeReverse(e)
        assert(Edges.edgeOrigin(rev) == dest)
        assert(Edges.edgeDestination(rev) == cell)
      }
      // Destinations are exactly the ring-1 neighbors.
      val dests = edges.map(Edges.edgeDestination).toSet
      assert(dests == H3.gridRing(cell, 1).toSet)
    }
  }

  test("edge boundary has 2-3 vertexes drawn from the cell boundary") {
    randomCells(300).foreach { cell =>
      val cellB = H3.cellToBoundary(cell)
      val bset = (0 until cellB.length / 2)
        .map(i => (cellB(2 * i), cellB(2 * i + 1))).toSet
      Edges.originToDirectedEdges(cell).foreach { e =>
        val b = Edges.directedEdgeToBoundary(e)
        val nv = b.length / 2
        assert(nv >= 2 && nv <= 3, s"edge ${e.toHexString} verts $nv")
        (0 until nv).foreach { i =>
          assert(bset.contains((b(2 * i), b(2 * i + 1))),
            s"edge vertex not on cell boundary")
        }
        assert(Edges.edgeLengthM(e) > 0)
      }
    }
  }

  test("vertexes: canonical across the cells that share them") {
    randomCells(300).foreach { cell =>
      val mine = Edges.cellToVertexes(cell).filter(_ != 0L).toSet
      assert(mine.size == (if (H3.isPentagon(cell)) 5 else 6))
      mine.foreach(v => assert(Edges.isValidVertex(v), v.toHexString))
      // Each neighbor shares exactly 2 vertexes (the common edge endpoints),
      // and those vertex indexes are identical (canonical owner).
      H3.gridRing(cell, 1).foreach { nb =>
        val theirs = Edges.cellToVertexes(nb).filter(_ != 0L).toSet
        val shared = mine.intersect(theirs)
        assert(shared.size == 2,
          s"cell ${cell.toHexString} nb ${nb.toHexString} shared ${shared.size}")
      }
    }
  }

  test("vertexToLatLng matches a boundary vertex of the owner") {
    randomCells(200).foreach { cell =>
      Edges.cellToVertexes(cell).filter(_ != 0L).foreach { v =>
        val ll = Edges.vertexToLatLng(v)
        val owner = Edges.vertexOwner(v)
        val b = H3.cellToBoundary(owner)
        val onBoundary = (0 until b.length / 2).exists { i =>
          math.abs(b(2 * i) - ll(0)) < 1e-9 && math.abs(b(2 * i + 1) - ll(1)) < 1e-9
        }
        assert(onBoundary, s"vertex ${v.toHexString}")
      }
    }
  }

  test("isValidIndex accepts all three modes, rejects garbage") {
    val cell = H3.latLngToCell(48.85, 2.35, 9)
    assert(Edges.isValidIndex(cell))
    assert(Edges.isValidIndex(Edges.originToDirectedEdges(cell)(0)))
    assert(Edges.isValidIndex(Edges.cellToVertex(cell, 0)))
    assert(!Edges.isValidIndex(0L))
    assert(!Edges.isValidIndex(-1L))
  }
}

/** Size-hint helpers (gridPathCellsSize, uncompactSize, pentagonCount). */
class SizeHintSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("SQL size hints match their expansions") {
    val spark = SparkTestBase.spark
    graft.spark.H3Functions.register(spark)
    val a = graft.h3.H3.latLngToCell(48.85, 2.35, 8)
    val b = graft.h3.H3.gridDisk(a, 3)(17)
    val row = spark.sql(s"""
      SELECT h3_grid_path_cells_size(${a}L, ${b}L) AS ps,
             h3_grid_distance(${a}L, ${b}L) + 1 AS want_ps,
             h3_uncompact_size(array(${graft.h3.H3.cellToParent(a, 5)}L), 8) AS us,
             h3_cell_to_children_size(${graft.h3.H3.cellToParent(a, 5)}L, 8) AS want_us,
             h3_pentagon_count(7) AS pc,
             size(h3_uncompact_cells(array(${graft.h3.H3.cellToParent(a, 5)}L), 8)) AS expand
    """).collect()(0)
    assert(row.getLong(0) == row.getLong(1))
    assert(row.getLong(2) == row.getLong(3) && row.getLong(2) == row.getInt(5).toLong)
    assert(row.getLong(4) == 12L)
    val units = spark.sql(s"""
      SELECT h3_great_circle_distance_m(48.85, 2.35, 40.71, -74.0) AS m,
             h3_great_circle_distance_km(48.85, 2.35, 40.71, -74.0) AS km,
             h3_great_circle_distance_rads(48.85, 2.35, 40.71, -74.0) AS rads,
             h3_get_hexagon_area_avg_rads2(5) AS ar,
             h3_get_hexagon_area_avg_km2(5) AS akm,
             h3_res0_cell_count(0) AS n0
    """).collect()(0)
    assert(math.abs(units.getDouble(0) - units.getDouble(1) * 1000.0) < 1e-6)
    assert(math.abs(units.getDouble(1) -
      units.getDouble(2) * graft.h3.H3.EarthRadiusKm) < 1e-9)
    assert(math.abs(units.getDouble(4) - units.getDouble(3)
      * graft.h3.H3.EarthRadiusKm * graft.h3.H3.EarthRadiusKm) < 1e-6)
    assert(units.getLong(5) == 122L)
    // Cross-pentagon path failure -> null size.
    val pent = graft.h3.H3.cellToCenterChild(
      graft.h3.H3.setBaseCell(graft.h3.H3.DefaultCellIndex, 4), 8)
    val far = graft.h3.H3.latLngToCell(-48.0, 122.0, 8)
    val r2 = spark.sql(s"SELECT h3_grid_path_cells_size(${pent}L, ${far}L) AS ps").collect()(0)
    assert(r2.isNullAt(0) || r2.getLong(0) > 0) // null allowed, never negative
  }
}
