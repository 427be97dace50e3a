package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.h3.{Edges, H3}

/** Differential test: every scalar SQL function vs the kernel on the same
  * random cells (guards the expression/cast/null plumbing). */
class DifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("SQL functions agree with kernel calls on 2000 random cells") {
    import spark.implicits._
    val r = new scala.util.Random(123)
    val cells = (0 until 2000).map { _ =>
      H3.latLngToCell(r.nextDouble() * 170 - 85, r.nextDouble() * 360 - 180,
        1 + r.nextInt(14))
    }
    val df = cells.toDF("c")
    df.createOrReplaceTempView("cells")
    val rows = spark.sql("""
      SELECT c,
        h3_get_resolution(c) AS res,
        h3_get_base_cell(c) AS bc,
        h3_is_pentagon(c) AS pent,
        h3_is_valid_cell(c) AS valid,
        h3_cell_to_parent(c, 1) AS p1,
        h3_cell_to_center_child(c, 15) AS cc,
        h3_cell_to_children_size(c, h3_get_resolution(c)) AS nk,
        h3_cell_to_lat(c) AS lat,
        h3_cell_to_lng(c) AS lng,
        h3_cell_area_km2(c) AS area,
        h3_to_string(c) AS hex,
        h3_from_string(h3_to_string(c)) AS back,
        h3_max_face_count(c) AS mfc,
        h3_get_icosahedron_faces(c) AS faces,
        h3_cell_to_vertex(c, 0) AS v0
      FROM cells
    """).collect()
    rows.foreach { row =>
      val c = row.getLong(0)
      assert(row.getInt(1) == H3.getResolution(c))
      assert(row.getInt(2) == H3.getBaseCell(c))
      assert(row.getBoolean(3) == H3.isPentagon(c))
      assert(row.getBoolean(4) == H3.isValidCell(c))
      assert(row.getLong(5) == H3.cellToParent(c, 1))
      assert(row.getLong(6) == H3.cellToCenterChild(c, 15))
      assert(row.getLong(7) == 1L)
      assert(row.getDouble(8) == H3.cellToLat(c))
      assert(row.getDouble(9) == H3.cellToLng(c))
      assert(row.getDouble(10) == H3.cellAreaKm2(c))
      assert(row.getString(11) == H3.cellToString(c))
      assert(row.getLong(12) == c)
      assert(row.getInt(13) == Edges.maxFaceCount(c))
      val mask = Edges.icosahedronFaces(c)
      val faces = row.getSeq[Int](14).toSet
      assert(faces == (0 until 20).filter(f => (mask & (1 << f)) != 0).toSet)
      assert(row.getLong(15) == Edges.cellToVertex(c, 0))
    }
  }
}
