package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.h3.H3

/** The H3 expression layer evaluated through Spark (codegen paths). */
class SparkH3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("fixture subset matches through Spark SQL with codegen") {
    val url = getClass.getResource("/h3/latLngToCell.txt")
    val rows = scala.io.Source.fromURL(url).getLines().take(20000).map { l =>
      val p = l.trim.split("\\s+")
      val raw = p(2).toDouble
      (java.lang.Long.parseUnsignedLong(p(0), 16), p(1).toDouble,
        if (raw > 180) raw - 360 else raw)
    }.toSeq
    val df = rows.toDF("cell", "lat", "lng")
    df.createOrReplaceTempView("fx")
    val bad = spark.sql(
      """SELECT count(*) FROM fx
         WHERE h3_latlng_to_cell(lat, lng, h3_get_resolution(cell)) != cell
      """).collect()(0).getLong(0)
    assert(bad == 0)
  }

  test("null semantics: invalid inputs produce nulls") {
    val row = spark.sql("""
      SELECT h3_latlng_to_cell(cast('NaN' as double), 0.0, 9) AS c1,
             h3_cell_to_parent(h3_latlng_to_cell(10.0, 20.0, 5), 9) AS c2,
             h3_grid_distance(h3_latlng_to_cell(0.0, 0.0, 9),
                              h3_latlng_to_cell(80.0, 100.0, 9)) AS c3,
             h3_from_string('not hex') AS c4
    """).collect()(0)
    assert(row.isNullAt(0), "NaN lat -> null")
    assert(row.isNullAt(1), "finer parent -> null")
    assert(row.isNullAt(2), "cross-world distance -> null")
    assert(row.isNullAt(3), "bad string -> null")
  }

  test("generators: disk, children, ring via SQL") {
    val n = spark.sql("""
      SELECT d.dcell FROM (SELECT h3_latlng_to_cell(48.8566, 2.3522, 9) AS c)
      LATERAL VIEW h3_grid_disk(c, 3) d AS dcell
    """).count()
    assert(n == 37)
    val kids = spark.sql("""
      SELECT k.child FROM (SELECT h3_latlng_to_cell(48.8566, 2.3522, 6) AS c)
      LATERAL VIEW h3_cell_to_children(c, 8) k AS child
    """).collect().map(_.getLong(0))
    assert(kids.length == 49 && kids.distinct.length == 49)
    kids.foreach(k => assert(H3.isValidCell(k)))
  }

  test("boundary and latlng struct columns") {
    val row = spark.sql("""
      SELECT h3_cell_to_boundary(h3_latlng_to_cell(48.8566, 2.3522, 9)) AS b,
             h3_cell_to_latlng(h3_latlng_to_cell(48.8566, 2.3522, 9)) AS c
    """).collect()(0)
    val boundary = row.getSeq[org.apache.spark.sql.Row](0)
    assert(boundary.size >= 6 && boundary.size <= 10)
    val center = row.getStruct(1)
    assert(math.abs(center.getDouble(0) - 48.8566) < 0.01)
    assert(math.abs(center.getDouble(1) - 2.3522) < 0.01)
  }

  test("polygon_to_cells generator matches kernel tiler") {
    val url = getClass.getResource("/h3/shapes/Paris.geojson")
    val geojson = scala.io.Source.fromURL(url).mkString
    val viaSql = spark.sql(
      s"SELECT p.cell FROM (SELECT 1) LATERAL VIEW h3_polygon_to_cells('${geojson.replace("'", "''")}', 8, 0) p AS cell")
      .collect().map(_.getLong(0)).toSet
    assert(viaSql.size == 164)
  }

  test("compact/uncompact array expressions") {
    val row = spark.sql("""
      WITH base AS (SELECT h3_latlng_to_cell(48.8566, 2.3522, 5) AS c)
      SELECT size(h3_compact_cells(h3_uncompact_cells(array(c), 8))) AS n,
             h3_compact_cells(h3_uncompact_cells(array(c), 8))[0] = c AS same
      FROM base
    """).collect()(0)
    assert(row.getInt(0) == 1 && row.getBoolean(1))
  }

  test("explain shows whole-stage codegen around H3 expressions") {
    val df = spark.range(1000).selectExpr(
      "h3_cell_to_parent(h3_latlng_to_cell(id * 0.001, id * 0.002, 9), 5) AS p")
    // WSCG stages print with a "*(n)" prefix.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(500))
  }
}

/** H3-aware optimizer rewrites. */
class H3RulesSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("parent-of-parent collapses to a single kernel call") {
    val spark = SparkTestBase.spark
    val df = spark.range(100).selectExpr(
      "h3_cell_to_parent(h3_cell_to_parent(h3_latlng_to_cell(id * 0.1, id * 0.2, 9), 7), 5) AS t")
    val optimized = df.queryExecution.optimizedPlan.toString
    // Exactly one h3_cell_to_parent survives.
    assert("h3_cell_to_parent".r.findAllIn(optimized).size == 1, optimized)
    // Semantics unchanged.
    val direct = spark.range(100).selectExpr(
      "h3_cell_to_parent(h3_latlng_to_cell(id * 0.1, id * 0.2, 9), 5) AS t")
    assert(df.collect().map(_.getLong(0)).toSeq ==
      direct.collect().map(_.getLong(0)).toSeq)
  }

  test("resolution of a fresh index folds to the literal") {
    val spark = SparkTestBase.spark
    val df = spark.range(10).selectExpr(
      "h3_get_resolution(h3_latlng_to_cell(id * 0.1, id * 0.2, 9)) AS r")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("h3_latlng_to_cell"), optimized)
    assert(df.collect().forall(_.getInt(0) == 9))
  }
}

/** Prefix-equality filters become parquet-pushable range predicates. */
class PrefixPushdownSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("h3_cell_to_parent equality filter pushes a cell range into the scan") {
    val spark = SparkTestBase.spark
    val pts = graft.engine.Pages.indexedPages(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("pushdown").toString
    pts.select("page_id", "cell9").write.mode("overwrite").parquet(path)

    val parent = graft.h3.H3.cellToParent(
      graft.h3.H3.latLngToCell(48.8566, 2.3522, 9), 5)
    val df = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions
        .expr(s"h3_cell_to_parent(cell9, 5) = ${parent}L"))

    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(cell9") ||
           plan.contains("PushedFilters: [IsNotNull(cell9), GreaterThanOrEqual"),
      plan.take(1200))

    // Semantics preserved: matches the unoptimized predicate exactly.
    val expected = pts
      .filter(org.apache.spark.sql.functions
        .expr(s"h3_cell_to_parent(cell9, 5) = ${parent}L"))
      .select("page_id").collect().map(_.getLong(0)).toSet
    val got = df.select("page_id").collect().map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty)
  }
}
