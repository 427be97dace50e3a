package graft.h3.tools

import org.apache.spark.sql.SparkSession
import graft.spark.H3Functions

object SparkSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("h3ospark-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    H3Functions.register(spark)
    import spark.implicits._

    // Fixture subset through Spark SQL (exercises codegen).
    val lines = scala.io.Source.fromFile("/root/reference/dataset/latLngToCell.txt")
      .getLines().take(5000).map { l =>
        val p = l.trim.split("\\s+")
        val lngRaw = p(2).toDouble
        (java.lang.Long.parseUnsignedLong(p(0), 16), p(1).toDouble,
          if (lngRaw > 180) lngRaw - 360 else lngRaw)
      }.toSeq
    val df = lines.toDF("cell", "lat", "lng")
    df.createOrReplaceTempView("fixture")

    val bad = spark.sql("""
      SELECT count(*) AS bad FROM fixture
      WHERE h3_latlng_to_cell(lat, lng, h3_get_resolution(cell)) != cell
    """).collect()(0).getLong(0)
    println(s"spark fixture mismatches: $bad / 5000")

    val plan = spark.sql(
      "SELECT h3_cell_to_parent(h3_latlng_to_cell(lat, lng, 9), 5) FROM fixture")
    plan.explain("formatted")

    val disk = spark.sql("""
      SELECT f.cell, d.cell AS n, d.distance
      FROM fixture f
      LATERAL VIEW h3_grid_disk_distances(f.cell, 2) d AS cell, distance
    """).count()
    println(s"disk rows: $disk (expect ~${5000 * 19})")

    val paris = scala.io.Source.fromFile("/root/reference/dataset/shapes/Paris.geojson").mkString
    val cover = spark.sql(
      s"SELECT c.cell FROM (SELECT 1) t LATERAL VIEW h3_polygon_to_cells('${paris.replace("'", "''")}', 8, 0) c AS cell")
    println(s"paris res8 cover via SQL: ${cover.count()} (want 164)")

    val cmp = spark.sql("""
      SELECT size(h3_compact_cells(collect_list(c.cell))) AS n
      FROM (SELECT 1) t
      LATERAL VIEW h3_cell_to_children(599686042433355775L, 7) c AS cell
    """).collect()(0).getInt(0)
    println(s"compact(children(res5->7)) size: $cmp (want 1)")

    spark.stop()
  }
}
