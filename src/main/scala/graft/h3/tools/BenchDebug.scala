package graft.h3.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Bench
import graft.engine.SpatialJoin

object BenchDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spark.H3Functions.register(spark)
    val n = 3000000L

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // Warm up.
    Bench.synthPoints(spark, 50000).selectExpr("h3_latlng_to_cell(lat, lng, 9) AS c").count()

    t("synth only") {
      Bench.synthPoints(spark, n).agg(count(lit(1)), sum("lat")).collect()
    }
    t("synth + index") {
      Bench.synthPoints(spark, n)
        .selectExpr("h3_latlng_to_cell(lat, lng, 9) AS c")
        .agg(count(lit(1)), min("c")).collect()
    }
    val polys = Seq(
      SpatialJoin.Poly(1, SpatialJoin.loadShape("/root/reference/dataset/shapes/Paris.geojson")(0)),
      SpatialJoin.Poly(2, SpatialJoin.loadShape("/root/reference/dataset/shapes/SanFrancisco.geojson")(0)),
      SpatialJoin.Poly(3, SpatialJoin.loadShape("/root/reference/dataset/shapes/Holes.geojson")(0)))
    t("cover computation") {
      val c = SpatialJoin.cover(polys, 9)
      println(s"  cover rows=${c.size} res=${c.map(_._3).distinct.sorted}")
    }
    t("explode ancestors + count") {
      val c = SpatialJoin.cover(polys, 9)
      val rs = c.map(_._3).distinct.sorted
      Bench.synthPoints(spark, n)
        .withColumn("cell9", expr("h3_latlng_to_cell(lat, lng, 9)"))
        .withColumn("__anc", explode(array(rs.map(r => expr(s"h3_cell_to_parent(cell9, $r)")): _*)))
        .agg(count(lit(1)), min("__anc")).collect()
    }
    t("full pip join + tiles") {
      val pts = Bench.synthPoints(spark, n)
        .withColumn("cell9", expr("h3_latlng_to_cell(lat, lng, 9)"))
      SpatialJoin.pipJoin(spark, pts, polys, res = 9)
        .withColumn("tile", expr("h3_cell_to_parent(cell9, 5)"))
        .groupBy("poly_id", "tile").agg(count(lit(1)))
        .agg(count(lit(1))).collect()
    }
    t("tile rollup") {
      val pts = Bench.synthPoints(spark, n)
        .withColumn("cell9", expr("h3_latlng_to_cell(lat, lng, 9)"))
        .withColumn("v", col("page_id") % 97)
      val levels = graft.engine.TileRollup.pyramid(spark, pts, "cell9", 9,
        Seq(7, 5, 3), Seq("v"))
      levels(3).agg(count(lit(1)), sum("cnt")).collect()
    }
    t("knn 200q vs 300k pts") {
      val pts = Bench.synthPoints(spark, n / 10)
        .select(col("page_id").as("id"), col("lat"), col("lng"))
      val qs = Bench.synthPoints(spark, 200)
        .select(col("page_id").as("qid"), col("lat"), col("lng"))
      val r = graft.engine.Knn.knnJoin(spark, pts, qs, k = 10, res = 8,
        initialRing = 2, maxRounds = 3)
      r.agg(count(lit(1))).collect()
      r.unpersist(blocking = false) // caller owns the returned cache

    }
    t("join without PIP filter") {
      import spark.implicits._
      val c = SpatialJoin.cover(polys, 9)
      val rs = c.map(_._3).distinct.sorted
      val coverDf = c.toDF("poly_id", "cover_cell", "cover_res", "full")
      Bench.synthPoints(spark, n)
        .withColumn("cell9", expr("h3_latlng_to_cell(lat, lng, 9)"))
        .withColumn("__anc", explode(array(rs.map(r => expr(s"h3_cell_to_parent(cell9, $r)")): _*)))
        .join(broadcast(coverDf), col("__anc") === col("cover_cell"))
        .agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
