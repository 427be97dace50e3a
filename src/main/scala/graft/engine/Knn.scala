package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.spark.H3Functions

/** kNN join via H3 gridDisk ring expansion.
  *
  * Both sides are bucketed at `res`; each query explodes its cell's k-ring
  * disk, joins points on the ring cells, re-ranks candidates by exact
  * haversine distance and keeps the top K. A verification predicate
  * guarantees exactness: a query's result is provably complete when its
  * K-th candidate distance is below the minimum possible distance to any
  * cell outside the explored disk. Queries failing the check are re-run
  * with a doubled ring radius (driver-side loop, converges in 2-3 rounds
  * for sane densities).
  */
object Knn {

  /** Conservative lower bound (meters) on the distance from a cell center
    * to any point in a cell at grid distance > ring. Uses the average edge
    * length shrunk by 2x for worst-case distortion. */
  def safeRadiusM(res: Int, ring: Int): Double = {
    val edgeM = graft.h3.Tables.EdgeLengthRads(res) * graft.h3.H3.EarthRadiusKm * 1000.0
    // Any point outside disk(ring) sits in a cell at grid distance
    // >= ring+1; with worst-case distortion its geometric distance from any
    // point of the query cell is at least ~ring * minWidth, where minWidth
    // is conservatively 0.8x the average edge length. Verified empirically
    // against brute force in EngineSpec / the driver oracle.
    ring.toDouble * edgeM * 0.8
  }

  /** @param points  columns: id, lat, lng (degrees)
    * @param queries columns: qid, lat, lng (degrees)
    * @return columns: qid, id, dist_m, rank (rank 1..k)
    */
  def knnJoin(spark: SparkSession, points: DataFrame, queries: DataFrame,
              k: Int, res: Int, initialRing: Int = 2,
              maxRounds: Int = 4): DataFrame = {
    H3Functions.register(spark)

    val pts = points
      .withColumn("__pcell", expr(s"h3_latlng_to_cell(lat, lng, $res)"))
      .select(col("id"), col("lat").as("plat"), col("lng").as("plng"), col("__pcell"))
      .cache()

    var remaining = queries
      .withColumn("__qcell", expr(s"h3_latlng_to_cell(lat, lng, $res)"))
      .select(col("qid"), col("lat").as("qlat"), col("lng").as("qlng"), col("__qcell"))
      .cache()

    var ring = initialRing
    var result: DataFrame = null
    var round = 0

    while (round < maxRounds && remaining != null) {
      val cand = remaining
        .select(col("qid"), col("qlat"), col("qlng"),
          expr(s"h3_grid_disk(__qcell, $ring)").as("__cell"))
        .join(pts.hint("shuffle_hash"), col("__cell") === col("__pcell"))
        .withColumn("dist_m",
          expr("h3_great_circle_distance_m(qlat, qlng, plat, plng)"))

      val w = Window.partitionBy("qid").orderBy(col("dist_m"), col("id"))
      val ranked = cand
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("id"), col("dist_m"), col("rank"))
        .cache()

      // Completeness check: kth distance must fit inside the safe radius,
      // and the query must have found k candidates at all.
      val safe = safeRadiusM(res, ring)
      val summary = ranked.groupBy("qid")
        .agg(count(lit(1)).as("n"), max("dist_m").as("kth"))
        .withColumn("ok", col("n") === k && col("kth") <= lit(safe))

      val done = ranked.join(summary.filter(col("ok")).select("qid"), "qid")
      result = if (result == null) done else result.unionByName(done)

      val unsafeQids = summary.filter(!col("ok")).select("qid")
      val unsafeCount = unsafeQids.count()
      if (unsafeCount == 0) {
        remaining = null
      } else {
        remaining = remaining.join(unsafeQids, "qid").cache()
        ring = ring * 2 + 1
        if (round == maxRounds - 2) {
          // Last resort: brute force the stragglers (tiny set).
          val brute = remaining
            .crossJoin(pts)
            .withColumn("dist_m",
              expr("h3_great_circle_distance_m(qlat, qlng, plat, plng)"))
            .withColumn("rank", row_number().over(
              Window.partitionBy("qid").orderBy(col("dist_m"), col("id"))))
            .filter(col("rank") <= k)
            .select(col("qid"), col("id"), col("dist_m"), col("rank"))
          result = result.unionByName(brute)
          remaining = null
        }
      }
      round += 1
    }
    pts.unpersist(blocking = false)
    result
  }
}
