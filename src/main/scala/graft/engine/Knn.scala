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
  * guarantees exactness: a query's result is provably complete when it has
  * K candidates and its K-th distance is below the minimum possible
  * distance to any point outside the explored disk. Queries failing the
  * check (including those with no candidates at all) are re-run with a
  * wider ring; stragglers are brute-forced (tiny set by then).
  */
object Knn {

  /** Conservative lower bound (meters) on the distance from any point of
    * the query cell to any point outside disk(ring). Verified against
    * brute force in EngineSpec and the driver's DuckDB oracle. */
  def safeRadiusM(res: Int, ring: Int): Double = {
    val edgeM = graft.h3.Tables.EdgeLengthRads(res) * graft.h3.H3.EarthRadiusKm * 1000.0
    ring.toDouble * edgeM * 0.8
  }

  /** @param points  columns: id, lat, lng (degrees)
    * @param queries columns: qid, lat, lng (degrees)
    * @return columns: qid, id, dist_m, rank (rank 1..k)
    */
  def knnJoin(spark: SparkSession, points: DataFrame, queries: DataFrame,
              k: Int, res: Int, initialRing: Int = 2,
              maxRounds: Int = 3): DataFrame = {
    H3Functions.register(spark)

    val pts = points
      .withColumn("__pcell", expr(s"h3_latlng_to_cell(lat, lng, $res)"))
      .select(col("id"), col("lat").as("plat"), col("lng").as("plng"), col("__pcell"))
      .cache()

    var remaining = queries
      .withColumn("__qcell", expr(s"h3_latlng_to_cell(lat, lng, $res)"))
      .select(col("qid"), col("lat").as("qlat"), col("lng").as("qlng"), col("__qcell"))
      .cache()

    val w = Window.partitionBy("qid").orderBy(col("dist_m"), col("id"))

    def rank(cand: DataFrame): DataFrame = cand
      .withColumn("dist_m", expr("h3_great_circle_distance_m(qlat, qlng, plat, plng)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("dist_m"), col("rank"))

    var ring = initialRing
    var result: DataFrame = null
    var round = 0
    var done = false

    while (!done) {
      val lastRound = round == maxRounds - 1
      val cand =
        if (lastRound) remaining.crossJoin(pts) // brute-force stragglers
        else remaining
          .select(col("qid"), col("qlat"), col("qlng"),
            expr(s"h3_grid_disk(__qcell, $ring)").as("__cell"))
          .join(pts.hint("shuffle_hash"), col("__cell") === col("__pcell"))

      val ranked = rank(cand).cache()

      if (lastRound) {
        result = if (result == null) ranked else result.unionByName(ranked)
        done = true
      } else {
        // Provably-complete queries: k candidates, kth within safe radius.
        val safe = safeRadiusM(res, ring)
        val okQids = ranked.groupBy("qid")
          .agg(count(lit(1)).as("n"), max("dist_m").as("kth"))
          .filter(col("n") === k && col("kth") <= lit(safe))
          .select("qid")
        val settled = ranked.join(okQids, "qid")
        result = if (result == null) settled else result.unionByName(settled)

        // Everything not settled goes to the next round -- including
        // queries that found zero candidates this round.
        remaining = remaining.join(okQids, Seq("qid"), "left_anti").cache()
        if (remaining.isEmpty) done = true
        else ring = ring * 2 + 1
      }
      round += 1
    }
    pts.unpersist(blocking = false)
    result
  }
}
