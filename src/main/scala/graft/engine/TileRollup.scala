package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.H3Functions

/** Raster <-> vector tiling roll-ups: aggregate a cell-indexed fact table to
  * a pyramid of coarser H3 resolutions.
  *
  * Each level is computed from the previous (finer) level, not from the base
  * table — at 100 TB this turns N full scans into one scan plus N tiny
  * re-aggregations, and each re-aggregation's shuffle input shrinks by ~7x
  * per level. Aggregations must therefore be decomposable (sum/count/min/
  * max); averages are carried as (sum, count) pairs.
  */
object TileRollup {

  /** Rolls `df` (with a `cell` column at `baseRes`) up through `levels`
    * (descending resolutions), returning one DataFrame per level with
    * columns: cell, res, cnt, plus the provided sum columns.
    *
    * @param sumCols numeric columns to sum along the pyramid.
    */
  def pyramid(spark: SparkSession, df: DataFrame, cellCol: String,
              baseRes: Int, levels: Seq[Int],
              sumCols: Seq[String]): Map[Int, DataFrame] = {
    H3Functions.register(spark)
    val sums = sumCols.map(c => sum(col(c)).as(c))
    val base = df.groupBy(col(cellCol).as("cell"))
      .agg(count(lit(1)).as("cnt"), sums: _*)
      .withColumn("res", lit(baseRes))

    var prev = base
    var out = Map.empty[Int, DataFrame]
    val sortedLevels = levels.sorted(Ordering[Int].reverse)
    for (res <- sortedLevels) {
      val reSums = (Seq(sum(col("cnt")).as("cnt")) ++
        sumCols.map(c => sum(col(c)).as(c)))
      val level = prev
        .withColumn("cell", expr(s"h3_cell_to_parent(cell, $res)"))
        .groupBy("cell")
        .agg(reSums.head, reSums.tail: _*)
        .withColumn("res", lit(res))
      out += res -> level
      prev = level
    }
    out
  }

  /** Merges two pyramid levels of the SAME resolution (decomposable aggs:
    * counts and sums re-add by cell). This is the incremental roll-up
    * primitive: roll up only the partitions an Icelite snapshot delta
    * contains ([[Icelite.readIncremental]]), then merge into the standing
    * tile table — at 100 TB the delta pyramid touches only new data and
    * the merge shuffles O(|tiles|), never the fact table. */
  def merge(a: DataFrame, b: DataFrame, sumCols: Seq[String]): DataFrame = {
    val reSums = (Seq(sum(col("cnt")).as("cnt")) ++
      sumCols.map(c => sum(col(c)).as(c)))
    a.unionByName(b)
      .groupBy("cell", "res")
      .agg(reSums.head, reSums.tail: _*)
      .select(a.columns.map(col): _*)
  }
}
