package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.H3Functions

/** Distributed dissolve (cellsToMultiPolygon for cell sets too large for
  * one task), the groupBy-canonical-edge formulation from SURVEY §2.7:
  *
  *  1. every cell emits its directed edges (Generator — O(area) work,
  *     fully distributed);
  *  2. twin cancellation is a shuffle on the canonical (undirected) edge
  *     key: an edge whose reverse is also present is interior (count 2)
  *     and cancels, count-1 edges are the region boundary;
  *  3. only the surviving boundary edges — O(perimeter), typically orders
  *     of magnitude smaller than the input — are collected per group and
  *     linked into rings by the scalar kernel.
  *
  * The per-group serial step is therefore bounded by the perimeter, never
  * the area, which is exactly the property that keeps a continental-scale
  * dissolve inside one executor's memory.
  */
object DistributedDissolve {

  /** @param df       input with a group column and a cell column
    *                  (same resolution within each group; duplicates OK)
    * @return (groupCol, geojson) — one MultiPolygon per group. */
  def dissolve(spark: SparkSession, df: DataFrame,
               groupCol: String, cellCol: String): DataFrame = {
    H3Functions.register(spark)
    val edges = df.select(col(groupCol).as("grp"), col(cellCol).as("cell"))
      .distinct()
      .select(col("grp"), expr("h3_origin_to_directed_edges(cell)").as("edge"))
    val survivors = edges
      .withColumn("cedge", expr("least(edge, h3_directed_edge_reverse(edge))"))
      .groupBy("grp", "cedge")
      .agg(count(lit(1)).as("n"), min("edge").as("edge"))
      .filter(col("n") === 1)
    survivors.groupBy("grp")
      .agg(collect_list("edge").as("edges"))
      .select(col("grp").as(groupCol),
        expr("h3_dissolve_edges(edges)").as("geojson"))
  }
}
