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
    *                  (MIXED resolutions per group are accepted —
    *                  compacted covers dissolve directly; duplicates and
    *                  ancestor-covered cells OK)
    * @return (groupCol, geojson) — one MultiPolygon per group. */
  def dissolve(spark: SparkSession, df: DataFrame,
               groupCol: String, cellCol: String): DataFrame = {
    H3Functions.register(spark)
    val cells = df.select(col(groupCol).as("grp"), col(cellCol).as("cell"))
      .distinct()

    // One cheap agg decides the path: homogeneous input (the common case)
    // skips the ancestor dedup and the per-group max-res join entirely.
    val resRow = cells
      .agg(min(expr("h3_get_resolution(cell)")), max(expr("h3_get_resolution(cell)")))
      .collect()(0)
    if (resRow.isNullAt(0)) {
      // Empty input: min/max over zero rows are null — return an empty
      // (groupCol, geojson) frame rather than NPE on getInt.
      import spark.implicits._
      return Seq.empty[(Long, String)].toDF(groupCol, "geojson")
        .select(col(groupCol).cast(df.schema(groupCol).dataType), col("geojson"))
    }
    val (minRes, maxRes) = (resRow.getInt(0), resRow.getInt(1))

    val edges =
      if (minRes == maxRes)
        cells.select(col("grp"), expr("h3_origin_to_directed_edges(cell)").as("edge"))
      else {
        // Mixed resolutions (heterogeneous Solvent, reference
        // arc_set.rs:38-56). Twin-parity needs each position covered
        // exactly once, so drop cells that an ancestor in the same group
        // already covers (id-only semi-join over the <= res-minRes
        // ancestor chain; complete-sibling groups need no collapse —
        // sibling twins cancel like any covered neighbors).
        val ancLevels = (minRes until maxRes).map(r =>
          expr(s"CASE WHEN h3_get_resolution(cell) > $r " +
            s"THEN h3_cell_to_parent(cell, $r) ELSE NULL END"))
        val covered = cells
          .select(col("grp"), col("cell"),
            explode(array(ancLevels: _*)).as("anc"))
          .filter(col("anc").isNotNull)
          .join(cells.select(col("grp"), col("cell").as("anc")),
            Seq("grp", "anc"), "left_semi")
          .select("grp", "cell").distinct()
        val canon = cells.join(covered, Seq("grp", "cell"), "left_anti")

        // Per-group finest resolution; every cell refines its boundary to
        // it (O(perimeter x depth) per cell) so all emitted edges share
        // one resolution and twin-cancel exactly.
        val grpRes = canon.groupBy("grp")
          .agg(max(expr("h3_get_resolution(cell)")).as("target_res"))
        canon.join(grpRes, "grp")
          .select(col("grp"),
            expr("h3_cell_boundary_edges(cell, target_res)").as("edge"))
      }

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
