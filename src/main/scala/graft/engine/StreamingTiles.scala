package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.H3Functions

/** Structured Streaming surface: continuous H3 indexing and windowed tile
  * roll-ups over a stream of geotagged events.
  *
  * The batch operators compose directly — `h3_latlng_to_cell` and
  * `h3_cell_to_parent` are ordinary codegen'd expressions, so the streaming
  * plan is readStream -> project -> watermark -> windowed groupBy, with
  * state keyed by (window, tile). Late data beyond the watermark is
  * dropped; output mode `update` emits refined tile counts per trigger.
  */
object StreamingTiles {

  /** @param events streaming DataFrame with `ts` (timestamp), `lat`, `lng`.
    * @return windowed tile counts at `tileRes`. */
  def windowedTileCounts(spark: SparkSession, events: DataFrame,
                         pointRes: Int = 9, tileRes: Int = 5,
                         windowDuration: String = "10 minutes",
                         watermark: String = "5 minutes"): DataFrame = {
    H3Functions.register(spark)
    events
      .withColumn("cell", expr(s"h3_latlng_to_cell(lat, lng, $pointRes)"))
      .withColumn("tile", expr(s"h3_cell_to_parent(cell, $tileRes)"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("tile"))
      .agg(count(lit(1)).as("cnt"))
  }

  final case class TileState(total: Long, distinctCells: Set[Long])
  final case class TileUpdate(tile: Long, total: Long, distinct_cells: Int)

  /** Custom-state streaming: per-tile running totals + distinct-cell
    * cardinality via flatMapGroupsWithState (the KeyValueGroupedDataset
    * escape hatch for state Spark's windowed aggregates can't express). */
  def tileVisitStats(spark: SparkSession, events: DataFrame,
                     pointRes: Int = 9, tileRes: Int = 5)
      : org.apache.spark.sql.Dataset[TileUpdate] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    H3Functions.register(spark)
    val keyed = events
      .withColumn("cell", expr(s"h3_latlng_to_cell(lat, lng, $pointRes)"))
      .withColumn("tile", expr(s"h3_cell_to_parent(cell, $tileRes)"))
      .select(col("tile").as[Long], col("cell").as[Long])
      .as[(Long, Long)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState(
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (tile: Long, rows: Iterator[(Long, Long)], state: GroupState[TileState]) =>
        val prev = state.getOption.getOrElse(TileState(0L, Set.empty))
        var total = prev.total
        var cells = prev.distinctCells
        rows.foreach { case (_, cell) => total += 1; cells += cell }
        state.update(TileState(total, cells))
        Iterator(TileUpdate(tile, total, cells.size))
    }
  }
}
