package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.h3.H3
import graft.spark.H3Functions

/** Explicit cell-prefix partitioning for co-located spatial joins and
  * pruned scans.
  *
  * The canonical layout key is the resolution-cleared order key
  * (`cell & ~(0xF << 52)`), under which a parent sorts adjacent to all of
  * its descendants — so range partitions correspond to contiguous regions
  * of the H3 cell space at every resolution simultaneously, and a
  * `cell_p = h3_cell_to_parent(cell, 3)` directory layout prunes at file
  * granularity.
  */
object CellPartitioning {

  /** The sort/partition key expression for a cell column. */
  def orderKeyCol(cellCol: String) = expr(s"$cellCol & ~(15L << 52)")

  /** Evenly spaced split points of the cell space at `res` (base-cell
    * granularity), for use as explicit range boundaries. */
  def splitPoints(res: Int, numPartitions: Int): Array[Long] = {
    val perPart = math.max(1, 122 / numPartitions)
    (perPart until 122 by perPart)
      .map(bc => H3.setBaseCell(H3.firstCell(res), bc))
      .toArray
  }

  /** Range-partitions `df` by the `prefixRes` ancestor of the cell:
    * partitions are contiguous in cell space AND prefix-atomic (equal range
    * keys always co-locate), so a later join or compaction keyed on the
    * same prefix needs no extra shuffle. */
  def repartitionByCellRange(spark: SparkSession, df: DataFrame,
                             cellCol: String, numPartitions: Int,
                             prefixRes: Int = 5): DataFrame = {
    H3Functions.register(spark)
    val prefix = expr(s"h3_cell_to_parent($cellCol, $prefixRes)")
    df.repartitionByRange(numPartitions, prefix)
      .sortWithinPartitions(orderKeyCol(cellCol))
  }

  /** Writes a cell-indexed table partitioned by the res-3 prefix
    * (`cell_p` directory layout -> partition pruning on prefix filters). */
  def writePrefixPartitioned(spark: SparkSession, df: DataFrame,
                             cellCol: String, path: String): Unit = {
    H3Functions.register(spark)
    df.withColumn("cell_p", expr(s"h3_cell_to_parent($cellCol, 3)"))
      .write.partitionBy("cell_p").mode("overwrite").parquet(path)
  }
}
