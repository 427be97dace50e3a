package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.h3.H3
import graft.spark.H3Functions

/** Distributed cell-set compaction.
  *
  * Correctness of per-partition compaction relies on two facts: a sibling
  * group never spans base cells, and every ancestor of a cell shares its
  * base cell. Partitioning by base cell (122 buckets) and sorting each
  * partition by the resolution-cleared order key therefore makes the
  * single-pass kernel compaction globally exact — no cross-partition
  * sibling group can exist.
  */
object DistributedCompact {

  /** Compacts a distributed set of same-resolution cells (column `cell`).
    * Input may contain duplicates; output is the minimal covering set at
    * mixed resolutions. */
  def compact(spark: SparkSession, cells: DataFrame): DataFrame = {
    H3Functions.register(spark)
    import spark.implicits._
    val ds: Dataset[Long] = cells.select(col("cell").cast("long")).as[Long]
    ds.distinct()
      .toDF("cell")
      .repartition(expr("h3_get_base_cell(cell)"))
      .sortWithinPartitions(expr("cell & ~(15L << 52)")) // order key
      .as[Long]
      .mapPartitions { it =>
        val arr = it.toArray
        H3.compactSorted(arr).iterator
      }
      .toDF("cell")
  }

  /** Expands a compacted distributed set back to `res`. */
  def uncompact(spark: SparkSession, cells: DataFrame, res: Int): DataFrame = {
    H3Functions.register(spark)
    cells.select(expr(s"h3_cell_to_children(cell, $res)").as("cell"))
  }
}
