package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

/** Typed top-K aggregator: keeps the K best (score, id) pairs in a bounded
  * heap per group. Unlike a window + row_number, the partial aggregation
  * runs map-side, so the shuffle carries at most K rows per group per
  * partition instead of every candidate row — the right shape for top-K
  * over very wide candidate sets at 100 TB.
  */
object TopK {

  type Entry = (Double, Long) // (score, id); max-score first

  final case class Buf(var items: List[Entry])

  /** K largest by score (ties broken by smaller id). */
  class TopKAgg(k: Int) extends Aggregator[Entry, Buf, Seq[Entry]] {
    private def insert(items: List[Entry], e: Entry): List[Entry] = {
      val merged = (e :: items).sortBy { case (s, id) => (-s, id) }
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Entry): Buf = { b.items = insert(b.items, a); b }
    override def merge(b1: Buf, b2: Buf): Buf = {
      val merged = (b1.items ++ b2.items).sortBy { case (s, id) => (-s, id) }
      Buf(merged.take(k))
    }
    override def finish(b: Buf): Seq[Entry] =
      b.items.sortBy { case (s, id) => (-s, id) }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Registers `top_k(score, id)` as a session UDAF and returns a helper
    * that aggregates (group, score, id) rows into top-k rows per group. */
  def topKPerGroup(spark: SparkSession, df: DataFrame, groupCol: String,
                   scoreCol: String, idCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.select(col(groupCol).as("grp"),
        struct(col(scoreCol).cast("double").as("_1"),
          col(idCol).cast("long").as("_2")).as("entry"))
      .groupBy("grp")
      .agg(agg(col("entry._1"), col("entry._2")).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("grp").as(groupCol), (col("pos") + 1).cast("long").as("rank"),
        col("e._1").as(scoreCol), col("e._2").as(idCol))
  }
}
