package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed top-K aggregator: keeps the K best (score, id) pairs in a bounded
  * heap per group. Unlike a window + row_number, the partial aggregation
  * runs map-side, so the shuffle carries at most K rows per group per
  * partition instead of every candidate row — the right shape for top-K
  * over very wide candidate sets at 100 TB.
  */
object TopK {

  /** Aggregates (group, score, id) rows into top-k rows per group via the
    * native primitive-buffer aggregate (map-side partial top-k; no per-row
    * boxing). */
  def topKPerGroup(spark: SparkSession, df: DataFrame, groupCol: String,
                   scoreCol: String, idCol: String, k: Int): DataFrame = {
    val aggCol = org.apache.spark.sql.GraftBridge.column(TopKPrimitiveAgg(
      org.apache.spark.sql.GraftBridge.expression(col(scoreCol).cast("double")),
      org.apache.spark.sql.GraftBridge.expression(col(idCol).cast("long")), k)
      .toAggregateExpression())
    df.groupBy(col(groupCol).as("grp"))
      .agg(aggCol.as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("grp").as(groupCol), (col("pos") + 1).cast("long").as("rank"),
        col("e.score").as(scoreCol), col("e.id").as(idCol))
  }
}

/** Mutable primitive top-k buffer: parallel arrays sorted best-first
  * (higher score first, ties by lower id). */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def better(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def add(s: Double, id: Long): Unit = {
    if (size >= k && !better(s, id, size - 1)) return
    var pos = if (size < k) size else k - 1
    while (pos > 0 && better(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1)
      ids(pos) = ids(pos - 1)
      pos -= 1
    }
    scores(pos) = s
    ids(pos) = id
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.size) { add(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Native top-k aggregate: partial top-k runs map-side over primitive
  * buffers (no encoder boxing per row), so the shuffle carries at most k
  * (score, id) pairs per group per partition. Output: array of
  * struct(score, id), best first. */
case class TopKPrimitiveAgg(score: Expression, id: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = { b.mergeFrom(o); b }

  override def eval(b: TopKBuf): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      out(i) = new GenericInternalRow(Array[Any](b.scores(i), b.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuf(k)
    var i = 0
    while (i < n) {
      b.scores(i) = bb.getDouble
      b.ids(i) = bb.getLong
      i += 1
    }
    b.size = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPrimitiveAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPrimitiveAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}
