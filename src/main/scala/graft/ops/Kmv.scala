package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * DISTINCT hash values per group; the kth smallest order statistic
  * estimates the cardinality as (k-1) * M / h_k over hash space M.
  * Mergeable (union of sketches = sketch of union), map-side partial,
  * and — unlike HLL — integer-exact end to end except one deterministic
  * IEEE division, so a SQL oracle re-derives the estimate bit-for-bit.
  *
  * The hash is the Lehmer-scrambled composite of the two shared corpus
  * fingerprints (raw rolling hashes of short structured strings are NOT
  * uniform enough for order statistics — measured 9x estimator bias;
  * two multiplicative-congruential rounds per half fix it):
  *   m1 = ((fp*48271 + fp2) % P * 48271 + fp) % P
  *   m2 = ((fp2*16807 + fp) % P * 16807 + fp2) % P
  *   h  = m1 * P + m2 + 1            in [1, P^2], P = 2^31-1
  * Every step stays in BIGINT-safe mod-P arithmetic, so the DuckDB
  * oracle computes the identical hash from the shared fp/fp2 emitters;
  * the P^2 space keeps collision bias negligible to ~10^9 distinct per
  * group. Below k distinct hashes the sketch IS the distinct set and
  * the count is exact. */
final class KmvBuf(val k: Int) {
  val hs = new Array[Long](k)
  var size = 0

  /** Insert keeping `hs[0, size)` sorted ascending and distinct. */
  def add(h: Long): Unit = {
    if (size == k && h >= hs(k - 1)) return
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < size && hs(lo) == h) return // duplicate
    val last = if (size < k) size else k - 1
    var i = last
    while (i > lo) { hs(i) = hs(i - 1); i -= 1 }
    hs(lo) = h
    if (size < k) size += 1
  }

  def mergeFrom(o: KmvBuf): Unit = {
    var i = 0
    while (i < o.size) { add(o.hs(i)); i += 1 }
  }
}

/** Native KMV aggregate over a string column. Output: the sorted array
  * of the (at most k) smallest distinct hashes — the estimate itself is
  * a scalar expression over this array so it stays in one SQL shape on
  * both engines. */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuf] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  override def update(b: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val P = TextKernel.P
      val a = TextKernel.stringFp(s)
      val c = TextKernel.stringFp2(s)
      val m1 = (((a * 48271 + c) % P) * 48271 + a) % P
      val m2 = (((c * 16807 + a) % P) * 16807 + c) % P
      b.add(m1 * P + m2 + 1)
    }
    b
  }

  override def merge(b: KmvBuf, o: KmvBuf): KmvBuf = { b.mergeFrom(o); b }

  override def eval(b: KmvBuf): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) { out(i) = b.hs(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: KmvBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 8)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.hs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvBuf(k)
    var i = 0
    while (i < n) { b.hs(i) = bb.getLong; i += 1 }
    b.size = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}
