package graft.engine

import java.util.Base64

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-bucket Bloom-filter column statistics for the Icelite manifest —
  * the Iceberg/Parquet bloom analogue at manifest granularity. Range
  * stats (colStats/strStats) cannot prune POINT lookups on unsorted
  * high-cardinality columns (every bucket's [min,max] of doc_id spans
  * the whole domain); a per-bucket bloom answers "definitely absent" and
  * turns an equality read into opening a handful of buckets out of tens
  * of thousands. All probes are deterministic (fixed mixers, no seeds),
  * so manifests are reproducible; correctness never depends on the
  * filter — false positives only open extra buckets, and the exact
  * predicate is always re-applied to the rows.
  */
object IceliteBloom {

  /** Default filter size: 8192 bits = 1 KB per column per bucket (~1.4 KB
    * base64 in the manifest). Size to the BUCKET row count, not the
    * table: FP = (1 - e^(-k*n/m))^k with k=4 probes, so the default is
    * right for n up to ~1k rows/bucket (n=250 -> 0.02% FP, n=1k ->
    * 2.4%), while a 4.7k-row bucket saturates it to ~65% — at dense
    * layouts pass `bloomBits ~ 10 * rowsPerBucket` (n=4.7k at 2^16 bits
    * -> 0.4% FP, 8 KB/bucket). Pruning stays CORRECT at any size —
    * saturation only costs prune ratio, never answers. */
  val DefaultBits: Int = 1 << 13

  /** Probes per element; with DefaultBits and a few thousand rows per
    * bucket, 4 probes sit near the optimum and keep inserts cheap. */
  val Probes: Int = 4

  /** SplitMix64 finalizer — the standard 64-bit avalanche mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Two independent 64-bit hashes of a long (h2 forced odd so double
    * hashing never degenerates to a constant probe). */
  @inline def hashLong(v: Long): (Long, Long) =
    (mix64(v), mix64(v ^ 0x5DEECE66DL) | 1L)

  /** Two independent 64-bit hashes of UTF-8 bytes: two polynomial rolls
    * with distinct odd multipliers, each avalanched. */
  def hashBytes(b: Array[Byte]): (Long, Long) = {
    var a = 0L
    var c = 0L
    var i = 0
    while (i < b.length) {
      a = a * 0x100000001B3L + (b(i) & 0xffL)
      c = c * 0x9E3779B97F4A7C15L + (b(i) & 0xffL)
      i += 1
    }
    (mix64(a ^ b.length), mix64(c) | 1L)
  }

  @inline private def bitIndex(h1: Long, h2: Long, i: Int, nBits: Int): Int =
    (((h1 + i.toLong * h2) & Long.MaxValue) % nBits).toInt

  /** Set the element's `Probes` bits in `words`. */
  def add(words: Array[Long], nBits: Int, h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < Probes) {
      val bit = bitIndex(h1, h2, i, nBits)
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Definitely-absent test: false means NO inserted element hashed
    * here — prune the bucket; true means "might contain". */
  def mightContain(words: Array[Long], nBits: Int, h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < Probes) {
      val bit = bitIndex(h1, h2, i, nBits)
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mightContainLong(encoded: String, value: Long): Boolean = {
    val words = decode(encoded)
    val (h1, h2) = hashLong(value)
    mightContain(words, words.length * 64, h1, h2)
  }

  def mightContainString(encoded: String, value: String): Boolean = {
    val words = decode(encoded)
    val (h1, h2) = hashBytes(value.getBytes("UTF-8"))
    mightContain(words, words.length * 64, h1, h2)
  }

  /** Manifest form: base64 of the big-endian long words. */
  def encode(words: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(s: String): Array[Long] = {
    val bytes = Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** OR-composition for appends: valid only for equal-sized filters
    * (same nBits => same probe layout); None disables pruning for the
    * column — always safe. */
  def merge(a: String, b: String): Option[String] = {
    val wa = decode(a)
    val wb = decode(b)
    if (wa.length != wb.length) None
    else {
      var i = 0
      while (i < wa.length) { wa(i) |= wb(i); i += 1 }
      Some(encode(wa))
    }
  }
}

/** Native bloom-build aggregate: each partial aggregates its rows into a
  * primitive bit array map-side, partials OR-merge, and the final buffer
  * surfaces as BinaryType — one filter per group in the same stats job
  * that already computes the bucket's count/checksum/min/max. Longs hash
  * by value, strings by UTF-8 bytes; nulls are skipped (a null never
  * matches an equality predicate). */
case class IceliteBloomAgg(child: Expression, nBits: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(nBits >= 64 && (nBits & 63) == 0,
    s"nBits must be a positive multiple of 64, got $nBits")
  // child is unresolved at construction; resolve the type lazily
  private lazy val isString = child.dataType == StringType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "icelite_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) =
        if (isString)
          IceliteBloom.hashBytes(v.asInstanceOf[UTF8String].getBytes)
        else IceliteBloom.hashLong(v match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case s: java.lang.Short => s.longValue()
          case o => o.toString.toLong
        })
      IceliteBloom.add(b, nBits, h1, h2)
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(b: Array[Long]): Array[Byte] =
    eval(b).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): IceliteBloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IceliteBloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}
