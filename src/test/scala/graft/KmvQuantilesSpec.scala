package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{KmvBuf, Ops, TextKernel}

/** KMV distinct sketch + exact quantiles: buffer invariants, merge
  * associativity, exact-vs-estimate accuracy, repartition determinism,
  * and the brute-force quantile reference. */
class KmvQuantilesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // --------------------------------------------------------------- KmvBuf

  test("KmvBuf keeps the k smallest distinct values, sorted") {
    val b = new KmvBuf(4)
    Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 2L).foreach(b.add)
    assert(b.size == 4 && b.hs.take(4).toSeq == Seq(1L, 2L, 3L, 7L))
    b.add(0L)
    assert(b.hs.take(4).toSeq == Seq(0L, 1L, 2L, 3L))
    b.add(5L) // above current max: ignored
    assert(b.hs.take(4).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("KmvBuf merge of halves equals the whole (randomized)") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 50) {
      val xs = Array.fill(200)(rnd.nextInt(500).toLong)
      val whole = new KmvBuf(16)
      xs.foreach(whole.add)
      val a = new KmvBuf(16)
      val b = new KmvBuf(16)
      xs.take(100).foreach(a.add)
      xs.drop(100).foreach(b.add)
      a.mergeFrom(b)
      assert(a.size == whole.size &&
        a.hs.take(a.size).toSeq == whole.hs.take(whole.size).toSeq)
    }
  }

  // ------------------------------------------------------- approxDistinct

  test("approxDistinct is exact below k and accurate above it") {
    // group "small": 40 distinct values (< k=256 -> exact);
    // group "big": 5000 distinct values (KMV estimate, stderr ~6%).
    val rows =
      (0 until 40).map(i => ("small", s"value-$i")) ++
        (0 until 20000).map(i => ("big", s"text-${i % 5000}"))
    val df = rows.toDF("grp", "v").repartition(8)
    val got = Ops.approxDistinct(spark, df, "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("small") == 40L)
    val err = math.abs(got("big") - 5000.0) / 5000.0
    assert(err < 0.1, s"estimate ${got("big")} for 5000 (err $err)")
  }

  test("approxDistinct is invariant to partitioning and row order") {
    val rows = (0 until 10000).map(i => ("g", s"doc-${(i * 37) % 3000}"))
    val a = Ops.approxDistinct(spark, rows.toDF("grp", "v"), "grp", "v")
      .collect().map(_.getLong(1)).head
    val b = Ops.approxDistinct(spark,
        rows.reverse.toDF("grp", "v").repartition(17), "grp", "v")
      .collect().map(_.getLong(1)).head
    assert(a == b)
  }

  test("fp2 is independent of fp and both stay in [0, P)") {
    val P = TextKernel.P
    for (s <- Seq("", "a", "hello world", "text-4999", "https://x.example/p")) {
      val a = TextKernel.stringFp(s)
      val b = TextKernel.stringFp2(s)
      assert(a >= 0 && a < P && b >= 0 && b < P)
    }
    assert(TextKernel.stringFp2("hello") != TextKernel.stringFp("hello"))
    assert(TextKernel.stringFp2("") == 0L) // seed 0 (oracle list_prepend)
    // Lehmer-composite stays in [1, P^2] (BIGINT-safe in both engines)
    val a = TextKernel.stringFp("x"); val c = TextKernel.stringFp2("x")
    val m1 = (((a * 48271 + c) % P) * 48271 + a) % P
    val m2 = (((c * 16807 + a) % P) * 16807 + c) % P
    val h = m1 * P + m2 + 1
    assert(h >= 1 && h <= P * P)
  }

  // ------------------------------------------------------- exactQuantiles

  test("exactQuantiles matches the sorted brute-force lower quantile") {
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(5000)(rnd.nextInt(400).toLong)
    val qs = Seq(100, 250, 500, 750, 900, 990, 1000)
    val got = Ops.exactQuantiles(spark, xs.toSeq.toDF("x"), "x", qs)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sorted = xs.sorted
    val expected = qs.map { q =>
      val need = ((q.toLong * xs.length + 999L) / 1000L).toInt
      q -> sorted(need - 1)
    }.toMap
    assert(got == expected)
    assert(got(1000) == sorted.last)
  }

  test("exactQuantiles drops nulls and rejects all-null input") {
    val df = Seq[java.lang.Long](1L, null, 2L, null, 3L, 4L).toDF("x")
    val got = Ops.exactQuantiles(spark, df, "x", Seq(500, 1000))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(500 -> 2L, 1000 -> 4L))
    intercept[IllegalArgumentException] {
      Ops.exactQuantiles(spark,
        Seq[java.lang.Long](null, null).toDF("x"), "x", Seq(500))
    }
  }

  test("exactQuantiles refuses unbounded cardinality") {
    val df = spark.range(0, 1000).selectExpr("id AS x")
    intercept[IllegalArgumentException] {
      Ops.exactQuantiles(spark, df, "x", Seq(500), maxDistinct = 100)
    }
  }
}
