package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Ops

/** Repeated-substring (span-level) exact dedup: hand-computed span
  * expectations the mirrored oracle cannot provide (both sides would share
  * a semantics bug). */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def spans(rows: Seq[(Long, String)], window: Int = 3) = {
    import spark.implicits._
    Ops.dedupSpans(spark, rows.toDF("doc_id", "text"), window = window)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
  }

  test("cross-doc repeated window becomes one exact span; unique text is clean") {
    // docs 1 and 2 share exactly 'c d e' (one 3-gram); doc 3 is unique.
    val out = spans(Seq(
      (1L, "a b c d e f g"),
      (2L, "x y c d e z w"),
      (3L, "p q r s t u v")))
    // window at pos 2 covers tokens [2,4] in both docs.
    assert(out.toSeq == Seq((1L, 1L, 2L, 4L, 1L), (2L, 1L, 2L, 4L, 1L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // 'c d e f' shared: windows at pos 2 and 3 of doc 1 overlap -> merged
    // [2,5]; doc 2 has them at pos 0,1 -> merged [0,3].
    val out = spans(Seq(
      (1L, "a b c d e f g"),
      (2L, "c d e f z w q")))
    assert(out.toSeq == Seq((1L, 1L, 2L, 5L, 2L), (2L, 1L, 0L, 3L, 2L)))
  }

  test("disjoint duplicated regions stay separate spans with increasing ids") {
    // doc 1 shares 'a b c' with doc 2 (pos 0) and 'x y z' with doc 3
    // (pos 5) with an unshared gap between them.
    val out = spans(Seq(
      (1L, "a b c m n x y z"),
      (2L, "a b c q1 q2 q3 q4 q5"),
      (3L, "r1 r2 r3 r4 r5 x y z")))
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 1L, 0L, 2L, 1L), (1L, 2L, 5L, 7L, 1L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 0L, 2L, 1L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 1L, 5L, 7L, 1L)))
  }

  test("within-doc repetition alone reaches the count threshold") {
    // 'a b c' occurs twice inside ONE doc (pos 0 and pos 4) — global
    // occurrence count is 2, so both windows flag and stay disjoint.
    val out = spans(Seq((1L, "a b c z a b c")))
    assert(out.toSeq == Seq((1L, 1L, 0L, 2L, 1L), (1L, 2L, 4L, 6L, 1L)))
  }

  test("sub-window whole-doc duplicates span the full short doc") {
    // 2-word docs under a 3-word window hash as one whole-doc window;
    // exact duplicate short docs -> full-doc span [0, n_words-1].
    val out = spans(Seq(
      (1L, "hi there"),
      (2L, "hi there"),
      (3L, "only once here")))
    assert(out.toSeq == Seq((1L, 1L, 0L, 1L, 1L), (2L, 1L, 0L, 1L, 1L)))
  }

  test("adjacent (gap-free but non-overlapping) windows merge") {
    // 'a b c' (pos 0, ends 2) and 'd e f' (pos 3, starts 3) are adjacent:
    // contiguous duplicated text must merge into [0,5], not two spans.
    val out = spans(Seq(
      (1L, "a b c d e f"),
      (2L, "a b c z z z"),
      (3L, "z q d e f q")))
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 1L, 0L, 5L, 2L)))
  }

  test("minCount raises the duplication threshold") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c x x x"), (2L, "a b c y y y"), (3L, "a b c z z z"),
      (4L, "p q r m m m"), (5L, "p q r n n n")).toDF("doc_id", "text")
    val out = Ops.dedupSpans(spark, d, window = 3, minCount = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.sameElements(Array(1L, 2L, 3L))) // 'p q r' only occurs twice
  }

  test("deterministic under repartitioning and row order") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Ops.dedupSpans(spark, docs, window = 4)
      .collect().map(_.toString).sorted
    val b = Ops.dedupSpans(spark, docs.repartition(13).orderBy(desc("text")), window = 4)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }
}
