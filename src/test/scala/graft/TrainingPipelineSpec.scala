package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Ops

/** Training-pipeline assembly operators: benchmark decontamination,
  * deterministic mixture sampling, sequence packing. */
class TrainingPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // ---------------------------------------------------------------- decontaminate

  test("decontaminate flags eval docs fully and leaves disjoint docs clean") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // = eval doc 101
      (2L, "one two three four five six seven"), // no overlap
      (3L, "xx alpha beta gamma delta epsilon yy") // one shared 5-gram
    ).toDF("doc_id", "text")
    val eval = Seq((101L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Ops.decontaminate(spark, train, eval, shingle = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // doc 1 IS the eval doc: both of its 5-grams are contaminated.
    assert(out(1L) == ((2L, true)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((0L, false)))
    // doc 3 shares exactly the 'alpha beta gamma delta epsilon' 5-gram.
    assert(out(3L) == ((1L, true)))
  }

  test("decontaminate fast path equals the shuffle formulation; zero exchanges") {
    val eval = docs.filter(col("doc_id") % 23 === 0)
    val fast = Ops.decontaminate(spark, docs, eval)
    val shuffle = Ops.decontaminateShuffle(spark, docs, eval)
    val a = fast.collect().map(_.toString).sorted
    val b = shuffle.collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(fast.filter(col("contaminated")).count() > 0)
    // The fast path probes a broadcast sorted array per row: the corpus
    // must cross ZERO exchanges.
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("decontaminate null text counts as clean on both paths") {
    import spark.implicits._
    val train = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val eval = Seq((9L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    for (out <- Seq(Ops.decontaminate(spark, train, eval),
                    Ops.decontaminateShuffle(spark, train, eval))) {
      val m = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(m(2L) == ((0L, false)), m.toString)
      assert(m(1L)._2)
    }
  }

  test("decontaminate with empty eval set marks nothing") {
    import spark.implicits._
    val eval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Ops.decontaminate(spark, docs, eval)
    assert(out.count() == docs.count())
    assert(out.filter(col("contaminated")).count() == 0)
  }

  test("decontaminate self-scan flags every non-trivial doc") {
    // Every doc shares all its own n-grams with itself: n_hits must equal
    // the doc's own distinct-shingle count (shingle_fps is distinct).
    val out = Ops.decontaminate(spark, docs, docs, shingle = 5)
    val own = docs.selectExpr("doc_id",
      "size(shingle_fps(text, 5)) AS n_own")
    val mismatches = out.join(own, "doc_id")
      .filter(col("n_hits") < col("n_own")).count()
    assert(mismatches == 0)
  }

  // ---------------------------------------------------------------- mixtureSample

  test("mixture sampling: integral weights copy exactly, omitted sources drop") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", "keep3"), (2L, "b", "keep3"),
      (3L, "c", "keep1"), (4L, "d", "dropped")
    ).toDF("doc_id", "text", "source")
    val out = Ops.mixtureSample(spark, d, Map("keep3" -> 3.0, "keep1" -> 1.0))
    val bySrc = out.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("keep3" -> 6L, "keep1" -> 1L))
    // copy indices are a complete 0..n_copies-1 sequence per doc
    val copies = out.filter(col("doc_id") === 1L)
      .select("copy").collect().map(_.getLong(0)).sorted
    assert(copies.sameElements(Array(0L, 1L, 2L)))
  }

  test("mixture sampling: fractional weight is deterministic and in-bounds") {
    val w = Map("src0" -> 0.5, "src1" -> 2.5)
    val a = Ops.mixtureSample(spark, docs, w).collect().map(_.toString).sorted
    val b = Ops.mixtureSample(spark, docs, w).collect().map(_.toString).sorted
    assert(a.sameElements(b)) // re-run reproduces exact copies
    val perDoc = Ops.mixtureSample(spark, docs, w)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n"))
    // 0.5 -> 0 or 1 copies (0-copy docs absent); 2.5 -> 2 or 3 copies
    assert(perDoc.filter(col("source") === "src0" && !col("n").isin(1)).count() == 0)
    assert(perDoc.filter(col("source") === "src1" && !col("n").isin(2, 3)).count() == 0)
    // fractional part actually splits: both 2- and 3-copy docs exist
    val n1 = perDoc.filter(col("source") === "src1" && col("n") === 2).count()
    val n2 = perDoc.filter(col("source") === "src1" && col("n") === 3).count()
    assert(n1 > 0 && n2 > 0, s"2-copy=$n1 3-copy=$n2")
  }

  test("mixture sampling: salt changes which docs round up, not the bounds") {
    // weight 0.5 on EVERY source, so the sample is ~half the corpus and
    // two salts agreeing exactly is astronomically unlikely.
    val srcs = docs.select("source").distinct().collect().map(_.getString(0))
    val w = srcs.map(_ -> 0.5).toMap
    val a = Ops.mixtureSample(spark, docs, w, salt = "mixA")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Ops.mixtureSample(spark, docs, w, salt = "mixB")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != b) // different salt, different (deterministic) sample
  }

  // ---------------------------------------------------------------- packSequences

  test("sequence packing conserves tokens and spans are consistent") {
    val L = 64
    val out = Ops.packSequences(spark, docs, seqLen = L, nShards = 4).cache()
    try {
      assert(out.count() == docs.count()) // every doc packed exactly once
      // Token conservation per shard: offsets tile [0, total) contiguously.
      val shards = out.groupBy("shard").agg(
        sum("n_tokens").as("total"),
        max(col("start_off") + col("n_tokens")).as("hi")).collect()
      assert(shards.nonEmpty)
      shards.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"shard ${r.get(0)}: $r")
      }
      // No two docs in a shard overlap: intervals are disjoint because
      // start offsets equal the running sum; check pairwise via window-free
      // aggregation (sum of lengths == max end == total).
      // Span arithmetic: seq ids follow from offsets.
      val bad = out.filter(
        col("seq_first") =!= expr(s"start_off DIV $L") ||
          (col("n_tokens") > 0 &&
            col("seq_last") =!= expr(s"(start_off + n_tokens - 1) DIV $L")) ||
          (col("n_tokens") > 0 &&
            col("n_seqs") =!= col("seq_last") - col("seq_first") + 1) ||
          (col("n_tokens") === 0 && col("n_seqs") =!= 0)).count()
      assert(bad == 0)
      // With a small L, boundary-spanning docs must exist.
      assert(out.filter(col("n_seqs") > 1).count() > 0)
    } finally out.unpersist(blocking = false)
  }

  test("sequence packing is independent of input partitioning and order") {
    val a = Ops.packSequences(spark, docs, seqLen = 128, nShards = 4)
      .collect().map(_.toString).sorted
    val b = Ops.packSequences(spark, docs.repartition(7).orderBy(desc("text")),
        seqLen = 128, nShards = 4)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("sequence packing handles zero-token and NULL-text docs") {
    import spark.implicits._
    val d = Seq((1L, "one two three"), (2L, ""), (3L, "   "), (4L, "four five"),
        (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Ops.packSequences(spark, d, seqLen = 4, nShards = 1).collect()
    assert(out.length == 5)
    val zero = out.filter(r => Set(2L, 3L, 5L)(r.getLong(0)))
    assert(zero.forall(r => !r.anyNull && r.getLong(2) == 0L && r.getLong(6) == 0L))
    // total offsets still conserve: max end == sum of tokens == 5
    assert(out.map(r => r.getLong(3) + r.getLong(2)).max == 5L)
  }
}
