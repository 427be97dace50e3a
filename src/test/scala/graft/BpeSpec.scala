package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bpe, BpeModel, Ops, TextKernel}

/** BPE tokenizer: hand-computed training oracle, greedy-merge overlap
  * semantics, encode determinism, cap totality. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ------------------------------------------------------------- mergePass

  test("mergePass is greedy left-to-right non-overlapping") {
    def syms(w: String) = w.map(_.toString).toArray
    assert(Bpe.mergePass(syms("aaaa"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.mergePass(syms("aaa"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.mergePass(syms("aaaaa"), "a", "a").toSeq == Seq("aa", "aa", "a"))
    assert(Bpe.mergePass(syms("xaab"), "a", "a").toSeq == Seq("x", "aa", "b"))
    // a merged symbol is NOT re-examined within the pass
    assert(Bpe.mergePass(Array("a", "a", "b"), "a", "a").toSeq == Seq("aa", "b"))
    assert(Bpe.mergePass(Array("aa", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.mergePass(syms("b"), "a", "a").toSeq == Seq("b"))
    assert(Bpe.mergePass(Array.empty[String], "a", "a").isEmpty)
  }

  // ----------------------------------------------------------------- train

  test("train matches the hand-computed Sennrich example") {
    // {low:5, lower:2, newest:6, widest:3} — every merge, count and
    // tie-break computed by hand (ties resolve to the smallest (lhs,
    // rhs) in binary order).
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val expected = Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L),
      ("e", "w", 6L), ("ew", "est", 6L), ("n", "ewest", 6L),
      ("d", "est", 3L), ("i", "dest", 3L), ("w", "idest", 3L),
      ("e", "r", 2L), ("low", "er", 2L))
    assert(Bpe.train(dict, 20).toSeq == expected) // stops dry at 12
    assert(Bpe.train(dict, 5).toSeq == expected.take(5))
    // input order must not matter
    assert(Bpe.train(dict.reverse, 20).toSeq == expected)
  }

  test("train counts overlapping pair positions and stops under minPair") {
    // "aaa" x1: (a,a) counted at BOTH positions -> cnt 2 >= minPair.
    assert(Bpe.train(Array(("aaa", 1L)), 4).toSeq ==
      Seq(("a", "a", 2L))) // after the merge: [aa, a] -> (aa,a) cnt 1 < 2
    assert(Bpe.train(Array(("ab", 1L)), 4, minPair = 2L).isEmpty)
  }

  // ----------------------------------------------------------------- model

  test("model rep replays the training trajectory for dict words") {
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(dict, 20)
    val model = new BpeModel(merges.map(_._1), merges.map(_._2))
    assert(model.rep("low") == ";low")
    assert(model.rep("lower") == ";lower") // merge 12 (low,er) applies
    assert(model.rep("newest") == ";newest")
    assert(model.rep("widest") == ";widest")
    // OOV word: merges apply where they can, characters elsewhere
    assert(model.rep("lowest") == ";low;est")
    assert(model.rep("zq") == ";z;q")
    assert(model.tokens(";low;er") == 2L)
    // rank-11-only model (before (low,er) trains): 'lower' stays split
    val m11 = new BpeModel(merges.take(11).map(_._1), merges.take(11).map(_._2))
    assert(m11.rep("lower") == ";low;er")
  }

  // ------------------------------------------------------------ encodeDoc

  test("encodeDoc folds the concatenated reps with stringFp arithmetic") {
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(dict, 20)
    val model = new BpeModel(merges.map(_._1), merges.map(_._2))
    val row = Bpe.encodeDoc(
      org.apache.spark.unsafe.types.UTF8String.fromString("low  lower\tlow"),
      model)
    assert(row.getLong(0) == 3L) // ;low ;lower ;low
    assert(row.getLong(1) == TextKernel.stringFp(";low;lower;low"))
    val empty = Bpe.encodeDoc(
      org.apache.spark.unsafe.types.UTF8String.fromString("   "), model)
    assert(empty.getLong(0) == 0L)
    assert(empty.getLong(1) == 5381L)
  }

  // ------------------------------------------------------------ Spark end

  private def corpus = Seq(
    (0L, "low low low low low lower lower"),
    (1L, "newest newest newest widest widest"),
    (2L, "newest newest newest widest"),
    (3L, ""),
    (4L, "lowest zq")).toDF("doc_id", "text")

  test("bpeMerges equals driver-side train on the aggregated dict") {
    val got = Ops.bpeMerges(spark, corpus, nMerges = 20)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dict = corpus.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = Bpe.train(dict, 20).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("bpeEncode is deterministic under repartitioning and total") {
    val a = Ops.bpeEncode(spark, corpus, nMerges = 8)
      .orderBy("doc_id").collect().map(_.toString)
    val b = Ops.bpeEncode(spark, corpus.repartition(7), nMerges = 8)
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
    val rows = Ops.bpeEncode(spark, corpus, nMerges = 8)
      .orderBy("doc_id").collect()
    assert(rows.length == 5) // empty doc kept
    assert(rows(3).getLong(1) == 0L && rows(3).getLong(2) == 5381L)
    assert(rows.forall(r => r.getLong(1) >= 0L))
  }

  test("encode stage crosses zero exchanges") {
    // Training aggregates once; the ENCODE frame itself is a pure
    // codegen scan — the corpus must not shuffle to be tokenized. A
    // range-derived corpus keeps the plan distributed (a local Seq
    // constant-folds to LocalTableScan and would pin nothing).
    val dist = spark.range(0, 64, 1, 4).selectExpr("id AS doc_id",
      "concat('low low lower newest', CASE WHEN id % 2 = 0 THEN ' widest' ELSE '' END) AS text")
    val enc = Ops.bpeEncode(spark, dist, nMerges = 8)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // "*(1)" is the whole-stage-codegen stage marker in the compact
    // plan rendering — the encode expression stays inside codegen.
    assert(plan.contains("*(1) Project"), plan)
  }

  test("capped dictionary keeps encoding total") {
    // cap=1: training sees only the most frequent word; every other
    // word still tokenizes (characters as base symbols, no UNK).
    val enc = Ops.bpeEncode(spark, corpus, nMerges = 8, cap = 1)
      .orderBy("doc_id").collect()
    assert(enc.length == 5)
    assert(enc.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    // doc 4 ("lowest zq") is all-OOV under cap=1 unless 'low' merges
    // cover it; token count must be >= word count (2) and <= char count
    val t4 = enc(4).getLong(1)
    assert(t4 >= 2L && t4 <= 8L)
  }
}
