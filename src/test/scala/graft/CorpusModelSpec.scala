package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Ops

/** Corpus-model operators: Stupid-Backoff LM scoring, BM25 retrieval,
  * SemDeDup semantic deduplication. */
class CorpusModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ---------------------------------------------------------------- lmScore

  /** (n_tokens, n_tri, n_bi, n_uni, n_oov, score_fp) by doc. */
  private def lmMap(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)))).toMap

  test("lmScore hand oracle: trigram hits on the training doc itself") {
    import spark.implicits._
    // train corpus "a b c a b c": c1(a)=c1(b)=c1(c)=2, N=6,
    // c2("a b")=c2("b c")=2, c2("c a")=1, c3("a b c")=2, others 1.
    val d = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val out = lmMap(Ops.lmScore(spark, d, lit(true)))
    // j=0: uni 2/6 -> 333333; j=1: bi 2/2 (no backoff at j=1) -> 1000000;
    // j=2..5: tri 2/2, 1/2, 1/1, 2/2 -> 1000000, 500000, 1000000, 1000000.
    assert(out(1L) == ((6L, 4L, 1L, 1L, 0L,
      333333L + 1000000L + 1000000L + 500000L + 1000000L + 1000000L)), out(1L))
  }

  test("lmScore backoff ladder: alpha at each level, OOV scores zero") {
    import spark.implicits._
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    def score(text: String): (Long, Long, Long, Long, Long, Long) = {
      val all = train.union(Seq((2L, text)).toDF("doc_id", "text"))
      lmMap(Ops.lmScore(spark, all, col("doc_id") === 1))(2L)
    }
    // "a b x": j=0 uni 1/4; j=1 bi 1/1; j=2 tri/bi/uni all unseen -> oov.
    assert(score("a b x") == ((3L, 0L, 1L, 1L, 1L, 250000L + 1000000L + 0L)))
    // "x c d": j=1 backs off to the unigram level (0.4 * 1/4 = 100000),
    // j=2 to the bigram level (0.4 * 1/1 = 400000).
    assert(score("x c d") == ((3L, 0L, 1L, 1L, 1L, 500000L)))
    // "x x d": j=2 backs off twice -> 0.4 * (0.4 * (1/4)) = 40000.
    assert(score("x x d") == ((3L, 0L, 0L, 1L, 2L, 40000L)))
    // "c d x y": j=1 bigram "c d" at the NO-alpha sentence-start level.
    assert(score("c d x y") == ((4L, 0L, 1L, 1L, 2L, 250000L + 1000000L)))
  }

  test("lmScore keeps zero-token and null-text documents with zero counts") {
    import spark.implicits._
    val d = Seq((1L, "a b c"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = lmMap(Ops.lmScore(spark, d, lit(true)))
    assert(out(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(1L)._1 == 3L)
  }

  test("lmScore fast path equals the shuffle formulation; zero exchanges") {
    val fast = Ops.lmScore(spark, docs, col("doc_id") % 3 =!= 0)
    val shuffle = Ops.lmScoreShuffle(spark, docs, col("doc_id") % 3 =!= 0)
    val a = fast.collect().map(_.toString).sorted
    val b = shuffle.collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // The fast path scores each document in one broadcast-dictionary
    // kernel pass: the corpus must cross ZERO exchanges.
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("lmScore fast path handles null text like the shuffle path") {
    import spark.implicits._
    val d = Seq((1L, "a b c a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    for (out <- Seq(Ops.lmScore(spark, d, lit(true)),
                    Ops.lmScoreShuffle(spark, d, lit(true)))) {
      val m = lmMap(out)
      assert(m(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)), m.toString)
      assert(m(1L)._1 == 6L)
    }
  }

  test("lmScore on the corpus: held-out docs exercise backoff, scores sane") {
    val out = Ops.lmScore(spark, docs, col("doc_id") % 3 =!= 0).cache()
    try {
      assert(out.count() == docs.count())
      // Training docs score every position at the trigram level.
      val trained = out.filter(col("doc_id") % 3 =!= 0)
        .filter(col("n_tokens") >= 3)
      assert(trained.filter(col("n_oov") > 0).count() == 0)
      // Held-out docs must hit lower levels somewhere (else the split is
      // leaking), and fixed-point scores stay within [0, 1e6 * n_tokens].
      val held = out.filter(col("doc_id") % 3 === 0)
      assert(held.filter(col("n_bi") + col("n_uni") + col("n_oov") > 0).count() > 0)
      assert(out.filter(col("score_fp") > col("n_tokens") * 1000000L).count() == 0)
      assert(out.filter(col("score_fp") < 0).count() == 0)
    } finally out.unpersist()
  }

  test("lmProbeFps aligns with shingleFps on seeded random texts") {
    // The probe<->count-table join is only correct if every probe fp
    // equals the shingleFps entry of the same n-gram — the property the
    // count tables are built from. Seeded random texts stress whitespace
    // runs, short docs, and repeated words.
    import graft.ops.TextKernel
    val r = new scala.util.Random(4242)
    val words = Vector("a", "bb", "ccc", "dd", "e", "spark", "x9", "zz")
    for (_ <- 0 until 500) {
      val n = r.nextInt(7) // 0..6 words
      val sep = if (r.nextBoolean()) " " else "  \t "
      val text = (0 until n).map(_ => words(r.nextInt(words.size)))
        .mkString(sep) + (if (r.nextBoolean()) " " else "")
      val p = TextKernel.lmProbeFps(text)
      val u = TextKernel.shingleFps(text, 1)
      val b = if (u.length >= 2) TextKernel.shingleFps(text, 2) else Array.emptyLongArray
      val t = if (u.length >= 3) TextKernel.shingleFps(text, 3) else Array.emptyLongArray
      assert(p.length == 5 * u.length, text)
      for (j <- u.indices) {
        assert(p(5 * j) == u(j))
        assert(p(5 * j + 1) == (if (j >= 1) u(j - 1) else -1L))
        assert(p(5 * j + 2) == (if (j >= 1) b(j - 1) else -1L))
        assert(p(5 * j + 3) == (if (j >= 2) b(j - 2) else -1L))
        assert(p(5 * j + 4) == (if (j >= 2) t(j - 2) else -1L))
      }
    }
  }

  test("lmScore fast path equals shuffle path on seeded random corpora") {
    import spark.implicits._
    val r = new scala.util.Random(777)
    val words = Vector("a", "b", "c", "d", "spark", "row")
    val corpus = (0 until 120).map { i =>
      val n = r.nextInt(9)
      (i.toLong, (0 until n).map(_ => words(r.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Ops.lmScore(spark, corpus, col("doc_id") % 2 === 0)
      .collect().map(_.toString).sorted
    val shuffle = Ops.lmScoreShuffle(spark, corpus, col("doc_id") % 2 === 0)
      .collect().map(_.toString).sorted
    assert(fast.sameElements(shuffle))
  }

  // ---------------------------------------------------------------- bm25TopK

  test("bm25TopK hand oracle: exact fixed-point scores and ranks") {
    import spark.implicits._
    val d = Seq((1L, "cat dog"), (2L, "cat cat fish"), (3L, "bird"))
      .toDF("doc_id", "text")
    val out = Ops.bm25TopK(spark, d, col("doc_id") === 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    // Replicate the documented arithmetic exactly (N=3, tot=6, avgdl=2).
    def idfFp(df: Long): Long =
      math.floor(1e9 * math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))).toLong
    def contrib(df: Long, tf: Long, dl: Long): Long =
      math.floor((idfFp(df) / 1000.0) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (6.0 / 3.0))))).toLong
    val d1 = contrib(2, 1, 2) + contrib(1, 1, 2) // cat + dog, own doc
    val d2 = contrib(2, 2, 3) // cat only
    assert(d1 > d2)
    assert(out.toSeq == Seq((1L, 1L, d1, 1L), (1L, 2L, d2, 2L)), out.toSeq)
  }

  test("bm25TopK breaks score ties by lower doc_id") {
    import spark.implicits._
    val d = Seq((5L, "cat dog"), (4L, "cat dog"), (9L, "fish"))
      .toDF("doc_id", "text")
    val out = Ops.bm25TopK(spark, d, col("doc_id") === 5, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(3))).sorted
    assert(out.toSeq == Seq((1L, 4L), (2L, 5L)), out.toSeq)
  }

  test("bm25TopK stop-list pruning drops ubiquitous terms from the index") {
    import spark.implicits._
    val d = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the cat cat"))
      .toDF("doc_id", "text")
    // 'the' has df = 3/3; at maxDfFrac = 0.9 it is pruned from the
    // index, so doc 2 (sharing only 'the' with the query) drops out.
    val full = Ops.bm25TopK(spark, d, col("doc_id") === 1)
    val pruned = Ops.bm25TopK(spark, d, col("doc_id") === 1, maxDfFrac = 0.9)
    assert(full.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(pruned.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("bm25TopK corpus invariants: contiguous ranks, ordered scores, k cut") {
    // NOTE: self-retrieval is NOT an invariant on this corpus — the synth
    // vocabulary is ~30 words shared by every document, so idf is near
    // zero and a query's own (possibly long) document legitimately loses
    // to short docs with higher tf of the same ubiquitous terms. The
    // hand-oracle tests above pin exact scoring; here we pin structure.
    val out = Ops.bm25TopK(spark, docs, col("doc_id") % 53 === 1, k = 10).cache()
    try {
      val nQueries = out.select("qid").distinct().count()
      assert(nQueries > 0)
      // k is honored and ranks are contiguous from 1.
      val byQ = out.groupBy("qid").agg(count(lit(1)).as("n"),
        min("rank").as("lo"), max("rank").as("hi"))
      assert(byQ.filter(col("n") > 10 || col("lo") =!= 1 ||
        col("hi") =!= col("n")).count() == 0)
      // Scores are non-increasing in rank within each query.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy("rank")
      val viol = out.withColumn("prev", lag("score_fp", 1).over(w))
        .filter(col("prev").isNotNull && col("score_fp") > col("prev"))
      assert(viol.count() == 0)
      // Deterministic across runs.
      val again = Ops.bm25TopK(spark, docs, col("doc_id") % 53 === 1, k = 10)
      assert(out.collect().map(_.toString).sorted
        .sameElements(again.collect().map(_.toString).sorted))
    } finally out.unpersist()
  }

  // ---------------------------------------------------------------- lrFilter

  private def qualityLabel =
    expr(s"CAST(floor((${Ops.qualitySql}) * 1000000) AS BIGINT) >= 750000")

  test("lrFilter learns: accuracy beats the majority prior") {
    val out = Ops.lrFilter(spark, docs, qualityLabel).cache()
    try {
      val n = out.count()
      val pos = out.filter(col("label")).count()
      val prior = math.max(pos, n - pos).toDouble / n
      val correct = out.filter(col("label") === col("pred")).count()
      assert(correct.toDouble / n > prior + 0.02,
        s"acc=${correct.toDouble / n} prior=$prior")
    } finally out.unpersist()
  }

  test("lrFilter is deterministic under repartitioning (integer gradients)") {
    val a = Ops.lrFilter(spark, docs.repartition(7), qualityLabel)
      .collect().map(_.toString).sorted
    val b = Ops.lrFilter(spark, docs.repartition(2), qualityLabel)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("lrFilter with zero iterations scores everything at z = 0") {
    val out = Ops.lrFilter(spark, docs, qualityLabel, iters = 0)
    assert(out.filter(col("z_fp") =!= 0L || !col("pred")).count() == 0)
  }

  // ---------------------------------------------------------------- semDedup

  test("semDedup: dropped vectors have a lower-id near neighbor in-cluster") {
    val out = Ops.semDedup(spark, embeddings, nClusters = 16, tau = 0.35).cache()
    try {
      assert(out.count() == embeddings.count())
      val dropped = out.filter(!col("kept"))
      assert(dropped.count() > 0, "tau=0.35 should drop some vectors here")
      // Brute-force re-derivation of the pair predicate: every dropped
      // vector must have >= 1 lower-id same-cluster neighbor at tau, every
      // kept vector none, and n_near must equal the brute count.
      val asg = out.select(col("vec_id"), col("cid"))
        .join(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
      val a = asg.select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_vec"))
      val b = asg.select(col("cid"), col("vec_id").as("b_id"),
        col("embedding").as("b_vec"))
      val brute = a.join(b, Seq("cid"))
        .where(col("a_id") < col("b_id") &&
          expr("cosine_similarity(a_vec, b_vec)") >= 0.35)
        .groupBy(col("b_id").as("vec_id")).agg(count(lit(1)).as("n_brute"))
      val joined = out.join(brute, Seq("vec_id"), "left")
        .select(col("vec_id"), col("kept"), col("n_near"),
          coalesce(col("n_brute"), lit(0L)).as("n_brute"))
      assert(joined.filter(col("n_near") =!= col("n_brute")).count() == 0)
      assert(joined.filter(col("kept") && col("n_brute") > 0).count() == 0)
      assert(joined.filter(!col("kept") && col("n_brute") === 0).count() == 0)
    } finally out.unpersist()
  }

  // ---------------------------------------------------------------- kmeans

  test("kmeans: Lloyd rounds never degrade the mean cosine objective") {
    val base = Ops.kmeans(spark, embeddings, nClusters = 8, rounds = 0)
    val refined = Ops.kmeans(spark, embeddings, nClusters = 8, rounds = 2)
    assert(refined.count() == embeddings.count())
    assert(refined.filter(col("cid") < 0 || col("cid") >= 8).count() == 0)
    val m0 = base.agg(avg("sim_fp")).collect()(0).getDouble(0)
    val m2 = refined.agg(avg("sim_fp")).collect()(0).getDouble(0)
    // Spherical Lloyd is monotone in the mean-cosine objective (the mean
    // points along the argmax direction); allow one fixed-point unit for
    // quantization.
    assert(m2 >= m0 - 1.0, s"rounds=2 mean $m2 < rounds=0 mean $m0")
  }

  test("kmeans is deterministic under repartitioning (integer coord sums)") {
    val a = Ops.kmeans(spark, embeddings.repartition(5), nClusters = 8, rounds = 2)
      .collect().map(_.toString).sorted
    val b = Ops.kmeans(spark, embeddings.repartition(2), nClusters = 8, rounds = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("semDedup over Lloyd-refined clusters: invariants and determinism") {
    val out = Ops.semDedup(spark, embeddings, nClusters = 8, tau = 0.35,
      lloydRounds = 2).cache()
    try {
      assert(out.count() == embeddings.count())
      // kept <=> n_near == 0, cluster ids in the refined 0..k-1 namespace.
      assert(out.filter(col("kept") =!= (col("n_near") === 0L)).count() == 0)
      assert(out.filter(col("cid") < 0 || col("cid") >= 8).count() == 0)
      val again = Ops.semDedup(spark, embeddings.repartition(3),
        nClusters = 8, tau = 0.35, lloydRounds = 2)
      assert(out.collect().map(_.toString).sorted
        .sameElements(again.collect().map(_.toString).sorted))
    } finally out.unpersist()
  }

  test("semDedup is deterministic and assignment is exchange-free") {
    val o1 = Ops.semDedup(spark, embeddings, nClusters = 8, tau = 0.35)
    val o2 = Ops.semDedup(spark, embeddings, nClusters = 8, tau = 0.35)
    assert(o1.collect().map(_.toString).sorted
      .sameElements(o2.collect().map(_.toString).sorted))
    // The centroid assignment itself is a map-side broadcast kernel: the
    // embeddings scan must reach the first aggregation without any
    // exchange caused by assignment (the only exchanges in the full plan
    // are the by-cid pair join and the final groupBy).
    val plan = o1.queryExecution.executedPlan.toString
    assert(plan.contains("NearestCentroids") || plan.contains("explode"), plan)
  }
}
