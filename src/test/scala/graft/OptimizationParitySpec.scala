package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Ops, OpsFunctions}

/** Bit-equality pins for the r6 optimization rewrites: every replaced
  * formulation is re-expressed here in its r5 form and compared row-for-row
  * against the optimized operator, on corpora that include the whitespace /
  * empty-token edge cases the split-parity kernels must honor. */
class OptimizationParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def trickyDocs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g a b c d e f g"),
      (2L, "the quick brown fox, the quick brown fox! 42 times."),
      (3L, ""),
      (4L, "   "),
      (5L, "\tleading tab"),
      (6L, "trailing tab\t"),
      (7L, "line one\nline one\nline two"),
      (8L, null.asInstanceOf[String]),
      (9L, "xy vertical\ftab and\rcarriage"),
      (10L, "THE Quick BROWN: of to in is it 123 456.77"),
      (11L, "one"),
      (12L, "a  b   c")).toDF("doc_id", "text")
  }

  // --------------------------------------------------------- dedup_spans

  /** The r5 window formulation of dedupSpans, verbatim (the de-skewed
    * two-level count + join-back must be bit-equal to it). */
  private def dedupSpansWindowed(docs: DataFrame, window: Int,
                                 minCount: Long): DataFrame = {
    OpsFunctions.register(spark)
    val occ = docs.select(
        col("doc_id"),
        expr("word_count(text)").as("n_words"),
        posexplode(expr(s"shingle_fps_pos(text, $window)")).as(Seq("pos", "fp")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        least(col("pos") + lit(window - 1), col("n_words") - 1)
          .cast("long").as("w_end"),
        col("fp"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    occ
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("n_occ") >= minCount)
      .select("doc_id", "pos", "w_end")
      .withColumn("pmax",
        max("w_end").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("pos") > col("pmax") + 1, 1L).otherwise(0L))
      .withColumn("span_id",
        sum("brk").over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "span_id")
      .agg(min("pos").as("start_tok"), max("w_end").as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_id", "start_tok", "end_tok", "n_windows")
  }

  test("dedupSpans two-level count equals the r5 window formulation " +
      "on both attach paths") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = dedupSpansWindowed(docs, window = 4, minCount = 2)
      .collect().map(_.toString).sorted
    val broadcastPath = Ops.dedupSpans(spark, docs, window = 4)
      .collect().map(_.toString).sorted
    val shufflePath = Ops.dedupSpans(spark, docs, window = 4,
        broadcastMaxFps = -1)
      .collect().map(_.toString).sorted
    assert(expected.nonEmpty)
    assert(broadcastPath.sameElements(expected))
    assert(shufflePath.sameElements(expected))
  }

  test("dedupSpans plan has no Window on fp (the de-skew)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Ops.dedupSpans(spark, docs, window = 4)
      .queryExecution.executedPlan.toString
    // The only window left partitions by doc_id (span merge); the fp
    // occurrence count must be a hash aggregate, not a window.
    assert(!plan.contains("windowspecdefinition(fp"))
  }

  // --------------------------------------------------- split-parity kernels

  test("split_word_count equals size(split(trim(text), '\\s+')) exactly") {
    OpsFunctions.register(spark)
    val got = trickyDocs.selectExpr(
      "doc_id",
      "split_word_count(text) AS k",
      "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS s").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch at ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"count mismatch at ${r.get(0)}")
    }
  }

  test("text_quality_stats equals the r5 SQL count formulations exactly") {
    OpsFunctions.register(spark)
    val stopArr = graft.ops.OpsKernel.QualityStopwords
      .map(s => s"'$s'").mkString("array(", ",", ")")
    val got = trickyDocs.selectExpr(
      "doc_id",
      "text_quality_stats(text) AS q",
      "CAST(length(text) AS BIGINT) AS e_chars",
      "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS e_words",
      s"CAST(size(filter(split(lower(trim(text)), '\\\\s+'), w -> array_contains($stopArr, w))) AS BIGINT) AS e_stop",
      "CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS BIGINT) AS e_digit",
      "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS BIGINT) AS e_punct").collect()
    got.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(1))
      else {
        val q = r.getStruct(1)
        assert(q.getLong(0) == r.getLong(2), s"n_chars at ${r.get(0)}")
        assert(q.getLong(1) == r.getLong(3), s"n_words at ${r.get(0)}")
        assert(q.getLong(2) == r.getLong(4), s"n_stop at ${r.get(0)}")
        assert(q.getLong(3) == r.getLong(5), s"n_digit at ${r.get(0)}")
        assert(q.getLong(4) == r.getLong(6), s"n_punct at ${r.get(0)}")
      }
    }
  }

  test("lm_gram_fps count table equals the three-scan shingle union") {
    OpsFunctions.register(spark)
    val docs = trickyDocs
    def gramsOld(k: Int): DataFrame = {
      val fps =
        if (k == 1) expr("shingle_fps_pos(text, 1)")
        else expr(s"CASE WHEN word_count(text) >= $k THEN shingle_fps_pos(text, $k) " +
          "ELSE CAST(array() AS ARRAY<BIGINT>) END")
      docs.select(explode(fps).as("fp")).withColumn("kind", lit(k))
    }
    val old = gramsOld(1).unionByName(gramsOld(2)).unionByName(gramsOld(3))
      .groupBy("kind", "fp").agg(count(lit(1)).as("cnt"))
      .collect().map(_.toString).sorted
    val neu = docs.select(explode(expr("lm_gram_fps(text)")).as("p"))
      .select(shiftright(col("p"), 32).cast("int").as("kind"),
        col("p").bitwiseAND(lit(4294967295L)).as("fp"))
      .groupBy("kind", "fp").agg(count(lit(1)).as("cnt"))
      .collect().map(_.toString).sorted
    assert(old.nonEmpty && neu.sameElements(old))
  }

  test("word_count_pairs sums equal the explode + filter formulation") {
    OpsFunctions.register(spark)
    val docs = trickyDocs
    val old = docs.select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(_.toString).sorted
    val neu = docs.selectExpr("inline(word_count_pairs(text))")
      .groupBy("word").agg(sum("cnt").as("cnt"))
      .collect().map(_.toString).sorted
    assert(old.nonEmpty && neu.sameElements(old))
  }

  test("line_fps equals explode(split)+doc_fingerprint, plain and salted") {
    OpsFunctions.register(spark)
    val docs = trickyDocs.withColumn("domain",
      concat(lit("site"), (col("doc_id") % 3).cast("string")))
    val oldPlain = docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .selectExpr("doc_id", "pos", "doc_fingerprint(line) AS fp")
      .collect().map(_.toString).sorted
    val newPlain = docs.select(col("doc_id"),
        posexplode(expr("line_fps(text, -1)")).as(Seq("pos", "fp")))
      .selectExpr("doc_id", "pos", "fp")
      .collect().map(_.toString).sorted
    assert(oldPlain.nonEmpty && newPlain.sameElements(oldPlain))
    val oldSalted = docs.select(col("doc_id"), col("domain"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .selectExpr("doc_id",
        "(doc_fingerprint(domain) * 48271 + doc_fingerprint(line)) % 2147483647 AS k")
      .collect().map(_.toString).sorted
    val newSalted = docs
      .select(col("doc_id"),
        explode(expr("line_fps(text, doc_fingerprint(domain))")).as("k"))
      .collect().map(_.toString).sorted
    assert(newSalted.sameElements(oldSalted))
  }

  test("rolling shingle fingerprints equal the left-fold definition") {
    // Direct re-derivation: fp of words [i, i+k) = stringFp of the words
    // joined by one space — the rolling prefix-hash form must match it
    // bit-for-bit on adversarial word-length mixes.
    val rnd = new scala.util.Random(42)
    val texts = (1 to 200).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(7)).mkString)
        .mkString(sep = if (rnd.nextBoolean()) " " else "\t")
    } :+ "" :+ "a" :+ "  x  " :+ "ab\ncd ef\tgh"
    for (t <- texts; k <- Seq(1, 2, 3, 5, 20)) {
      val got = graft.ops.TextKernel.shingleFps(t, k).toSeq
      val words = t.split("\\s+").filter(_.nonEmpty).toSeq
      val exp =
        if (words.isEmpty) Seq.empty
        else if (words.length < k)
          Seq(graft.ops.TextKernel.stringFp(words.mkString(" ")))
        else words.sliding(k).map(w =>
          graft.ops.TextKernel.stringFp(w.mkString(" "))).toSeq
      assert(got == exp, s"k=$k text='$t'")
    }
  }

  test("qualityScore values and schema are unchanged by the kernel") {
    val docs = trickyDocs.filter(col("text").isNotNull)
    val stopArr = graft.ops.OpsKernel.QualityStopwords
      .map(s => s"'$s'").mkString("array(", ",", ")")
    val r5 = docs.selectExpr(
      "doc_id",
      "length(text) AS n_chars",
      "size(split(trim(text), '\\\\s+')) AS n_words",
      "(length(text) - length(regexp_replace(text, '[.,;:!?]', ''))) / greatest(length(text), 1) AS punct_ratio",
      "(length(text) - length(regexp_replace(text, '[0-9]', ''))) / greatest(length(text), 1) AS digit_ratio",
      s"""size(filter(split(lower(trim(text)), '\\\\s+'), w -> array_contains($stopArr, w)))
         / greatest(size(split(trim(text), '\\\\s+')), 1) AS stopword_ratio""")
      .withColumn("quality",
        greatest(lit(0.0), least(lit(1.0),
          lit(0.5)
            + col("stopword_ratio") * 1.5
            - col("digit_ratio") * 2.0
            - greatest(col("punct_ratio") - lit(0.1), lit(0.0)) * 3.0
            + when(col("n_words") >= 20 && col("n_words") <= 5000, 0.2).otherwise(-0.2))))
    val neu = Ops.qualityScore(docs)
    assert(neu.schema.map(f => (f.name, f.dataType)) ==
      r5.schema.map(f => (f.name, f.dataType)))
    val a = r5.collect().map(_.toString).sorted
    val b = neu.collect().map(_.toString).sorted
    assert(a.nonEmpty && b.sameElements(a))
  }

  test("funnel plan stays linear in steps (frontier checkpoint)") {
    import spark.implicits._
    val events = (1 to 200).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
        (i % 10).toLong,
        Seq("view", "click", "purchase", "signup", "error")(i % 5))
    }.toDF("event_id", "ts", "user_id", "event_type")
    val six = Seq("view", "click", "purchase", "view", "click", "purchase")
    val df = graft.ops.Temporal.funnel(spark, events, steps = six)
    // Without the per-step cut, the analyzed plan at 6 steps embeds 2^5
    // copies of the step-1 aggregate subtree; with it the node count is
    // small and linear. 400 is far above the linear size and far below
    // the exponential one.
    val nNodes = df.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nNodes < 400, s"plan has $nNodes nodes — frontier cut missing?")
    // And the result still matches the 3-step semantics composed twice.
    assert(df.collect().nonEmpty)
  }
}
