package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types._

/** SQL registration for the pipeline-operator function family. */
object OpsFunctions {
  type Builder = Seq[Expression] => Expression

  private def int(e: Expression): Expression =
    if (e.dataType == IntegerType) e else Cast(e, IntegerType)
  private def lng(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)
  private def str(e: Expression): Expression =
    if (e.dataType == StringType) e else Cast(e, StringType)

  val all: Seq[(String, Builder)] = Seq(
    "minhash" -> (es => MinHashExpr(str(es(0)), int(es(1)), int(es(2)))),
    "minhash_band_hashes" -> (es => BandHashesExpr(str(es(0)), int(es(1)), int(es(2)), int(es(3)))),
    "simhash" -> (es => SimHashExpr(str(es(0)))),
    "doc_fingerprint" -> (es => FingerprintExpr(str(es(0)))),
    "ngram_jaccard" -> (es => JaccardExpr(str(es(0)), str(es(1)), int(es(2)))),
    "shingle_fps" -> (es => ShingleFpsExpr(str(es(0)), int(es(1)))),
    "shingle_fps_pos" -> (es => ShingleFpsPosExpr(str(es(0)), int(es(1)))),
    "word_count" -> (es => WordCountExpr(str(es(0)))),
    "ngram_overlap" -> (es => OverlapCountsExpr(str(es(0)), str(es(1)), int(es(2)))),
    "text_repetition" -> (es => RepetitionStatsExpr(str(es(0)))),
    "hamming64" -> (es => HammingDistExpr(lng(es(0)), lng(es(1)))),
    "cosine_similarity" -> (es => CosineSimExpr(es(0), es(1))),
    "hyperplane_lsh" -> (es => HyperplaneSigExpr(es(0), int(es(1)), lng(es(2)))),
    "char_ngrams" -> (es => CharNgramsGen(str(es(0)), int(es(1)), int(es(2)))),
    "lm_probes" -> (es => LmProbesGen(str(es(0)))),
    "lm_gram_fps" -> (es => LmGramFpsExpr(str(es(0)))),
    "split_word_count" -> (es => SplitWordCountExpr(str(es(0)))),
    "word_count_pairs" -> (es => WordCountPairsExpr(str(es(0)))),
    "text_quality_stats" -> (es => QualityStatsExpr(str(es(0)))),
    "line_fps" -> (es => LineFpsExpr(str(es(0)), lng(es(1)))))

  private val RegisteredKey = "graft.ops.functions.registered"

  def register(spark: SparkSession): Unit = {
    // Idempotence is tracked with a session-conf marker, NOT
    // functionExists: the registry is pre-seeded with every Spark
    // built-in, so a future name collision (or a stale builder surviving
    // in a long-lived session) would silently skip installing OUR kernel
    // and lose createOrReplace semantics. The marker guarantees exactly
    // one createOrReplace per session — replace semantics kept, and the
    // per-call WARN spam (the reason the existence check was added)
    // still avoided.
    if (spark.conf.getOption(RegisteredKey).isEmpty) {
      val registry = spark.sessionState.functionRegistry
      all.foreach { case (name, builder) =>
        registry.createOrReplaceTempFunction(name, builder, "built-in")
      }
      spark.conf.set(RegisteredKey, "true")
    }
  }
}
