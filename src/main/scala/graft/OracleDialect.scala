package graft

/** DuckDB SQL emitters that re-derive the text/vector kernels of
  * [[graft.ops.TextKernel]] / [[graft.ops.OpsKernel]] bit-for-bit, so the
  * driver's oracle can hash-match LSH/dedup/ANN pipeline outputs exactly.
  *
  * Parity contract (kept by construction on both sides):
  *  - all hashes are modular arithmetic over P = 2^31-1 with intermediates
  *    < 2^63 (DuckDB BIGINT errors on overflow, so no wraparound is used);
  *  - all floating-point accumulations are left-folds in element order in
  *    double precision (DuckDB's `list_reduce` is a left fold, and FLOAT ->
  *    DOUBLE widening is exact), making sums, cosines and hyperplane dot
  *    products bit-identical.
  */
object OracleDialect {

  val P = 2147483647L // Mersenne prime 2^31-1, shared with TextKernel.P

  /** Rolling fingerprint (mod P, seed 5381) of a string expression — equals
    * TextKernel.stringFp. The lambda variable is `ci` so callers may embed
    * this inside lambdas using other names (never shadow `ci`). */
  def fp(x: String): String =
    s"list_reduce(list_prepend(CAST(5381 AS BIGINT), " +
      s"list_transform(range(1, length($x)+1), ci -> CAST(unicode($x[ci:ci]) AS BIGINT))), " +
      s"(h,c) -> (31*h + c) % $P)"

  /** Second, independent rolling hash (seed 0, multiplier 131) — mirrors
    * TextKernel.stringFp2; paired with [[fp]] for the KMV composite
    * hash fp(v) * P + fp2(v). The extra list_prepend(0) seed keeps the
    * empty string well-defined (list_reduce errors on empty lists). */
  def fp2(x: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($x)+1), ci -> CAST(unicode($x[ci:ci]) AS BIGINT))), " +
      s"(h,c) -> (131*h + c) % $P)"

  /** Whitespace word list of a text expression — equals
    * TextKernel.wordBounds: empty/whitespace-only text yields ZERO words
    * (DuckDB's string_split_regex would return [''], len 1, so the empty
    * case is guarded explicitly). Parity contract is BMP-only: the engine
    * iterates UTF-16 units (charAt) while `unicode()` sees codepoints, so
    * texts with surrogate pairs are outside the mirrored domain (the sf
    * corpora contain none). */
  def words(x: String): String =
    s"(CASE WHEN trim($x) = '' THEN CAST([] AS VARCHAR[]) " +
      s"ELSE string_split_regex(trim($x), '\\s+') END)"

  /** Word k-shingle fingerprints from a word-list expression `w` — equals
    * TextKernel.shingleFps (shingle = words joined by one space; fewer than
    * k words hash all words joined; empty -> empty list). */
  def shingleFps(w: String, k: Int): String =
    s"""(CASE
        WHEN len($w) = 0 THEN CAST([] AS BIGINT[])
        WHEN len($w) < $k THEN [${fp(s"array_to_string($w, ' ')")}]
        ELSE list_transform(range(1, len($w) - ${k - 2}),
               si -> ${fp(s"array_to_string($w[si:si+${k - 1}], ' ')")})
      END)"""

  /** MinHash signature (list of `numHashes` minima) from a shingle-fps
    * expression — equals TextKernel.minHash (empty -> P sentinel). */
  def minHashSig(fps: String, numHashes: Int): String =
    s"list_transform(range(0, $numHashes), f -> coalesce(" +
      s"list_min(list_transform($fps, x -> ((2*f+3)*x + 7919*f + 1) % $P)), $P))"

  /** LSH band hash of signature rows [band*rows, band*rows+rows) — equals
    * TextKernel.bandHash. `sig` must be a column name, `band` an expression. */
  def bandHash(sig: String, band: String, rows: Int): String =
    s"list_reduce(list_prepend($band + CAST(17 AS BIGINT), " +
      s"$sig[$rows*$band+1 : $rows*$band+$rows]), (h,m) -> (131*h + m) % $P)"

  /** 63-bit SimHash from a word-fps list expression — equals
    * TextKernel.simHash. */
  def simHashSig(wfps: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 63), b ->
        CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($wfps, fp ->
               CASE WHEN (((fp + 1 + b*10007) * 48271) % $P) % 2 = 1
                    THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
               (x,y) -> x + y) > 0
             THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
      (x,y) -> x + y)"""

  /** Rademacher hyperplane LSH bucket of a float-list expression — equals
    * OpsKernel.hyperplaneSig(v, bits, seed); `seed` may reference columns.
    * The sign hash is the double modular mix of OpsKernel.planeSign (every
    * multiply wraps mod P; a non-wrapping form degenerates to parity(d)). */
  def hyperplaneSig(v: String, bits: Int, seed: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, $bits), b ->
        CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, len($v)), d ->
               CASE WHEN ((((((($seed) * 48271 + 11) % $P) * (b*131 + 1) + b) % $P)
                           * (d*2 + 1) + d) % $P) % 2 = 0
                    THEN CAST($v[d+1] AS DOUBLE) ELSE -CAST($v[d+1] AS DOUBLE) END)),
               (x,y) -> x + y) >= 0
             THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
      (x,y) -> x + y)"""

  /** Cosine similarity mirroring OpsKernel.cosineF exactly: index-order
    * left-fold accumulation of dot and both norms, dot/sqrt(na*nb),
    * 0.0 when either norm is zero. `a`/`b` must be column references. */
  def cosine(a: String, b: String): String = {
    def fold(term: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(0, least(len($a), len($b))), i -> $term)), (x,y) -> x + y)"
    val dot = fold(s"CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)")
    val na = fold(s"CAST($a[i+1] AS DOUBLE) * CAST($a[i+1] AS DOUBLE)")
    val nb = fold(s"CAST($b[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)")
    s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 ELSE $dot / sqrt($na * $nb) END)"
  }

  /** Normalized-text fingerprint — equals TextKernel.fingerprint. */
  def docFingerprint(text: String): String =
    fp(s"array_to_string(${words(s"lower($text)")}, ' ')")

  /** Double-stepped MINSTD Lehmer mix of a non-negative BIGINT expression:
    * seed = (x + salt) folded into [1, P-1], then two multiplications by
    * the primitive root 48271 mod P. A bijection on [1, P-1], so any id
    * range maps to an equidistributed mod-P progression — unlike a rolling
    * hash of the DECIMAL id string, whose low bits barely move across a
    * small id range. Engine-portable SQL (only + * % CAST), emitted
    * identically for Spark and DuckDB; every intermediate < 2^47. */
  def lehmerMix(x: String, salt: Long): String = {
    val s = ((salt % (P - 1)) + (P - 1)) % (P - 1)
    s"((((($x) % ${P - 1} + $s) % ${P - 1} + 1) * 48271 % $P) * 48271 % $P)"
  }

  /** Deterministic uniform in (0,1) from [[lehmerMix]]. */
  def lehmerU(x: String, salt: Long): String =
    s"(${lehmerMix(x, salt)} / 2147483647.0)"

  /** CASE literal mapping `source` to its mixture weight — ONE emitter
    * serving the Spark operator (Ops.mixtureSample) and both DuckDB
    * oracles (mixture_sample, assembly_pipeline), so the two sides cannot
    * drift. */
  def mixtureCase(weights: Map[String, Double]): String = {
    require(weights.keys.forall(k => !k.contains("'")), "quote in source key")
    val cases = weights.toSeq.sortBy(_._1)
      .map { case (src, w) => s"WHEN '$src' THEN CAST($w AS DOUBLE)" }
      .mkString(" ")
    s"CASE source $cases ELSE CAST(0.0 AS DOUBLE) END"
  }

  /** rated/cop CTE pair of the mixture oracle: per-doc rate + Lehmer
    * uniform + deterministic copy count. `src` must expose (doc_id,
    * source). */
  def mixtureRatedCopCtes(src: String, weights: Map[String, Double],
                          salt: Long): String =
    s"""rated AS (
          SELECT doc_id, source, ${mixtureCase(weights)} AS rate,
            ${lehmerU("doc_id", salt)} AS u
          FROM $src),
        cop AS (
          SELECT doc_id, source,
            CAST(floor(rate) AS BIGINT)
              + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS n_copies
          FROM rated)"""

  /** Initial BPE representation of a word expression: every character
    * prefixed by ';' (";l;o;w") — see graft.ops.Bpe for why this makes
    * one `replace` an exact greedy merge pass. Lambda var `bi`, safe to
    * nest around [[fp]]'s `ci`. */
  def bpeInitRep(word: String): String =
    s"array_to_string(list_transform(range(1, length($word)+1), " +
      s"bi -> ';' || $word[bi:bi]), '')"

  /** The BPE training CTE chain, mirroring graft.ops.Bpe.train
    * operation-for-operation over `src` (a relation exposing `text`):
    * wdict (top-`cap` word counts under the (cnt desc, word) total
    * order), r0 (initial reps), then per merge k: pK (adjacent-pair
    * counts weighted by word count, overlaps included), mK (the argmax
    * with the (c desc, lhs, rhs) tie-break, empty when nothing reaches
    * `minPair`), rK (one greedy replace pass; chr(1) is the never-match
    * pattern when mK is empty). Every link is MATERIALIZED — the chain
    * references its predecessor, and DuckDB would otherwise inline it
    * exponentially (the lr_filter lesson). */
  def bpeTrainCtes(src: String, nMerges: Int, minPair: Long,
                   cap: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""wdict AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(${words("text")}) AS word FROM $src)
          WHERE word <> ''
          GROUP BY word ORDER BY cnt DESC, word LIMIT $cap),
        r0 AS MATERIALIZED (
          SELECT word, cnt, ${bpeInitRep("word")} AS rep FROM wdict)"""
    for (k <- 1 to nMerges) {
      sb ++= s""",
        p$k AS MATERIALIZED (
          SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS c FROM (
            SELECT cnt,
              unnest(list_transform(range(1, len(toks)), pi -> toks[pi])) AS lhs,
              unnest(list_transform(range(1, len(toks)), pi -> toks[pi+1])) AS rhs
            FROM (SELECT cnt, string_split(rep[2:], ';') AS toks FROM r${k - 1}))
          GROUP BY lhs, rhs),
        m$k AS MATERIALIZED (
          SELECT CAST($k AS INT) AS merge_rank, lhs, rhs, c FROM p$k
          WHERE c >= $minPair ORDER BY c DESC, lhs, rhs LIMIT 1),
        r$k AS MATERIALIZED (
          SELECT word, cnt, replace(rep,
            coalesce((SELECT ';' || lhs || ';' || rhs FROM m$k), chr(1)),
            coalesce((SELECT ';' || lhs || rhs FROM m$k), chr(1))) AS rep
          FROM r${k - 1})"""
    }
    sb.toString
  }

  /** Rank-order application of the trained merges to an initial-rep
    * expression: one greedy replace per merge, identical to the rK
    * rewrite — encoding replays the training trajectory, and
    * out-of-dictionary words (capped wdict) fall back to characters. */
  def bpeApplyExpr(initRep: String, nMerges: Int): String =
    (1 to nMerges).foldLeft(initRep) { (acc, k) =>
      s"replace($acc, " +
        s"coalesce((SELECT ';' || lhs || ';' || rhs FROM m$k), chr(1)), " +
        s"coalesce((SELECT ';' || lhs || rhs FROM m$k), chr(1)))"
    }

  /** The BPE corpus-encode CTE chain over `src` (doc_id, text) —
    * requires [[bpeTrainCtes]]' m1..mN to be in scope: aw (distinct
    * corpus words), tk (word -> rank-order merge replay), wp (word
    * positions), dr (per-doc concatenated rep). Shared by the
    * bpe_encode and bpe_pack oracles. */
  def bpeEncodeCtes(src: String, nMerges: Int): String =
    s"""aw AS MATERIALIZED (
          SELECT DISTINCT word
          FROM (SELECT unnest(${words("text")}) AS word FROM $src)
          WHERE word <> ''),
        tk AS MATERIALIZED (
          SELECT word, ${bpeApplyExpr(bpeInitRep("word"), nMerges)} AS rep FROM aw),
        wp AS MATERIALIZED (
          SELECT doc_id, unnest(ws) AS word,
                 unnest(range(1, len(ws)+1)) AS pos
          FROM (SELECT doc_id, ${words("text")} AS ws FROM $src)),
        dr AS MATERIALIZED (
          SELECT d.doc_id,
                 coalesce(string_agg(t.rep, '' ORDER BY w.pos), '') AS rep
          FROM $src d
          LEFT JOIN wp w ON w.doc_id = d.doc_id
          LEFT JOIN tk t ON t.word = w.word
          GROUP BY d.doc_id)"""

  /** keyed/cums/spans CTE chain of the sequence-packing oracle over
    * `src` (doc_id, text) — the reusable body behind
    * [[packCtesAndSelect]] (and the ccnet_pipeline oracle, which adds
    * its own final SELECT joining the bucket back). */
  def packCtes(src: String, seqLen: Int, nShards: Int): String =
    packCtesFromCounts(
      s"""(SELECT doc_id,
            CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
          FROM $src)""", seqLen, nShards)

  /** [[packCtes]] over a relation that ALREADY carries (doc_id,
    * n_tokens) — mirrors Ops.packSequencesByCount; the bpe_pack oracle
    * feeds it the re-derived BPE token counts. */
  def packCtesFromCounts(src: String, seqLen: Int, nShards: Int): String =
    s"""keyed AS (
          SELECT doc_id, n_tokens,
            ${docFingerprint("concat('pack#', CAST(doc_id AS VARCHAR))")} % $nShards AS shard,
            ${docFingerprint("concat('ord#', CAST(doc_id AS VARCHAR))")} AS ord
          FROM $src),
        cums AS (
          SELECT doc_id, shard, n_tokens,
            CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM keyed),
        spans AS (
          SELECT doc_id, shard, n_tokens, cum - n_tokens AS start_off,
            (cum - n_tokens) // $seqLen AS seq_first,
            CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // $seqLen
                 ELSE (cum - 1) // $seqLen END AS seq_last
          FROM cums)"""

  /** [[packCtes]] + the standard final SELECT — shared verbatim by the
    * pack_sequences and assembly_pipeline oracles. */
  def packCtesAndSelect(src: String, seqLen: Int, nShards: Int): String =
    s"""${packCtes(src, seqLen, nShards)}
        SELECT doc_id, shard, n_tokens, start_off, seq_first, seq_last,
          CAST(CASE WHEN n_tokens = 0 THEN 0
               ELSE seq_last - seq_first + 1 END AS BIGINT) AS n_seqs
        FROM spans"""

  /** Portable (Spark SQL and DuckDB) Stupid-Backoff per-position score in
    * 1e-6 fixed point — ONE emitter serving the Spark operator
    * (Ops.lmScore) and the DuckDB oracle, so the backoff ladder cannot
    * drift. References columns c1, c1x, c2, c2x, c3 (BIGINT n-gram counts,
    * 0 = unseen), j (word position) and nt (total training tokens).
    * Branch guards double as division guards: hash collisions can make a
    * trigram count positive while its context bigram was never seen, so
    * every ratio's denominator is required > 0 by its own branch.
    * Fixed-point BEFORE summation keeps document scores order-independent
    * (integer sums commute; a double sum would depend on aggregation
    * order). No library calls — ratios of exact integers, multiplication
    * by shared literals, floor: IEEE-deterministic across engines. */
  def sbmScoreCase(alpha: Double): String = {
    val a = s"CAST($alpha AS DOUBLE)"
    val uni = "(CAST(c1 AS DOUBLE) / CAST(nt AS DOUBLE))"
    val bi = "(CAST(c2 AS DOUBLE) / CAST(c1x AS DOUBLE))"
    val tri = "(CAST(c3 AS DOUBLE) / CAST(c2x AS DOUBLE))"
    s"""CAST(floor(1000000.0 * (CASE
          WHEN c3 > 0 AND c2x > 0 THEN $tri
          WHEN j >= 2 AND c2 > 0 AND c1x > 0 THEN $a * $bi
          WHEN j = 1 AND c2 > 0 AND c1x > 0 THEN $bi
          WHEN j >= 2 AND c1 > 0 THEN $a * ($a * $uni)
          WHEN j = 1 AND c1 > 0 THEN $a * $uni
          WHEN c1 > 0 THEN $uni
          ELSE 0.0 END)) AS BIGINT)"""
  }

  /** Backoff level actually used at a position (3 = trigram, 2 = bigram,
    * 1 = unigram, 0 = out-of-vocabulary) — portable, shared like
    * [[sbmScoreCase]]. The c2/c3 guards imply the j-range guards (an
    * out-of-range context probe carries count 0 by construction). */
  def sbmLevelCase: String =
    """CAST(CASE
         WHEN c3 > 0 AND c2x > 0 THEN 3
         WHEN c2 > 0 AND c1x > 0 THEN 2
         WHEN c1 > 0 THEN 1
         ELSE 0 END AS INT)"""

  /** Per-term BM25 idf, ln(1 + (N - df + 0.5)/(df + 0.5)), in 1e-9 fixed
    * point. Quantized once per TERM so the one library call (ln, whose
    * last-ulp rounding is not pinned down across engines) is flattened to
    * an exact BIGINT before it multiplies per-posting terms — the flip
    * risk is paid per distinct term, not per posting. References df,
    * n_docs. */
  def bm25IdfFp: String =
    """CAST(floor(1000000000.0 * ln(1.0 +
         (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
         (CAST(df AS DOUBLE) + 0.5))) AS BIGINT)"""

  /** Per-posting BM25 contribution in 1e-6 fixed point from the quantized
    * idf_fp — deterministic IEEE arithmetic only (exact-integer ratios and
    * shared literals; no library calls). References idf_fp, tf, dl, tot,
    * n_docs (avgdl is derived inline as tot/n_docs). */
  def bm25ContribFp(k1: Double, b: Double): String =
    s"""CAST(floor((CAST(idf_fp AS DOUBLE) / 1000.0) *
          ((CAST(tf AS DOUBLE) * CAST(${1.0 + k1} AS DOUBLE)) /
           (CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE) *
            (CAST(${1.0 - b} AS DOUBLE) + CAST($b AS DOUBLE) *
             CAST(dl AS DOUBLE) /
             (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS BIGINT)"""

  /** Portable logistic-regression margin z = w·x over feature columns
    * x1..x5 with a bias term. `w` supplies the 6 weight tokens — decimal
    * literals on the Spark side (training embeds each iteration's
    * collected weights), column references in the oracle's iterative CTE
    * chain. Left-associated sum in fixed order, so both engines evaluate
    * the identical IEEE expression. */
  def lrZ(w: Seq[String]): String = {
    require(w.length == 6)
    s"(${w(0)} * 1.0 + ${w(1)} * x1 + ${w(2)} * x2 + ${w(3)} * x3" +
      s" + ${w(4)} * x4 + ${w(5)} * x5)"
  }

  /** Per-document quantized gradient component j of the logistic loss,
    * (sigmoid(z) - y) * x_j in 1e-6 fixed point — quantized BEFORE the
    * distributed sum so gradient totals are order-independent integers
    * (and the one library call, exp, is flattened per document: a
    * last-ulp exp() divergence flips a 1e-6 floor with probability
    * ~4e-10). References y, x1..x5. */
  def lrGradQ(j: Int, w: Seq[String]): String = {
    val xj = if (j == 0) "1.0" else s"x$j"
    s"CAST(floor(1000000.0 * ((1.0 / (1.0 + exp(-${lrZ(w)})) - y) * $xj)) AS BIGINT)"
  }

  /** Weight-update arithmetic shared by the Scala trainer and the oracle
    * CTE chain: w_j - eta * ((g_j / 1e6) / n), every step an IEEE double
    * op on identical inputs. `wj`/`gj`/`c` are tokens. */
  def lrWUpdate(wj: String, gj: String, c: String, eta: Double): String =
    s"$wj - $eta * ((CAST($gj AS DOUBLE) / 1000000.0) / CAST($c AS DOUBLE))"

  /** 1e-6 fixed-point decision margin of the trained model. */
  def lrScoreQ(w: Seq[String]): String =
    s"CAST(floor(1000000.0 * ${lrZ(w)}) AS BIGINT)"

  /** Sign prediction of the trained model. */
  def lrPred(w: Seq[String]): String = s"(${lrZ(w)} >= 0.0)"

  /** wrds/sh/ev CTE chain of the decontamination oracle: per-doc distinct
    * shingle sets + the eval dictionary selected by `evalPred` (a
    * predicate over doc_id). */
  def shingleDictCtes(shingle: Int, evalPred: String): String =
    s"""wrds AS (SELECT doc_id, ${words("text")} AS w FROM documents),
        sh AS (SELECT doc_id, list_distinct(${shingleFps("w", shingle)}) AS fps FROM wrds),
        ev AS (SELECT DISTINCT unnest(fps) AS fp FROM sh WHERE $evalPred)"""
}
