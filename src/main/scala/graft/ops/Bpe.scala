package graft.ops

import org.apache.spark.sql.catalyst.InternalRow

/** Byte-pair-encoding tokenizer: merge-table training over the corpus
  * word-count dictionary (the Sennrich/GPT-2 setup — BPE trainers never
  * scan raw text; they iterate on the aggregated word->count map, which
  * is corpus-VOCABULARY sized, not corpus sized) plus a one-pass
  * distributed encoder.
  *
  * Semantics, shared bit-for-bit with the DuckDB oracle
  * (OracleDialect.bpeTrainCtes):
  *
  *  - A word's state is its symbol sequence, initially one symbol per
  *    character. The oracle's representation is the same sequence as a
  *    string with every symbol PREFIXED by ';' (";l;o;w"), chosen so
  *    that SQL `replace(rep, ';l;o', ';lo')` is exactly one greedy
  *    left-to-right non-overlapping merge pass: every candidate match
  *    starts at a ';', which occurs only at symbol starts, and the
  *    pattern does not consume the NEXT symbol's ';', so back-to-back
  *    occurrences all merge in one pass (";a;a;a;a" -> ";aa;aa").
  *  - Pair counting is over ALL adjacent symbol positions (overlaps
  *    included: "aaa" counts (a,a) twice), weighted by word count.
  *  - The winning pair maximizes count; ties break by smallest
  *    (lhs, rhs) in binary string order. Training stops early when no
  *    pair reaches `minPair`.
  *  - Encoding applies the merges in rank order, one greedy pass each —
  *    for dictionary words this replays the training trajectory
  *    exactly; out-of-dictionary words (a capped dictionary) get the
  *    identical operational semantics, falling back to characters where
  *    no merge applies, so encoding is total without any UNK token.
  *
  * Parity domain: token text must not contain ';' or chr(1) (the
  * oracle's boundary and never-match sentinels) and is BMP-only like
  * the rest of the text-kernel family; the sf corpora are lowercase
  * ASCII words. */
object Bpe {

  /** One greedy left-to-right non-overlapping merge pass of (l, r) over
    * a symbol sequence — the JVM twin of the oracle's single `replace`
    * on the ';'-prefixed representation. A merged symbol is never
    * re-examined in the same pass (the scan resumes after the consumed
    * pair), matching source-scan replace semantics. */
  def mergePass(syms: Array[String], l: String, r: String): Array[String] = {
    val n = syms.length
    if (n < 2) return syms
    val out = new Array[String](n)
    var i = 0
    var o = 0
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out(o) = l + r
        i += 2
      } else {
        out(o) = syms(i)
        i += 1
      }
      o += 1
    }
    if (o == n) syms else java.util.Arrays.copyOf(out, o)
  }

  /** Driver-side merge-table training over (word, count) rows. Pure and
    * deterministic: the result depends only on the multiset of inputs.
    * Returns up to `nMerges` (lhs, rhs, pairCount) rows in rank order. */
  def train(dict: Array[(String, Long)], nMerges: Int,
            minPair: Long = 2L): Array[(String, String, Long)] = {
    var reps: Array[Array[String]] =
      dict.map { case (w, _) => Array.tabulate(w.length)(i => w.substring(i, i + 1)) }
    val counts = dict.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var k = 0
    var go = true
    while (k < nMerges && go) {
      val pairs = new java.util.HashMap[(String, String), java.lang.Long]()
      var w = 0
      while (w < reps.length) {
        val s = reps(w)
        val c = counts(w)
        var i = 0
        while (i + 1 < s.length) {
          val key = (s(i), s(i + 1))
          val prev = pairs.get(key)
          pairs.put(key, if (prev == null) c else prev.longValue() + c)
          i += 1
        }
        w += 1
      }
      // argmax by (count desc, lhs asc, rhs asc) — binary string order,
      // which DuckDB's default collation and JVM compareTo agree on over
      // the ASCII parity domain.
      var best: ((String, String), Long) = null
      val it = pairs.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cand = (e.getKey, e.getValue.longValue())
        if (cand._2 >= minPair &&
            (best == null || cand._2 > best._2 ||
              (cand._2 == best._2 &&
                (cand._1._1 < best._1._1 ||
                  (cand._1._1 == best._1._1 && cand._1._2 < best._1._2)))))
          best = cand
      }
      if (best == null) go = false
      else {
        merges += ((best._1._1, best._1._2, best._2))
        reps = reps.map(mergePass(_, best._1._1, best._1._2))
        k += 1
      }
    }
    merges.toArray
  }

  /** Fold step shared with OracleDialect.fp: h' = (31h + char) mod P. */
  @inline private def foldFp(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    while (i < s.length) {
      h = (31 * h + s.charAt(i)) % TextKernel.P
      i += 1
    }
    h
  }

  /** Per-document encode against a broadcast [[BpeModel]]: n_tokens is
    * the total symbol count over the doc's words; token_fp is the
    * rolling fingerprint (TextKernel.stringFp arithmetic) of the doc's
    * concatenated ';'-prefixed representations in word order — the
    * oracle rebuilds the identical string with string_agg and hashes it
    * with the same fold. Zero words -> (0, 5381). */
  def encodeDoc(textU: org.apache.spark.unsafe.types.UTF8String,
                model: BpeModel): InternalRow = {
    val text = textU.toString
    var nTokens = 0L
    var h = 5381L
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
        val rep = model.rep(text.substring(start, i))
        nTokens += model.tokens(rep)
        h = foldFp(h, rep)
      }
    }
    InternalRow(nTokens, h)
  }
}

/** Broadcastable trained BPE model: the ranked merge table plus a
  * per-executor memo of word -> ';'-prefixed representation (one object
  * per executor after broadcast, so each distinct word is encoded once
  * per executor, not once per row; the memo is capped so a pathological
  * unbounded vocabulary cannot hold executor memory). */
final class BpeModel(val lhs: Array[String], val rhs: Array[String],
                     memoCap: Int = 1 << 20) extends Serializable {
  require(lhs.length == rhs.length, "ragged merge table")

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** ';'-prefixed final representation of one word. */
  def rep(word: String): String = {
    val hit = memo.get(word)
    if (hit != null) return hit
    var syms = Array.tabulate(word.length)(i => word.substring(i, i + 1))
    var k = 0
    while (k < lhs.length) {
      syms = Bpe.mergePass(syms, lhs(k), rhs(k))
      k += 1
    }
    val sb = new java.lang.StringBuilder(word.length + syms.length)
    var j = 0
    while (j < syms.length) { sb.append(';').append(syms(j)); j += 1 }
    val r = sb.toString
    if (memo.size < memoCap) memo.put(word, r)
    r
  }

  /** Symbol count of a representation (its ';' count). */
  def tokens(rep: String): Long = {
    var c = 0L
    var i = 0
    while (i < rep.length) { if (rep.charAt(i) == ';') c += 1; i += 1 }
    c
  }
}
