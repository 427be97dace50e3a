package graft.ops

/** Pure-JVM text kernels for the data-pipeline operators: shingle minhash,
  * simhash, rolling-hash fingerprints, n-gram extraction. All deterministic,
  * seedable, zero dependencies; called from Catalyst expressions.
  *
  * Every hash here uses modular arithmetic over the Mersenne prime
  * P = 2^31-1 with all intermediates < 2^63, so the exact same pipeline is
  * expressible 1:1 in DuckDB SQL (whose BIGINT errors on overflow instead
  * of wrapping) — the driver's oracle re-derives these values bit-for-bit
  * (see SparkEntry.oracleSql). Weaker than a 64-bit avalanche hash in
  * collision resistance, but collisions are identical on both sides and
  * ~2^31 space is ample for LSH banding.
  */
object TextKernel {

  /** Modulus for all rolling/derived hashes (Mersenne prime 2^31-1). */
  val P: Long = 2147483647L

  /** 64-bit avalanche mix (splitmix64 finalizer) — internal-only uses
    * (never oracle-compared). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Polynomial rolling hash mod P of s[from, until), seeded at `h0`. */
  @inline private def rollFp(s: String, from: Int, until: Int, h0: Long,
                             mult: Long = 31L): Long = {
    var h = h0
    var i = from
    while (i < until) {
      h = (mult * h + s.charAt(i)) % P
      i += 1
    }
    h
  }

  /** Rolling hash mod P of the full string (DuckDB: fold over unicode()). */
  def stringFp(s: String): Long = rollFp(s, 0, s.length, 5381L)

  /** Second, independent rolling hash (seed 0, multiplier 131) — paired
    * with [[stringFp]] for ~P^2-space composite hashes (the KMV sketch).
    * Mirrored by OracleDialect.fp2. */
  def stringFp2(s: String): Long = rollFp(s, 0, s.length, 0L, 131L)

  /** Whitespace word boundaries: returns offsets of word starts/ends. */
  private def wordBounds(s: String): (Array[Int], Array[Int]) = {
    val starts = new scala.collection.mutable.ArrayBuilder.ofInt
    val ends = new scala.collection.mutable.ArrayBuilder.ofInt
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        starts += i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        ends += i
      }
    }
    (starts.result(), ends.result())
  }

  /** Whitespace word count — the `len(words())` the oracle dialect sees. */
  def wordCount(s: String): Long = wordBounds(s)._1.length.toLong

  /** Fingerprint of words [from, until) joined by a single space — equals
    * stringFp(words.mkString(" ")) without materializing the join. */
  private def joinedFp(text: String, starts: Array[Int], ends: Array[Int],
                       from: Int, until: Int): Long = {
    var h = 5381L
    var w = from
    while (w < until) {
      if (w > from) h = (31 * h + ' ') % P
      h = rollFp(text, starts(w), ends(w), h)
      w += 1
    }
    h
  }

  /** Prefix hashes of the canonical word stream (words joined by single
    * spaces): any word-range fingerprint in O(1) via
    *   H(a..b) = ((5381 - pre[s]) * 31^L + pre[e]) mod P,
    * bit-identical to [[joinedFp]]'s left-fold (H = 5381*31^L + U with
    * U(s..e) = pre[e] - pre[s]*31^L, all exact mod-P arithmetic) —
    * turns the O(n*k) per-document k-shingle sweep into O(n). */
  private final class JoinedStream(text: String,
                                   starts: Array[Int], ends: Array[Int]) {
    val nWords: Int = starts.length
    // Stream offsets: word w occupies [wOff(w), wOff(w) + len(w)).
    private val wOff = new Array[Int](nWords + 1)
    locally {
      var off = 0
      var w = 0
      while (w < nWords) {
        wOff(w) = off
        off += ends(w) - starts(w) + 1 // + the joining space (last unused)
        w += 1
      }
      wOff(nWords) = off
    }
    private val streamLen = if (nWords == 0) 0 else wOff(nWords) - 1
    private val pre = new Array[Long](streamLen + 1)
    private val pw = new Array[Long](streamLen + 1)
    locally {
      pw(0) = 1L
      var t = 1
      while (t <= streamLen) { pw(t) = (31L * pw(t - 1)) % P; t += 1 }
      var h = 0L
      var pos = 0 // chars consumed so far; pre(pos) = hash of stream[0,pos)
      pre(0) = 0L
      var w = 0
      while (w < nWords) {
        if (w > 0) { h = (31L * h + ' ') % P; pos += 1; pre(pos) = h }
        var i = starts(w)
        val e = ends(w)
        while (i < e) {
          h = (31L * h + text.charAt(i)) % P
          pos += 1
          pre(pos) = h
          i += 1
        }
        w += 1
      }
    }

    /** Seeded fingerprint of words [from, until), until > from. */
    def fp(from: Int, until: Int): Long = {
      val s = wOff(from)
      val e = wOff(until) - 1 // drop the trailing join-space slot
      val len = e - s
      val head = (5381L - pre(s) + P) % P
      (head * pw(len) + pre(e)) % P
    }
  }

  /** Fingerprints (mod P) of all word `k`-shingles of the text; a shingle's
    * fingerprint is the rolling hash of its words joined by one space.
    * Fewer than k words: one fingerprint of all words joined. */
  def shingleFps(text: String, k: Int): Array[Long] = {
    val (starts, ends) = wordBounds(text)
    val words = starts.length
    if (words == 0) return Array.emptyLongArray
    if (words < k) return Array(joinedFp(text, starts, ends, 0, words))
    if (k == 1 && words == 1)
      return Array(joinedFp(text, starts, ends, 0, 1))
    // O(n) rolling form (prefix hashes over the canonical word stream);
    // each entry equals the joinedFp left-fold bit-for-bit.
    val js = new JoinedStream(text, starts, ends)
    val out = new Array[Long](words - k + 1)
    var i = 0
    while (i + k <= words) {
      out(i) = js.fp(i, i + k)
      i += 1
    }
    out
  }

  /** Hash family member f applied to a shingle fingerprint. */
  @inline def hashF(fp: Long, f: Int): Long =
    ((2L * f + 3L) * fp + 7919L * f + 1L) % P

  /** Stupid-Backoff probe fingerprints, flat 5 slots per word position j
    * (one O(n) pass over the text, no per-position string materialization):
    * {{{
    *   [5j+0] t1  = fp(word j)                        (always)
    *   [5j+1] t1x = fp(word j-1)                      (-1 when j < 1)
    *   [5j+2] t2  = fp(words j-1..j,  space-joined)   (-1 when j < 1)
    *   [5j+3] t2x = fp(words j-2..j-1, space-joined)  (-1 when j < 2)
    *   [5j+4] t3  = fp(words j-2..j,  space-joined)   (-1 when j < 2)
    * }}}
    * Fingerprints equal [[shingleFps]] entries of the same n-gram (rolling
    * hash of the words joined by one space, mod P), so LM count tables
    * built from `shingleFps(text, n)` join these probes exactly. */
  def lmProbeFps(text: String): Array[Long] = {
    val (starts, ends) = wordBounds(text)
    val n = starts.length
    if (n == 0) return Array.emptyLongArray
    val js = new JoinedStream(text, starts, ends)
    val out = new Array[Long](5 * n)
    var j = 0
    while (j < n) {
      val o = 5 * j
      out(o) = js.fp(j, j + 1)
      out(o + 1) = if (j >= 1) out(o - 5) else -1L
      out(o + 2) = if (j >= 1) js.fp(j - 1, j + 1) else -1L
      out(o + 3) = if (j >= 2) out(o - 5 + 2) else -1L
      out(o + 4) = if (j >= 2) js.fp(j - 2, j + 1) else -1L
      j += 1
    }
    out
  }

  /** All 1/2/3-gram fingerprints of the text in ONE wordBounds pass,
    * packed as (kind << 32) | fp (fp < 2^31 so the pack is lossless).
    * The multiset of (kind, fp) pairs is exactly what three separate
    * `shingleFps(text, k)` passes over k = 1..3 emit for docs with
    * `wordCount >= k` (the lmCounts guard): every unigram, every bigram,
    * every trigram, each once — so the LM count table built from this is
    * bit-identical to the three-scan union while scanning the text once. */
  def lmGramFps(text: String): Array[Long] = {
    val (starts, ends) = wordBounds(text)
    val n = starts.length
    if (n == 0) return Array.emptyLongArray
    val js = new JoinedStream(text, starts, ends)
    val nBi = math.max(n - 1, 0)
    val nTri = math.max(n - 2, 0)
    val out = new Array[Long](n + nBi + nTri)
    var o = 0
    var j = 0
    while (j < n) {
      out(o) = (1L << 32) | js.fp(j, j + 1)
      o += 1
      if (j >= 1) {
        out(o) = (2L << 32) | js.fp(j - 1, j + 1)
        o += 1
      }
      if (j >= 2) {
        out(o) = (3L << 32) | js.fp(j - 2, j + 1)
        o += 1
      }
      j += 1
    }
    out
  }

  /** Java-regex whitespace class of `split(_, "\\s+")` (ASCII only — NOT
    * Character.isWhitespace; the distinction matters for exotic Unicode
    * spaces and is why these split-parity kernels exist separately from
    * [[wordBounds]]). */
  @inline private[ops] def isSplitSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** EXACT `size(split(trim(text), "\\s+"))` semantics (Spark SQL): trim
    * strips the space character only; Spark's split uses Java split with
    * limit -1, so "" yields [""] (size 1), a leading separator char
    * surviving trim (e.g. '\t') yields a leading empty token AND a
    * trailing separator yields a trailing empty token. */
  def splitWordCount(s: String): Long = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == e) return 1L // split("") -> [""]
    var n = 0L
    if (isSplitSpace(s.charAt(b))) n += 1 // leading separator -> "" token
    if (isSplitSpace(s.charAt(e - 1))) n += 1 // limit -1: trailing "" kept
    var i = b
    while (i < e) {
      while (i < e && isSplitSpace(s.charAt(i))) i += 1
      if (i < e) {
        n += 1
        while (i < e && !isSplitSpace(s.charAt(i))) i += 1
      }
    }
    n
  }

  /** Surface quality counts in one pass, split-parity semantics —
    * the integer inputs behind qualityScore/qualitySql/lrFilter:
    * (n_chars = codepoint length, n_words = [[splitWordCount]],
    * n_stop = tokens of the LOWERCASED trimmed text in `stop`,
    * n_digit = chars in [0-9], n_punct = chars in [.,;:!?]).
    * `lowered` must be the lower(trim(text)) the SQL formulation splits
    * (lowercasing can change lengths for exotic case mappings, so the
    * stop count runs over the lowered string, exactly like the SQL). */
  def qualityCounts(s: String, lowered: String,
                    stop: java.util.HashSet[String]): Array[Long] = {
    var nChars = 0L
    var nDigit = 0L
    var nPunct = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      // Code-point length parity with Spark's length(): count a
      // surrogate pair once.
      if (!Character.isLowSurrogate(c)) nChars += 1
      if (c >= '0' && c <= '9') nDigit += 1
      else if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?')
        nPunct += 1
      i += 1
    }
    // Stopword tokens of the lowered trimmed text (empty tokens are never
    // stopwords, so the leading-empty-token artifact cannot contribute).
    var nStop = 0L
    var b = 0
    var e = lowered.length
    while (b < e && lowered.charAt(b) == ' ') b += 1
    while (e > b && lowered.charAt(e - 1) == ' ') e -= 1
    i = b
    while (i < e) {
      while (i < e && isSplitSpace(lowered.charAt(i))) i += 1
      if (i < e) {
        val ws = i
        while (i < e && !isSplitSpace(lowered.charAt(i))) i += 1
        if (stop.contains(lowered.substring(ws, i))) nStop += 1
      }
    }
    Array(nChars, splitWordCount(s), nStop, nDigit, nPunct)
  }

  /** MinHash signature over word `k`-shingles: `numHashes` minima of the
    * affine hash family applied to shingle fingerprints. */
  def minHash(text: String, k: Int, numHashes: Int): Array[Long] = {
    val shingles = shingleFps(text, k)
    val sig = new Array[Long](numHashes)
    // "Infinity" sentinel = P: every family value is < P, and the sentinel
    // stays inside the band-hash modular bound (DuckDB: coalesce(min, P)).
    java.util.Arrays.fill(sig, P)
    var s = 0
    while (s < shingles.length) {
      val fp = shingles(s)
      var f = 0
      while (f < numHashes) {
        val h = hashF(fp, f)
        if (h < sig(f)) sig(f) = h
        f += 1
      }
      s += 1
    }
    sig
  }

  /** Hash of one LSH band (signature rows [band*rows, (band+1)*rows)). */
  def bandHash(sig: Array[Long], band: Int, rowsPerBand: Int): Long = {
    var h = band + 17L
    var i = band * rowsPerBand
    val end = Math.min(sig.length, i + rowsPerBand)
    while (i < end) {
      h = (131 * h + sig(i)) % P
      i += 1
    }
    h
  }

  /** Distinct-shingle overlap counts: (intersection, union). Both empty ->
    * (1, 1) so inter/union = Jaccard = 1.0 by convention. */
  def overlapCounts(a: String, b: String, k: Int): (Int, Int) = {
    val sa = shingleFps(a, k)
    val sb = shingleFps(b, k)
    if (sa.isEmpty && sb.isEmpty) return (1, 1)
    val setA = new java.util.HashSet[Long]()
    var i = 0
    while (i < sa.length) { setA.add(sa(i)); i += 1 }
    val setB = new java.util.HashSet[Long]()
    i = 0
    while (i < sb.length) { setB.add(sb(i)); i += 1 }
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) inter += 1
    (inter, setA.size + setB.size - inter)
  }

  /** Exact Jaccard similarity of word-shingle fingerprint sets. */
  def jaccard(a: String, b: String, k: Int): Double = {
    val (inter, union) = overlapCounts(a, b, k)
    inter.toDouble / union
  }

  /** Bit `b` (0..62) contribution of a word fingerprint to the simhash:
    * +1 when the derived hash is odd, else -1. */
  @inline def simBit(fp: Long, b: Int): Int =
    if ((((fp + 1L + b * 10007L) * 48271L) % P & 1L) == 1L) 1 else -1

  /** 63-bit SimHash over word unigrams (bit 63 unused so the value is
    * non-negative on both the JVM and DuckDB). */
  def simHash(text: String): Long = {
    val (starts, ends) = wordBounds(text)
    val counts = new Array[Int](63)
    var w = 0
    while (w < starts.length) {
      val fp = joinedFp(text, starts, ends, w, w + 1)
      var b = 0
      while (b < 63) {
        counts(b) += simBit(fp, b)
        b += 1
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 63) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Rolling-hash document fingerprint over normalized text: lowercased,
    * whitespace-trimmed and collapsed to single spaces. */
  def fingerprint(text: String): Long = {
    val s = text.toLowerCase
    val (starts, ends) = wordBounds(s)
    joinedFp(s, starts, ends, 0, starts.length)
  }

  /** Character n-grams of the lowercased text (for language ID profiles). */
  def charNgrams(text: String, n: Int, max: Int): Array[String] = {
    val s = text.toLowerCase
    val count = Math.min(Math.max(0, s.length - n + 1), max)
    val out = new Array[String](count)
    var i = 0
    while (i < count) {
      out(i) = s.substring(i, i + n)
      i += 1
    }
    out
  }

  /** Hamming distance of two 64-bit signatures. */
  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
