package graft.ops

/** Pure-JVM text kernels for the data-pipeline operators: shingle minhash,
  * simhash, rolling-hash fingerprints, n-gram extraction. All deterministic,
  * seedable, zero dependencies; called from Catalyst expressions. */
object TextKernel {

  /** 64-bit avalanche mix (splitmix64 finalizer). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Polynomial rolling hash of s[from, until). */
  def rollHash(s: String, from: Int, until: Int): Long = {
    var h = 1125899906842597L
    var i = from
    while (i < until) {
      h = 31 * h + s.charAt(i)
      i += 1
    }
    h
  }

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

  /** Hashes of all word `k`-shingles of the text. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val (starts, ends) = wordBounds(text)
    val words = starts.length
    if (words < k) {
      if (words == 0) return Array.emptyLongArray
      return Array(mix64(rollHash(text, starts(0), ends(words - 1))))
    }
    val out = new Array[Long](words - k + 1)
    var i = 0
    while (i + k <= words) {
      out(i) = mix64(rollHash(text, starts(i), ends(i + k - 1)))
      i += 1
    }
    out
  }

  /** MinHash signature over word `k`-shingles: `numHashes` minima of
    * seed-mixed shingle hashes. */
  def minHash(text: String, k: Int, numHashes: Int): Array[Long] = {
    val shingles = shingleHashes(text, k)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h0 = shingles(s)
      var f = 0
      while (f < numHashes) {
        val h = mix64(h0 ^ (0x9E3779B97F4A7C15L * (f + 1)))
        if (h < sig(f)) sig(f) = h
        f += 1
      }
      s += 1
    }
    sig
  }

  /** Hash of one LSH band (signature rows [band*rows, (band+1)*rows)). */
  def bandHash(sig: Array[Long], band: Int, rowsPerBand: Int): Long = {
    var h = 1125899906842597L ^ band
    var i = band * rowsPerBand
    val end = Math.min(sig.length, i + rowsPerBand)
    while (i < end) {
      h = mix64(h ^ sig(i))
      i += 1
    }
    h
  }

  /** Exact Jaccard similarity of word-shingle sets. */
  def jaccard(a: String, b: String, k: Int): Double = {
    val sa = shingleHashes(a, k)
    val sb = shingleHashes(b, k)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val setA = new java.util.HashSet[Long]()
    var i = 0
    while (i < sa.length) { setA.add(sa(i)); i += 1 }
    val setB = new java.util.HashSet[Long]()
    i = 0
    while (i < sb.length) { setB.add(sb(i)); i += 1 }
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) inter += 1
    inter.toDouble / (setA.size + setB.size - inter)
  }

  /** 64-bit SimHash over word unigrams. */
  def simHash(text: String): Long = {
    val (starts, ends) = wordBounds(text)
    val counts = new Array[Int](64)
    var w = 0
    while (w < starts.length) {
      val h = mix64(rollHash(text, starts(w), ends(w)))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Rolling-hash document fingerprint over normalized text (lowercased,
    * whitespace collapsed). Byte-stable across runs. */
  def fingerprint(text: String): Long = {
    var h = 1125899906842597L
    var i = 0
    var lastWasSpace = true
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!lastWasSpace) { h = 31 * h + ' '; lastWasSpace = true }
      } else {
        h = 31 * h + Character.toLowerCase(c)
        lastWasSpace = false
      }
      i += 1
    }
    mix64(h)
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
