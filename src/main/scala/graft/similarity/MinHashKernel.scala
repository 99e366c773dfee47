package graft.similarity

/**
 * Single-pass MinHash signatures over char shingles — a JVM kernel for the
 * signature stage of LSH dedup. Replaces explode(2M shingle rows) + a
 * 32-column min aggregation (one full shuffle) with one tight loop per
 * document: hash each shingle once (FNV-1a 64), derive the H signature
 * lanes with a splitmix64 mix per lane, keep running minima.
 *
 * The hash family only needs to be uniform and deterministic — candidate
 * pairs are verified against EXACT Jaccard afterwards, so family choice
 * affects recall, not correctness.
 */
object MinHashKernel {

  /** splitmix64 finalizer — mixes (shingle hash, lane) into a lane value. */
  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over a char window [from, from+len). */
  @inline private def shingleHash(text: String, from: Int, len: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= text.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** SORTED DISTINCT 64-bit hashes of all `k`-char shingles of `text` —
    * the exact-verify side of LSH dedup in one pass per document (replaces
    * an explode + groupBy/collect_set shuffle of ~|text| rows per doc).
    * Shingle positions and the FNV family match [[signature]] exactly, so
    * the candidate and verify stages see the same shingle universe. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val n = math.max(text.length - k + 1, 1)
    val arr = new Array[Long](n)
    var s = 0
    while (s < n) {
      arr(s) = shingleHash(text, s, math.min(k, text.length - s))
      s += 1
    }
    java.util.Arrays.sort(arr)
    var w = 0
    var i = 0
    while (i < arr.length) {
      if (w == 0 || arr(w - 1) != arr(i)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(arr, w)
  }

  /** H-lane minhash signature of `text` over `k`-char shingles. */
  def signature(text: String, k: Int, h: Int): Array[Long] = {
    val sig = Array.fill(h)(Long.MaxValue)
    val nShingles = math.max(text.length - k + 1, 1)
    var s = 0
    while (s < nShingles) {
      val len = math.min(k, text.length - s)
      val base = shingleHash(text, s, len)
      var lane = 0
      while (lane < h) {
        val v = mix(base + lane * 0xD6E8FEB86659FD93L)
        if (v < sig(lane)) sig(lane) = v
        lane += 1
      }
      s += 1
    }
    sig
  }

  /** Exact Jaccard of two SORTED distinct sequences via two-pointer merge —
    * the verification kernel (Catalyst's array_intersect/array_union are
    * interpreted per pair and dominate when candidates number in the 10k+). */
  def jaccardSorted(a: IndexedSeq[String], b: IndexedSeq[String]): Double = {
    var i = 0
    var j = 0
    var common = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { common += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = a.length + b.length - common
    if (union == 0) 0.0 else common.toDouble / union
  }

  /** |a ∩ b| for sorted distinct arrays (two-pointer) — integer set math,
    * shared by the verified-twin queries so their exact-jaccard verify
    * stays a kernel instead of an interpreted per-pair array_intersect. */
  def intersectionSortedLongs(a: IndexedSeq[Long], b: IndexedSeq[Long]): Int = {
    var i = 0
    var j = 0
    var common = 0
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common
  }

  /** Compare two strings by CODE POINT — the order Spark's `sort_array`
    * sorts string arrays in (UTF8String compares UTF-8 bytes, and UTF-8
    * byte order IS code-point order). Java's `String.compareTo` differs
    * for supplementary-plane characters (UTF-16 code units put surrogates
    * at 0xD800–0xDFFF, BELOW BMP chars ≥ U+E000 that code-point order
    * puts first), so a two-pointer merge over sort_array-sorted arrays
    * must use THIS comparator or it silently undercounts intersections on
    * non-ASCII text. */
  def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  /** |a ∩ b| for string arrays sorted in `sort_array` (code-point) order —
    * the string twin of [[intersectionSortedLongs]]. */
  def intersectionSortedStrings(
      a: IndexedSeq[String], b: IndexedSeq[String]): Int = {
    var i = 0
    var j = 0
    var common = 0
    while (i < a.length && j < b.length) {
      val c = codePointCompare(a(i), b(j))
      if (c == 0) { common += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    common
  }

  /** Same over sorted distinct 64-bit shingle hashes — ~4x less data per
    * pair than the string sets; jaccard over hashed distinct shingles equals
    * jaccard over the shingles themselves up to 64-bit collisions. */
  def jaccardSortedLongs(a: IndexedSeq[Long], b: IndexedSeq[Long]): Double = {
    val common = intersectionSortedLongs(a, b)
    val union = a.length + b.length - common
    if (union == 0) 0.0 else common.toDouble / union
  }

  /** 64-bit SimHash over whitespace tokens: per token one FNV hash, each of
    * the 64 bits votes +1/-1, sign of the vote is the sketch bit. Single
    * pass per document — the dataframe formulation (explode + 64 sum
    * aggregates) shuffles every token row. */
  def simhash(text: String): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        // FNV-1a over the lowercased token
        var h = 0xCBF29CE484222325L
        var j = start
        while (j < i) {
          h ^= Character.toLowerCase(text.charAt(j)).toLong
          h *= 0x100000001B3L
          j += 1
        }
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
    }
    var sketch = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sketch |= (1L << bit)
      bit += 1
    }
    sketch
  }

  /** Band values: one hash per band of `r` consecutive lanes. */
  def bands(sig: Array[Long], b: Int, r: Int): Array[Long] = {
    val out = new Array[Long](b)
    var i = 0
    while (i < b) {
      var acc = 0xCBF29CE484222325L ^ i
      var j = 0
      while (j < r) {
        acc = mix(acc ^ sig(i * r + j))
        j += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }
}
