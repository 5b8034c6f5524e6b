package graft.core

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct k-word shingle hashing: lowercase, split on single
  * spaces (Spark `split(text, " ")` semantics), slide a k-word window,
  * murmur3-x64 each shingle string, dedup by hash (first-occurrence
  * order). Shared by the `shingle_hashes` expression and tests.
  *
  * This exists because composing the same thing from built-ins
  * (`array_distinct(transform(sequence(...), ...))` + `explode`) leaves
  * the whole chain interpreted (higher-order functions don't codegen) AND
  * `InferFiltersFromGenerate` clones the full expression into a
  * pushed-down filter, so it evaluates ~3x per row — measured 13-20x
  * slower than this single evaluation at sf0.1.
  */
object Shingles {

  /** Distinct murmur3 hashes of the k-word shingles of lower(text);
    * empty array when the doc has fewer than k words.
    */
  def hashes(text: UTF8String, k: Int): ArrayData =
    new GenericArrayData(hashArray(text, k))

  def hashArray(text: UTF8String, k: Int): Array[Long] = {
    // UTF8String.toLowerCase is what Spark's lower() applies — identical
    // case mapping, then plain String ops (the strings are row-sized)
    val words = text.toLowerCase.toString.split(" ", -1)
    if (words.length < k) return Array.empty[Long]
    val n = words.length - k + 1
    val seen = new java.util.HashSet[java.lang.Long](math.min(n * 2, 1 << 12))
    val out = new Array[Long](n)
    var m = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val h = Murmur3x64.hash(sb.toString.getBytes(StandardCharsets.UTF_8))
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  /** POSITIONAL k-word window hashes of lower(text): element i is the
    * murmur3 of words [i, i+k) joined by single spaces — order kept,
    * duplicates kept, so index == window position (the input to
    * exact-substring run-length detection). Tokenization is
    * whitespace-run splitting, equivalent to
    * `split(regexp_replace(lower(text), "\\s+", " "), " ")`.
    * Empty array when the doc has fewer than k words.
    */
  def posGramHashes(text: UTF8String, k: Int): ArrayData = {
    val words = text.toLowerCase.toString.split("\\s+", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Long])
    val n = words.length - k + 1
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = Murmur3x64.hash(sb.toString.getBytes(StandardCharsets.UTF_8))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed-n-gram feature buckets of lower(text) in occurrence order
    * (duplicates KEPT — importance-weight features are counts, unlike the
    * distinct-set shingles above): bucket(i) = murmur3(gram_i) mod B,
    * non-negative. Empty array when the doc has fewer than k words.
    */
  def gramBuckets(text: UTF8String, k: Int, buckets: Int): ArrayData = {
    val words = text.toLowerCase.toString.split(" ", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Int])
    val n = words.length - k + 1
    val out = new Array[Int](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val h = Murmur3x64.hash(sb.toString.getBytes(StandardCharsets.UTF_8))
      val m = (h % buckets).toInt
      out(i) = if (m < 0) m + buckets else m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of lower(text)'s word stream (every occurrence, not
    * the distinct set): bit j of the result is the sign of the sum over
    * words of (+1 if the word-hash's bit j is set else -1) — bit-identical
    * to `operators.SimHashAgg` over `murmur3_token(word)` of the exploded
    * split. One pass, no explode/shuffle.
    */
  def simhash(text: UTF8String): Long = {
    val words = text.toLowerCase.toString.split(" ", -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = Murmur3x64.hash(words(i).getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < 64) {
        counts(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Character-bigram histogram perceptual hash (q120's signature) as ONE
    * codegen'd pass: over the text's positive code points, bucket each
    * consecutive pair at (a*31 + b) mod `buckets` and set bit i of the
    * result iff count_i * buckets > total pairs (strictly above the
    * uniform mean, cross-multiplied — pure integer decision). Returns
    * null (boxed) when fewer than two positive code points exist — the
    * same rows the relational formulation's `size(codes) > 1` filter
    * dropped. Bit-identical FOR BMP TEXT to the former built-in chain
    * `filter(zip_with(filter(transform(split(text, ''), ascii), c > 0),
    * slice(...), (a, b) -> (a*31 + b) % 64), ...)` + the two-aggregation
    * mean test, which was interpreted (higher-order functions have no
    * codegen), allocated four arrays per row, and ran FOUR TIMES over the
    * corpus in q120's plan (two join sides × the tot/st aggregations).
    * On SUPPLEMENTARY code points the two diverge — Spark's ascii()
    * returns the first UTF-16 code unit (a surrogate) where this pass
    * and DuckDB's ord() oracle both use the full code point — so the
    * codepoint form here is the one that matches the DECLARED oracle on
    * non-BMP text (CharBigramPhashSpec pins an emoji case against the
    * oracle arithmetic); the corpus itself is ASCII.
    */
  def charBigramPhash(text: UTF8String, buckets: Int): java.lang.Long = {
    val s = text.toString
    val counts = new Array[Int](buckets)
    var n = 0
    var prev = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp > 0) {
        if (prev > 0) {
          counts((prev * 31 + cp) % buckets) += 1
          n += 1
        }
        prev = cp
      }
    }
    // n >= 1 iff at least two positive code points exist
    if (n == 0) return null
    var sig = 0L
    var b = 0
    while (b < buckets) {
      if (counts(b).toLong * buckets > n) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
