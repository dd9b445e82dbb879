package graft.functions

import scala.util.hashing.MurmurHash3

/** Text-analysis + near-dup primitives for large-scale training-data
  * pipelines (deduplication, fingerprinting, language ID, quality scores).
  * Pure deterministic functions — usable as UDFs and in plain Scala tests.
  */
object TextFunctions {

  def tokens(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  /** Word n-gram shingles (default 3) joined by single spaces. */
  def shingles(text: String, n: Int = 3): Array[String] = {
    val ts = tokens(text)
    if (ts.length < n) Array(ts.mkString(" "))
    else ts.sliding(n).map(_.mkString(" ")).toArray
  }

  /** 64-bit FNV-1a — stable across JVMs, used for simhash/doc fingerprints. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** MinHash signature: `numPerms` permutations approximated by seeded
    * murmur3 over shingles (standard construction; SURVEY-mandated
    * shingle→minhash→band→bucket-join pipeline). */
  def minhashSignature(text: String, numPerms: Int = 64, shingleN: Int = 3): Array[Int] = {
    val sh = shingles(text, shingleN)
    val sig = Array.fill(numPerms)(Int.MaxValue)
    for (s <- sh) {
      var p = 0
      while (p < numPerms) {
        val h = MurmurHash3.stringHash(s, p * 0x9e3779b9 + 1)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    sig
  }

  /** LSH band hashes: split the signature into bands of `rowsPerBand`, hash
    * each band; docs sharing any (band, hash) are candidate near-dups. */
  def lshBands(sig: Array[Int], rowsPerBand: Int = 4): Array[(Int, Long)] = {
    val nBands = sig.length / rowsPerBand
    Array.tabulate(nBands) { b =>
      val h = MurmurHash3.orderedHash(
        sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand).toSeq, b)
      (b, h.toLong & 0xffffffffL)
    }
  }

  /** 64-bit SimHash over word tokens (unit weights). */
  def simhash64(text: String): Long = {
    val v = new Array[Int](64)
    for (tok <- tokens(text)) {
      val h = fnv64(tok)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (v(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Jaccard similarity of word n-gram shingle sets (exact). */
  def ngramJaccard(a: String, b: String, n: Int = 3): Double = {
    val sa = shingles(a, n).toSet
    val sb = shingles(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  /** Tiny stopword-profile language ID (n-gram/stopword heuristic — the
    * honest offline baseline; returns ISO codes matching the documents
    * table's lang domain, 'en' fallback). Public: the q_langid DuckDB
    * oracle is GENERATED from this table (single source of truth), so the
    * production function itself is value-verified end-to-end. */
  val langMarkers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "que", "dans"),
    "es" -> Set("el", "los", "las", "es", "una", "que", "en", "por"),
    "zh" -> Set("的", "是", "了", "在", "我", "有"))

  def langId(text: String): String = {
    val ts = tokens(text.toLowerCase(java.util.Locale.ROOT)).toSeq
    val scores = langMarkers.map { case (lang, set) => (lang, ts.count(set.contains)) }
    val best = scores.maxBy(s => (s._2, -langMarkers.indexWhere(_._1 == s._1)))
    if (best._2 == 0) "en" else best._1
  }

  /** Quality heuristics: (nTokens, meanTokenLen, alphaRatio, punctRatio). */
  def qualityStats(text: String): (Int, Double, Double, Double) = {
    val ts = tokens(text)
    val n = ts.length
    val meanLen = if (n == 0) 0.0 else ts.map(_.length).sum.toDouble / n
    val chars = text.length
    val alpha = text.count(_.isLetter)
    val punct = text.count(c => ".,;:!?\"'()".indexOf(c) >= 0)
    (n, meanLen,
      if (chars == 0) 0.0 else alpha.toDouble / chars,
      if (chars == 0) 0.0 else punct.toDouble / chars)
  }

  /** Rolling (Rabin-Karp-style) document fingerprint over tokens. */
  def rollingFingerprint(text: String): Long = {
    var h = 0L
    for (tok <- tokens(text)) h = h * 1000003L + fnv64(tok)
    h
  }
}
