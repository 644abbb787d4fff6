package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word-shingle generator: `word_shingles(text, n)` -> array of
 * space-joined word n-grams, in ONE pass over the string.
 *
 * Why not `transform(sequence(...), i -> concat_ws(' ', element_at(split(text),...)))`:
 * higher-order-function lambdas are interpreted, and every inlined `split(text)`
 * subexpression is re-evaluated per lambda invocation — O(tokens^2) string splitting
 * per row (measured ~25x slower at bench scale). This expression tokenizes once and
 * emits the shingle array directly; one eval call per row (CodegenFallback — the call
 * itself is the whole work, so codegen would add nothing).
 *
 * Matches the HOF/oracle semantics exactly: split on single spaces (empty tokens
 * preserved), docs shorter than n words yield an empty array.
 */
/**
 * `md5_prefix60(s)`: the first 15 hex digits of md5(s) as a non-negative 60-bit
 * BIGINT, computed directly from the digest bytes — no hex-string materialization,
 * no string->number parse. Bit-identical to
 * `conv(substring(md5(s),1,15),16,10)::long` (Spark) and
 * `CAST(concat('0x',substr(md5(s),1,15)) AS BIGINT)` (DuckDB), which is what the
 * oracle computes; this is purely the faster evaluation of the same value. Feeds
 * MinHash / SimHash / rolling-hash (one call per token or shingle — the hottest
 * scalar in the dedup family).
 */
case class Md5Prefix60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_prefix60"

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(input.asInstanceOf[UTF8String].getBytes)
    // First 15 hex digits = bytes 0..6 in full plus the high nibble of byte 7.
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `jaro_winkler(a, b)`: Jaro-Winkler similarity, the record-linkage/entity-
 * resolution scalar Spark lacks natively (DuckDB, Postgres fuzzystrmatch and
 * every MDM product ship it). Variant pinned BIT-EXACTLY to DuckDB's
 * `jaro_winkler_similarity` (probed on 6000 random pairs — ASCII AND
 * multi-byte UTF-8 — plus the part-name corpus, zero double mismatches):
 * computed over UTF-8 BYTES, not code points, because DuckDB's implementation
 * is byte-oriented ('café' vs 'cafe' is a 5-vs-4-byte comparison there); match
 * window `floor(max(|a|,|b|)/2) - 1`, transpositions halved, prefix bonus
 * `l <= 4 bytes, p = 0.1` applied only when jaro > 0.7, identical non-empty
 * strings 1.0, any empty side 0.0. The IEEE operation ORDER below
 * (`(m/la + m/lb + (m-t)/m) / 3`, then `j + l*0.1*(1-j)`) is part of that
 * contract — reordering it can flip the last ulp and break the oracle's
 * floor-scaled comparison.
 *
 * One eval per row over the two byte arrays (CodegenFallback: the O(|a|*window)
 * match loop IS the work; codegen would only inline the call).
 */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val w = math.max(la, lb) / 2 - 1
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb, i + w + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b(j) == a(i)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3
    var p = 0
    while (p < math.min(4, math.min(la, lb)) && a(p) == b(p)) p += 1
    if (jaro > 0.7) jaro + p * 0.1 * (1 - jaro) else jaro
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle length must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `normalize_nfc(s)`: Unicode NFC normalization (canonical decomposition followed
 * by canonical composition) — the corpus-ingest primitive that makes byte-level
 * dedup/hashing meaningful across sources that emit the same text in composed vs
 * decomposed form (e.g. "é" as U+00E9 vs "e"+U+0301 hash differently until
 * normalized). Spark has no built-in; DuckDB ships `nfc_normalize` — the oracle
 * pins this expression byte-identical to it. One `java.text.Normalizer` call per
 * row (CodegenFallback: the library call IS the work).
 */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Fast path: NFC-normalized is the common case (all-ASCII trivially is);
    // isNormalized is a scan without allocation.
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `strip_accents(s)`: accent/diacritic folding — canonical decomposition (NFD),
 * drop combining marks (Unicode category Mn), recompose (NFC). The text-cleaning
 * step language-ID and fuzzy matching run before comparing tokens ("café" ==
 * "cafe"). Matches DuckDB's `strip_accents` on all Latin-1 accented letters (both
 * reduce them to the base letter by removing the combining mark NFD exposes);
 * letters with no canonical decomposition (ø, ł) are left alone by both dialects'
 * decomposition path.
 */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.forall(_ < 0x80)) return input  // pure-ASCII fast path (ASCII is NFC)
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    // Iterate by CODEPOINT: Character.getType on a bare surrogate char reports
    // SURROGATE, so char-wise filtering would let astral (non-BMP) combining
    // marks through — diverging from DuckDB, which strips them.
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
