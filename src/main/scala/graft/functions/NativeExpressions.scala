package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeCheckBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Hashing, RabinFingerprint}

/** Static entry points the generated Java code calls — Scala `object`
  * methods compile to static forwarders, so codegen emits a plain static
  * call with no closure/boxing on the per-row path. */
object NativeFns {
  def rabinFp64(s: UTF8String): Long = RabinFingerprint.std64.fp(s.toString)
  def simhash64(s: UTF8String): Long = Hashing.simhash64(s.toString)
  def bandKeys(h: Long): ArrayData = new GenericArrayData(Hashing.bandKeys(h))
  def sniffCharset(b: Array[Byte]): UTF8String = CharsetSniff.sniffCharset(b)

  /** High-nibble histogram of a byte payload in ONE pass — the
    * feature-extraction kernel for binary media columns. Returns 16
    * counts; normalization stays in column land so the expression is a
    * pure count (exact, engine-portable). */
  def nibbleHist16(b: Array[Byte]): ArrayData = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < b.length) { counts((b(i) & 0xf0) >>> 4) += 1; i += 1 }
    new GenericArrayData(counts)
  }

  /** Sum of every `stride`-th payload byte (unsigned) — the resampled-
    * bytes checksum of the multimodal resize path, one flat pass. */
  def strideSum(b: Array[Byte], stride: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < b.length) { acc += (b(i) & 0xff); i += stride }
    acc
  }

  /** Exact 3-gram Jaccard of two UTF8String shingle arrays via one hash
    * set — replaces interpreted array_intersect on the dedupe verify
    * path. Inputs are distinct-element arrays by construction. */
  def jaccard3(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return Double.NaN // matches 0.0/0.0 of the column form
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(b.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter)
  }

  /** Exact Jaccard of two SORTED distinct-element UTF8String arrays by a
    * single merge walk — no hash set, no per-pair allocation. Callers
    * must pass arrays sorted ascending in UTF8String (binary) order
    * (`array_sort` produces exactly that); Jaccard3SortedSpec pins
    * agreement with [[jaccard3]] under that contract. Written for the
    * probe-verify hot path (d12's truth side evaluates it once per
    * (probe, doc) pair inside a join condition): the hash-set form costs
    * ~|A| node allocations per PAIR, which the merge walk avoids
    * entirely. */
  def jaccard3Sorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return Double.NaN // matches 0.0/0.0 of the column form
    val inter = interSorted(a, b)
    inter.toDouble / (na + nb - inter)
  }

  /** Exact intersection SIZE of two SORTED distinct-element UTF8String
    * arrays (the merge walk of [[jaccard3Sorted]], exposed as the raw
    * count for callers that need the integer — d17 reports
    * inter_grams/union_grams, so the ratio alone is not enough). */
  def interSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  /** MinHash signature by double hashing — same arithmetic as the
    * column-expression formulation (and the DuckDB oracle), one flat
    * call instead of k interpreted zip_with lambdas. */
  def minhashSig(h1: ArrayData, h2: ArrayData, k: Int, prime: Long): ArrayData = {
    val n = h1.numElements()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (h1.getLong(i) + j * h2.getLong(i)) % prime
        if (v < min) min = v
        i += 1
      }
      out(j) = if (n == 0) null else min
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Sequential-order dot product — the same left-to-right fold as
    * aggregate(zip_with(...)), so results are bit-identical to the
    * column formulation and the oracle's list_sum. */
  def dotSeq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    val d = md.digest(bytes) // digest() also resets the instance
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(HexDigits((d(i) >> 4) & 0xf)).append(HexDigits(d(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Winnowing-style document fingerprint in ONE pass: md5 hex of the
    * concatenation of the k lexicographically smallest md5(shingle)
    * digests over the distinct 3-gram shingles. Bit-identical to the
    * column formulation md5(concat_ws("", slice(array_sort(transform(
    * shingles3(text), md5)), 1, k))) — hex digests are ASCII, so String
    * ordering matches UTF8String binary ordering — but one flat call
    * instead of ~hundreds of interpreted md5 lambdas per row, and no
    * intermediate digest array is ever materialized (a k-slot insertion
    * keeps the running minima). */
  def docFp(s: UTF8String, k: Int): UTF8String = {
    val str = s.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val best = new Array[String](k)
    var n = 0
    val cps = str.codePointCount(0, str.length)
    if (cps >= 3) {
      val seen = new java.util.HashSet[String]()
      var start = 0
      var i = 0
      while (i < cps - 2) {
        val end = str.offsetByCodePoints(start, 3)
        val sh = str.substring(start, end)
        if (seen.add(sh)) {
          val d = md5Hex(md, sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          if (n < k || d.compareTo(best(k - 1)) < 0) {
            // insertion into the sorted k-slot window
            var p = math.min(n, k - 1)
            while (p > 0 && d.compareTo(best(p - 1)) < 0) {
              best(p) = best(p - 1); p -= 1
            }
            best(p) = d
            if (n < k) n += 1
          }
        }
        start = str.offsetByCodePoints(start, 1)
        i += 1
      }
    }
    val sb = new java.lang.StringBuilder(32 * n)
    var j = 0
    while (j < n) { sb.append(best(j)); j += 1 }
    UTF8String.fromString(
      md5Hex(md, sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Per-shingle 40-bit base hash in ONE pass: for each shingle, the
    * first 10 hex chars (= first 5 bytes, big-endian) of
    * md5(tag ‖ ':' ‖ shingle) parsed as a long — bit-identical to the
    * column form conv(substring(md5(concat(tag:':', s)), 1, 10), 16, 10)
    * but one flat call per row instead of an interpreted md5 lambda per
    * shingle. */
  def shingleHash40(sh: ArrayData, tag: UTF8String): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefix = (tag.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = sh.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.update(prefix)
      md.update(sh.getUTF8String(i).getBytes)
      val d = md.digest() // resets for the next shingle
      out(i) = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
        ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-shingle 60-bit hashes in ONE pass: the first 15 hex chars
    * (= 7 bytes + the high nibble of the 8th, big-endian) of md5(shingle)
    * as a long — bit-identical to the column form
    * conv(substring(md5(s), 1, 15), 16, 10). */
  def shingleHashes60(sh: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = sh.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(sh.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Compiled marker-word tables for [[markerCounts]], keyed by the spec
    * literal embedded in the generated code. Word → indices of every
    * group containing it (a word can mark several languages, e.g. "la"
    * in both fr and es). */
  private val markerTables =
    new java.util.concurrent.ConcurrentHashMap[String, (java.util.HashMap[UTF8String, Array[Int]], Int)]()

  private def compileMarkers(spec: String): (java.util.HashMap[UTF8String, Array[Int]], Int) = {
    val groups = spec.split('|')
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    groups.zipWithIndex.foreach { case (g, gi) =>
      g.split(',').filter(_.nonEmpty).foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(gi) else prev :+ gi)
      }
    }
    (m, groups.length)
  }

  /** Per-group exact token-occurrence counts in ONE pass over the token
    * array: group spec "w1,w2|w3,w4|…" (compiled once per literal and
    * cached), result = one count per group. Replaces N interpreted
    * size(filter(toks, = w)) lambdas per row with a single scan and a
    * hash probe per token. */
  def markerCounts(toks: ArrayData, spec: UTF8String): ArrayData = {
    val key = spec.toString
    var compiled = markerTables.get(key)
    if (compiled == null) {
      compiled = compileMarkers(key)
      markerTables.putIfAbsent(key, compiled)
    }
    val (table, nGroups) = compiled
    val counts = new Array[Long](nGroups)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val gs = table.get(toks.getUTF8String(i))
      if (gs != null) {
        var j = 0
        while (j < gs.length) { counts(gs(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Distinct character 3-grams, first-occurrence order, by code point —
    * the same result as array_distinct(transform(sequence…substring))
    * but one flat call per row instead of hundreds of interpreted
    * higher-order-function lambdas. */
  def shingles3(s: UTF8String): ArrayData = {
    val str = s.toString
    val cps = str.codePointCount(0, str.length)
    if (cps < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var start = 0
    var i = 0
    while (i < cps - 2) {
      val end = str.offsetByCodePoints(start, 3)
      seen.add(str.substring(start, end))
      start = str.offsetByCodePoints(start, 1)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** One-pass content-defined anchor-gram selection (d8): the distinct
    * `gram`-code-point substrings whose md5 hex ends in the `nibble`
    * hex digit. Bit-identical (for inputs of ≥ `gram` code points; shorter
    * inputs return an empty array, matching d8's original
    * `when(length < gram, array())` guard) to the column form
    * `array_distinct(filter(transform(sequence(1, char_length(s)-gram+1),
    * i -> substring(s, i, gram)), g -> substring(md5(g), 32, 1) = hex))`
    * — Spark substring counts code points and md5 hashes UTF-8 bytes.
    * One flat call per row over the raw UTF-8 bytes: code-point starts
    * are indexed once, each gram is digested as a byte slice through a
    * single reused MessageDigest, and only the ~1/16 SELECTED grams ever
    * materialize as objects (a copied byte slice for the dedup set);
    * unselected grams allocate nothing. */
  def anchorGrams(s: UTF8String, gram: Int, nibble: Int): ArrayData = {
    val bytes = s.getBytes
    // code-point start offsets: UTF-8 continuation bytes are 10xxxxxx
    var cps = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) cps += 1
      i += 1
    }
    if (cps < gram) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](cps + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(cps) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var p = 0
    while (p <= cps - gram) {
      val off = starts(p)
      val end = starts(p + gram)
      md.update(bytes, off, end - off)
      val d = md.digest() // finalizes and resets the instance
      if ((d(15) & 0xf) == nibble)
        seen.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, off, end)))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** X8 charset detection, the full tier cascade of the reference's
  * bestEffortDetectCharset (CharsetUtils.java). Headers and meta tags
  * are plain `regexp_extract` on the column layer; THIS function is the
  * byte-level tier: BOM sniffing (UTF-8/16/32 variants), then a
  * statistical tier standing in for the reference's ICU/Mozilla
  * detectors with the two published-heuristic checks that decide the
  * overwhelming share of real verdicts — BOM-less UTF-16 by positional
  * zero-byte distribution (Latin-script UTF-16 zeroes every other byte;
  * the universalchardet zero-byte heuristic), and windows-1252 vs
  * ISO-8859-1 by C1-range occupancy (0x80-0x9F are printable
  * punctuation in cp1252 but control characters latin-1 text never
  * carries, which is why the WHATWG encoding standard maps latin-1
  * labels to cp1252) — then strict UTF-8 validation (→ US-ASCII if no
  * multi-byte sequences), falling back to ISO-8859-1 (every byte
  * sequence is valid latin-1, the reference's terminal fallback). The
  * full ICU n-gram language/charset models stay out (no ICU
  * dependency); these two deterministic heuristics are the tier's
  * publishable core. */
object CharsetSniff {
  // cp1252's five unmapped code points; any OTHER C1 byte is printable
  // punctuation there (curly quotes, dashes, euro) and a strong cp1252
  // signal, while in latin-1 the whole range is control characters
  private def definedInCp1252(c: Int): Boolean =
    c != 0x81 && c != 0x8d && c != 0x8f && c != 0x90 && c != 0x9d

  /** CJK/Cyrillic tier of the statistical cascade (the role the
    * reference delegates to ICU/Mozilla detectors — CharsetUtils.java's
    * detectCharacterEncoding fallbacks — re-derived from the PUBLIC
    * encoding structures alone, no trained models):
    *
    *  - Shift_JIS is structurally distinctive: lead bytes 0x81–0x9F
    *    (excluding the EUC-JP SS2/SS3 bytes 0x8E/0x8F) exist in no EUC
    *    encoding, and hiragana/katakana — 0x82xx/0x83xx — make them
    *    ubiquitous in real Japanese pages. Requires a fully valid SJIS
    *    parse plus ≥2 such leads (a stray cp1252 curly quote can forge
    *    one).
    *  - The EUC family (EUC-JP / EUC-KR / GB2312) shares the
    *    0xA1–0xFE pair structure, so validity alone cannot split it;
    *    the split uses row occupancy: kana rows 0xA4/0xA5 (or an SS2
    *    half-width kana) ⇒ EUC-JP; hangul occupies rows ≤ 0xC8 while
    *    GB2312's pinyin-ordered hanzi spread well past it, so ≥95 % of
    *    leads ≤ 0xC8 ⇒ EUC-KR, else GB2312.
    *  - windows-1251 Cyrillic text is ≥40 % letters in 0xC0–0xFF with
    *    odd-length letter runs (word lengths) that break any EUC pair
    *    parse; Latin cp1252 text never reaches that density (accents
    *    are a few percent of bytes).
    *
    * Returns null when no legacy profile matches (the cp1252/latin-1
    * single-byte tier then decides). */
  private def sniffLegacyMultiByte(b: Array[Byte]): String = {
    val n = b.length
    def at(i: Int) = b(i) & 0xff
    // Shift_JIS validity + structural-lead count
    var i = 0
    var sjisValid = true
    var sjisStrong = 0
    while (sjisValid && i < n) {
      val c = at(i)
      if (c < 0x80) i += 1
      else if (c >= 0xa1 && c <= 0xdf) i += 1 // half-width kana
      else if ((c >= 0x81 && c <= 0x9f) || (c >= 0xe0 && c <= 0xef)) {
        if (i + 1 >= n) sjisValid = false
        else {
          val t = at(i + 1)
          if ((t >= 0x40 && t <= 0x7e) || (t >= 0x80 && t <= 0xfc)) {
            if (c <= 0x9f && c != 0x8e && c != 0x8f) sjisStrong += 1
            i += 2
          } else sjisValid = false
        }
      } else sjisValid = false
    }
    if (sjisValid && sjisStrong >= 2) return "SHIFT_JIS"
    // EUC family validity + row occupancy
    var j = 0
    var eucValid = true
    var pairs = 0
    var kanaRow = 0
    var leadHigh = 0 // leads past the hangul region
    var ss2 = 0
    while (eucValid && j < n) {
      val c = at(j)
      if (c < 0x80) j += 1
      else if (c == 0x8e) { // EUC-JP SS2 (half-width kana)
        if (j + 1 < n && at(j + 1) >= 0xa1 && at(j + 1) <= 0xdf) { ss2 += 1; j += 2 }
        else eucValid = false
      } else if (c >= 0xa1 && c <= 0xfe) {
        if (j + 1 < n && at(j + 1) >= 0xa1 && at(j + 1) <= 0xfe) {
          pairs += 1
          if (c == 0xa4 || c == 0xa5) kanaRow += 1
          if (c > 0xc8) leadHigh += 1
          j += 2
        } else eucValid = false
      } else eucValid = false
    }
    if (eucValid && (pairs >= 2 || ss2 > 0)) {
      if (ss2 > 0 || kanaRow * 10 >= pairs) return "EUC-JP"
      if (leadHigh * 20 <= pairs) return "EUC-KR"
      return "GB2312"
    }
    // windows-1251 density test
    var k = 0
    var hi = 0
    var cyr = 0
    while (k < n) {
      val c = at(k)
      if (c >= 0x80) { hi += 1; if (c >= 0xc0) cyr += 1 }
      k += 1
    }
    if (n > 0 && cyr * 5 >= n * 2 && cyr * 10 >= hi * 9) return "WINDOWS-1251"
    null
  }

  def sniffCharset(b: Array[Byte]): UTF8String = {
    val n = b.length
    def at(i: Int) = b(i) & 0xff
    val name =
      if (n >= 4 && at(0) == 0xff && at(1) == 0xfe && at(2) == 0 && at(3) == 0) "UTF-32LE"
      else if (n >= 4 && at(0) == 0 && at(1) == 0 && at(2) == 0xfe && at(3) == 0xff) "UTF-32BE"
      else if (n >= 3 && at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf) "UTF-8"
      else if (n >= 2 && at(0) == 0xff && at(1) == 0xfe) "UTF-16LE"
      else if (n >= 2 && at(0) == 0xfe && at(1) == 0xff) "UTF-16BE"
      else {
        // BOM-less UTF-16 (statistical tier): Latin-script UTF-16 text
        // zeroes (nearly) every high byte — odd positions for LE, even
        // for BE — while no single/multi-byte text carries NULs at all.
        // Thresholds: ≥40% of the expected positions zero, ≤5% strays
        // on the other side. Runs BEFORE UTF-8 validation because NULs
        // are valid UTF-8 and an ASCII-in-UTF-16LE buffer would
        // otherwise sniff as US-ASCII with half its bytes NUL.
        var zeroEven = 0
        var zeroOdd = 0
        var z = 0
        while (z < n) {
          if (at(z) == 0) { if ((z & 1) == 0) zeroEven += 1 else zeroOdd += 1 }
          z += 1
        }
        val half = n / 2
        if (n >= 8 && zeroOdd * 5 >= half * 2 && zeroEven * 20 <= half) "UTF-16LE"
        else if (n >= 8 && zeroEven * 5 >= half * 2 && zeroOdd * 20 <= half) "UTF-16BE"
        else {
        // strict UTF-8 validation; track whether any multi-byte seq occurs
        var i = 0
        var multi = false
        var valid = true
        while (valid && i < n) {
          val c = at(i)
          val len =
            if (c < 0x80) 1
            else if ((c & 0xe0) == 0xc0 && c >= 0xc2) 2 // reject overlongs C0/C1
            else if ((c & 0xf0) == 0xe0) 3
            else if ((c & 0xf8) == 0xf0 && c <= 0xf4) 4
            else 0
          if (len == 0 || i + len > n) valid = false
          else {
            var j = 1
            while (valid && j < len) {
              if ((at(i + j) & 0xc0) != 0x80) valid = false
              j += 1
            }
            // strictness beyond the continuation mask: reject overlong
            // 3/4-byte forms, UTF-16 surrogate encodings (CESU-8), and
            // code points past U+10FFFF — all invalid UTF-8 that a
            // lenient scan would mislabel instead of falling to latin-1
            if (valid && len == 3) {
              if (c == 0xe0 && at(i + 1) < 0xa0) valid = false // overlong
              if (c == 0xed && at(i + 1) >= 0xa0) valid = false // surrogate
            }
            if (valid && len == 4) {
              if (c == 0xf0 && at(i + 1) < 0x90) valid = false // overlong
              if (c == 0xf4 && at(i + 1) >= 0x90) valid = false // > U+10FFFF
            }
            if (valid) {
              if (len > 1) multi = true
              i += len
            }
          }
        }
        if (valid && !multi) "US-ASCII"
        else if (valid) "UTF-8"
        else {
          val legacy = sniffLegacyMultiByte(b)
          if (legacy != null) legacy
          else {
          // single-byte tier: a C1-range byte that cp1252 maps to a
          // printable character marks windows-1252; latin-1 text never
          // contains C1 controls
          var k = 0
          var cp1252 = false
          while (!cp1252 && k < n) {
            val c = at(k)
            if (c >= 0x80 && c <= 0x9f && definedInCp1252(c)) cp1252 = true
            k += 1
          }
          if (cp1252) "WINDOWS-1252" else "ISO-8859-1"
          }
        }
        }
      }
    UTF8String.fromString(name)
  }
}

/** Codegen'd Catalyst expressions for the hot scalar functions
  * (SURVEY §7.3: promote UDFs to Expressions). Unlike a Scala UDF, these
  * stay inside WholeStageCodegen: null checks are generated, inputs stay
  * UTF8String (no Row boxing), and the call is a static invoke. */
abstract class NativeUnary(fn: String, in: DataType, out: DataType)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = out
  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckBridge.check(prettyName, Seq(in), Seq(child.dataType))
  override def prettyName: String = fn
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFns.$fn($c)")
}

/** Binary counterpart — declares input types so a misuse like
  * `jaccard3(42, x)` fails at analysis time, not with a codegen
  * ClassCastException mid-job. */
abstract class NativeBinary(fn: String, in: Seq[DataType], out: DataType)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {
  override def dataType: DataType = out
  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckBridge.check(prettyName, in, Seq(left.dataType, right.dataType))
  override def prettyName: String = fn
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NativeFns.$fn($a, $b)")
}

/** 64-bit Rabin fingerprint of a string (FPGenerator.std64 parity). */
case class RabinFp64Expr(child: Expression)
    extends NativeUnary("rabinFp64", StringType, LongType) {
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.rabinFp64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): RabinFp64Expr = copy(child = c)
}

/** 64-bit SimHash of a text (util/SimHash.java:52 semantics). */
case class Simhash64Expr(child: Expression)
    extends NativeUnary("simhash64", StringType, LongType) {
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.simhash64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Simhash64Expr = copy(child = c)
}

/** The 20 C(6,3) LSH band keys of a simhash (DeduperUtils.java:199-300). */
case class BandKeysExpr(child: Expression)
    extends NativeUnary("bandKeys", LongType, ArrayType(LongType, containsNull = false)) {
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.bandKeys(input.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): BandKeysExpr = copy(child = c)
}

/** Byte-level charset sniff (CharsetUtils.bestEffortDetectCharset's
  * deterministic tiers; see [[CharsetSniff]]). */
case class SniffCharsetExpr(child: Expression)
    extends NativeUnary("sniffCharset", org.apache.spark.sql.types.BinaryType,
      StringType) {
  override def prettyName: String = "sniff_charset"
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.sniffCharset(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): SniffCharsetExpr = copy(child = c)
}

/** Checksum of every `stride`-th payload byte, one pass. */
case class StrideSumExpr(child: Expression, stride: Int)
    extends NativeUnary("strideSum", org.apache.spark.sql.types.BinaryType, LongType) {
  require(stride > 0, s"stride_sum requires a positive stride, got $stride")
  override def prettyName: String = "stride_sum"
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.strideSum(input.asInstanceOf[Array[Byte]], stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFns.strideSum($c, $stride)")
  override protected def withNewChildInternal(c: Expression): StrideSumExpr = copy(child = c)
}

/** One-pass high-nibble byte histogram (16 long counts). */
case class NibbleHist16Expr(child: Expression)
    extends NativeUnary("nibbleHist16", org.apache.spark.sql.types.BinaryType,
      ArrayType(LongType, containsNull = false)) {
  override def prettyName: String = "nibble_hist16"
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.nibbleHist16(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): NibbleHist16Expr = copy(child = c)
}

/** One-pass per-group marker-token counts (see NativeFns.markerCounts).
  * The group spec is a plan-time constant shipped as a codegen reference
  * object — no per-row parsing or allocation. */
case class MarkerCountsExpr(child: Expression, spec: String)
    extends NativeUnary("markerCounts", ArrayType(StringType),
      ArrayType(LongType, containsNull = false)) {
  override def prettyName: String = "marker_counts"
  @transient private lazy val specU = UTF8String.fromString(spec)
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.markerCounts(input.asInstanceOf[ArrayData], specU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSpec", specU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFns.markerCounts($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): MarkerCountsExpr = copy(child = c)
}

/** One-pass 60-bit shingle hashes (see NativeFns.shingleHashes60). */
case class ShingleHashes60Expr(child: Expression)
    extends NativeUnary("shingleHashes60", ArrayType(StringType),
      ArrayType(LongType, containsNull = false)) {
  override def prettyName: String = "shingle_hashes60"
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.shingleHashes60(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): ShingleHashes60Expr = copy(child = c)
}

/** One-pass 40-bit shingle base hashes (see NativeFns.shingleHash40). */
case class ShingleHash40Expr(child: Expression, tag: String)
    extends NativeUnary("shingleHash40", ArrayType(StringType),
      ArrayType(LongType, containsNull = false)) {
  override def prettyName: String = "shingle_hash40"
  @transient private lazy val tagU = UTF8String.fromString(tag)
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.shingleHash40(input.asInstanceOf[ArrayData], tagU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleTag", tagU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFns.shingleHash40($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): ShingleHash40Expr = copy(child = c)
}

/** One-pass content-defined anchor-gram selection (see
  * NativeFns.anchorGrams). */
case class AnchorGramsExpr(child: Expression, gram: Int, nibble: Int)
    extends NativeUnary("anchorGrams", StringType,
      ArrayType(StringType, containsNull = false)) {
  require(gram > 0, s"anchor_grams requires a positive gram, got $gram")
  require(nibble >= 0 && nibble <= 15,
    s"anchor_grams requires a hex nibble 0..15, got $nibble")
  override def prettyName: String = "anchor_grams"
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.anchorGrams(input.asInstanceOf[UTF8String], gram, nibble)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeFns.anchorGrams($c, $gram, $nibble)")
  override protected def withNewChildInternal(c: Expression): AnchorGramsExpr = copy(child = c)
}

/** One-pass winnowing document fingerprint (see NativeFns.docFp). */
case class DocFpExpr(child: Expression, k: Int)
    extends NativeUnary("docFp", StringType, StringType) {
  require(k > 0, s"doc_fp requires a positive k, got $k")
  override def prettyName: String = "doc_fp"
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.docFp(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFns.docFp($c, $k)")
  override protected def withNewChildInternal(c: Expression): DocFpExpr = copy(child = c)
}

/** Distinct 3-char shingles of a text (Shingle.java:32-47 semantics). */
case class Shingles3Expr(child: Expression)
    extends NativeUnary("shingles3", StringType,
      ArrayType(StringType, containsNull = false)) {
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.shingles3(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Shingles3Expr = copy(child = c)
}

/** Exact shingle-set Jaccard (Shingle.jaccard_similarity_coeff). */
case class Jaccard3Expr(left: Expression, right: Expression)
    extends NativeBinary("jaccard3",
      Seq(ArrayType(StringType), ArrayType(StringType)), DoubleType) {
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.jaccard3(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Jaccard3Expr =
    copy(left = l, right = r)
}

/** Exact shingle-set Jaccard over PRE-SORTED arrays (merge walk —
  * allocation-free; inputs must be `array_sort`ed, see
  * NativeFns.jaccard3Sorted). */
case class Jaccard3SortedExpr(left: Expression, right: Expression)
    extends NativeBinary("jaccard3Sorted",
      Seq(ArrayType(StringType), ArrayType(StringType)), DoubleType) {
  override def prettyName: String = "jaccard3_sorted"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.jaccard3Sorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Jaccard3SortedExpr =
    copy(left = l, right = r)
}

/** Exact intersection size of two PRE-SORTED distinct string arrays
  * (see NativeFns.interSorted). */
case class InterSortedExpr(left: Expression, right: Expression)
    extends NativeBinary("interSorted",
      Seq(ArrayType(StringType), ArrayType(StringType)), IntegerType) {
  override def prettyName: String = "inter_sorted"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.interSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterSortedExpr =
    copy(left = l, right = r)
}

/** Sequential dot product of two double arrays. */
case class DotSeqExpr(left: Expression, right: Expression)
    extends NativeBinary("dotSeq",
      Seq(ArrayType(DoubleType), ArrayType(DoubleType)), DoubleType) {
  override def prettyName: String = "dot_seq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotSeqExpr =
    copy(left = l, right = r)
}

/** MinHash signature from the two 40-bit base-hash arrays. */
case class MinhashSigExpr(left: Expression, right: Expression, k: Int, prime: Long)
    extends NativeBinary("minhashSig",
      Seq(ArrayType(LongType), ArrayType(LongType)), ArrayType(LongType, containsNull = true)) {
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.minhashSig(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k, prime)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NativeFns.minhashSig($a, $b, $k, ${prime}L)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinhashSigExpr =
    copy(left = l, right = r)
}

object NativeExpressions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)

  def rabinFp64(c: Column): Column = ColumnBridge.column(RabinFp64Expr(e(c)))
  def docFp(c: Column, k: Int): Column = ColumnBridge.column(DocFpExpr(e(c), k))
  def markerCounts(c: Column, spec: String): Column =
    ColumnBridge.column(MarkerCountsExpr(e(c), spec))
  def shingleHash40(c: Column, tag: String): Column =
    ColumnBridge.column(ShingleHash40Expr(e(c), tag))
  def shingleHashes60(c: Column): Column =
    ColumnBridge.column(ShingleHashes60Expr(e(c)))
  def simhash64(c: Column): Column = ColumnBridge.column(Simhash64Expr(e(c)))
  def bandKeys(c: Column): Column = ColumnBridge.column(BandKeysExpr(e(c)))
  def shingles3(c: Column): Column = ColumnBridge.column(Shingles3Expr(e(c)))
  def jaccard3(a: Column, b: Column): Column =
    ColumnBridge.column(Jaccard3Expr(e(a), e(b)))
  def jaccard3Sorted(a: Column, b: Column): Column =
    ColumnBridge.column(Jaccard3SortedExpr(e(a), e(b)))
  def interSorted(a: Column, b: Column): Column =
    ColumnBridge.column(InterSortedExpr(e(a), e(b)))
  def dotSeq(a: Column, b: Column): Column =
    ColumnBridge.column(DotSeqExpr(e(a), e(b)))
  def minhashSig(h1: Column, h2: Column, k: Int, prime: Long): Column =
    ColumnBridge.column(MinhashSigExpr(e(h1), e(h2), k, prime))
  def sniffCharset(c: Column): Column = ColumnBridge.column(SniffCharsetExpr(e(c)))
  def nibbleHist16(c: Column): Column = ColumnBridge.column(NibbleHist16Expr(e(c)))
  def strideSum(c: Column, stride: Int): Column =
    ColumnBridge.column(StrideSumExpr(e(c), stride))
  def anchorGrams(c: Column, gram: Int, nibble: Int): Column =
    ColumnBridge.column(AnchorGramsExpr(e(c), gram, nibble))
}
