package graft.core

/** Punycode (RFC 3492 bootstring with the IDNA parameters) — the
  * ASCII-compatible encoding behind every `xn--` host label. URL
  * canonicalization over a modern corpus cannot compare, dedupe, or
  * group internationalized domains without it (two byte-different
  * hosts `xn--mnchen-3ya.de` / `münchen.de` are the SAME registrable
  * name); the reference's canonicalizer predates IDNA deployment and
  * treats the A-label as opaque bytes
  * (`src/org/commoncrawl/util/URLUtils.java`). Spec-derived, integer-
  * exact, overflow-guarded per §6.4; java.net.IDN referees the spec
  * parity in PunycodeSpec.
  */
object Punycode {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128
  private val MaxInt = Int.MaxValue

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitValue(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  /** Encode unicode codepoints to the punycode ASCII form (no xn--
    * prefix); null on overflow (labels past spec limits). */
  def encode(input: Array[Int]): String = {
    val out = new StringBuilder
    val basic = input.filter(_ < InitialN)
    basic.foreach(c => out.append(c.toChar))
    val b = basic.length
    var h = b
    if (b > 0 && h < input.length) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < input.length) {
      var m = MaxInt
      input.foreach(c => if (c >= n && c < m) m = c)
      if (m - n > (MaxInt - delta) / (h + 1)) return null // overflow
      delta += (m - n) * (h + 1)
      n = m
      var i = 0
      while (i < input.length) {
        val c = input(i)
        if (c < n) {
          delta += 1
          if (delta == MaxInt) return null
        }
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t =
              if (k <= bias) TMin
              else if (k >= bias + TMax) TMax
              else k - bias
            if (q < t) { out.append(digitChar(q)); done = true }
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
        i += 1
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** Decode a punycode ASCII form (no xn-- prefix) back to unicode
    * codepoints; null on any malformation (bad digit, truncated
    * variable-length integer, overflow). */
  def decode(input: String): Array[Int] = {
    val lastDelim = input.lastIndexOf('-')
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    if (lastDelim > 0) {
      var j = 0
      while (j < lastDelim) {
        val c = input.charAt(j)
        if (c >= InitialN) return null // basic part must be ASCII
        out += c.toInt
        j += 1
      }
      i = lastDelim + 1
    } else if (lastDelim == 0) i = 1 // empty basic part, lone delimiter
    var n = InitialN
    var idx = 0
    var bias = InitialBias
    while (i < input.length) {
      val oldIdx = idx
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (i >= input.length) return null // truncated integer
        val d = digitValue(input.charAt(i))
        i += 1
        if (d < 0) return null
        if (d > (MaxInt - idx) / w) return null // overflow
        idx += d * w
        val t =
          if (k <= bias) TMin
          else if (k >= bias + TMax) TMax
          else k - bias
        if (d < t) done = true
        else {
          if (w > MaxInt / (Base - t)) return null
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(idx - oldIdx, out.length + 1, oldIdx == 0)
      if (idx / (out.length + 1) > MaxInt - n) return null
      n += idx / (out.length + 1)
      idx %= out.length + 1
      if (n < InitialN) return null // decoded a basic codepoint
      // RFC 3492 bounds only against integer overflow; a well-formed
      // bootstring can still name a codepoint outside Unicode (e.g.
      // "99999b" → 0x5B54E9) or a surrogate, either of which would make
      // String construction throw instead of honoring the null-on-
      // malformation contract for untrusted xn-- labels.
      if (n > 0x10FFFF || (n >= 0xD800 && n <= 0xDFFF)) return null
      out.insert(idx, n)
      idx += 1
    }
    out.toArray
  }

  /** Host-label helpers: A-label ⇄ U-label (the xn-- convention). */
  def toAscii(label: String): String = {
    val cps = label.codePoints().toArray
    if (cps.forall(_ < InitialN)) label
    else {
      val enc = encode(cps)
      if (enc == null) null else "xn--" + enc
    }
  }

  def toUnicode(label: String): String = {
    if (!label.startsWith("xn--")) return label
    val cps = decode(label.substring(4))
    if (cps == null) null
    else new String(cps, 0, cps.length)
  }
}
