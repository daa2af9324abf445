package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Punycode

/** Punycode bootstring: RFC 3492 §7.1 sample strings, java.net.IDN as
  * the independent spec referee over a generated label sweep, the
  * famous real-world A-labels, roundtrip, and malformation rejects. */
class PunycodeSpec extends AnyFunSuite {

  test("RFC 3492 sample strings decode and re-encode exactly") {
    // (A) Arabic (Egyptian) and (K) Japanese from RFC 3492 §7.1 —
    // codepoint sequences transcribed from the RFC's u+ lists
    val arabic = Array(0x0644, 0x064A, 0x0647, 0x0645, 0x0627, 0x0628,
      0x062A, 0x0643, 0x0644, 0x0645, 0x0648, 0x0634, 0x0639, 0x0631,
      0x0628, 0x064A, 0x061F)
    val arabicEnc = "egbpdaj6bu4bxfgehfvwxn"
    assert(Punycode.encode(arabic) == arabicEnc)
    assert(Punycode.decode(arabicEnc).toSeq == arabic.toSeq)
    // (L) "3<nen>B<gumi><kinpachi><sensei>" — mixed ASCII + kanji with
    // the delimiter in play
    val mixed = Array('3'.toInt, 0x5E74, 'B'.toInt, 0x7D44, 0x91D1,
      0x516B, 0x5148, 0x751F)
    val mixedEnc = "3B-ww4c5e180e575a65lsy2b"
    assert(Punycode.encode(mixed) == mixedEnc)
    assert(Punycode.decode(mixedEnc).toSeq == mixed.toSeq)
  }

  test("real-world A-labels") {
    assert(Punycode.toUnicode("xn--mnchen-3ya") == "münchen")
    assert(Punycode.toAscii("münchen") == "xn--mnchen-3ya")
    assert(Punycode.toAscii("bücher") == "xn--bcher-kva")
    assert(Punycode.toUnicode("xn--bcher-kva") == "bücher")
    // pure ASCII passes through un-prefixed, both directions
    assert(Punycode.toAscii("example") == "example")
    assert(Punycode.toUnicode("example") == "example")
  }

  test("java.net.IDN referees both directions over a generated sweep") {
    // nameprep-invariant repertoire: java.net.IDN is IDNA2003 and
    // would map ß→ss / uppercase→lowercase before encoding
    val rep = "ab9äé京πш".codePoints().toArray
    for (seed <- 0L until 400L) {
      val len = (seed % 8 + 3).toInt
      val u = new String(
        Array.tabulate(len)(i => rep(((seed * 7 + i * 13) % rep.length).toInt)),
        0, len)
      val ours = Punycode.toAscii(u)
      assert(ours == java.net.IDN.toASCII(u), s"seed=$seed u=$u")
      assert(Punycode.toUnicode(ours) == u, s"seed=$seed roundtrip")
      assert(java.net.IDN.toUnicode(ours) == u, s"seed=$seed jdk-back")
    }
  }

  test("well-formed bootstrings past Unicode return null, never throw") {
    // RFC 3492 bounds deltas only against Int overflow — a syntactically
    // valid label can still name a codepoint past U+10FFFF ("99999b" →
    // 0x5B54E9) or inside the surrogate block; both must reject per the
    // null-on-malformation contract, not throw from String construction
    assert(Punycode.toUnicode("xn--99999b") == null)
    assert(Punycode.decode("99999b") == null)
    // a surrogate codepoint (U+D800 = delta from initial n=128)
    val surr = Punycode.encode(Array(0xD7FF)) // last pre-surrogate cp: fine
    assert(Punycode.decode(surr).toSeq == Seq(0xD7FF))
    // hand-build a delta landing exactly on U+D800: encode accepts raw
    // ints, so synthesize via encode of the neighboring plane instead —
    // sweep a digit fuzz around valid labels and require null-or-valid
    for (base <- Seq("99999b", "tdb0d", surr); i <- base.indices;
         c <- Seq('a', 'z', '9')) {
      val mut = base.updated(i, c)
      val got = Punycode.decode(mut) // must never throw
      if (got != null)
        assert(got.forall(cp => cp >= 0 && cp <= 0x10FFFF &&
          !(cp >= 0xD800 && cp <= 0xDFFF)), s"mut=$mut")
    }
    // toUnicode on every mutant must be null or a constructible string
    for (i <- 0 until 6; c <- 'a' to 'z')
      Punycode.toUnicode("xn--" + "99999b".updated(i, c))
  }

  test("random-codepoint roundtrip across the BMP") {
    // arbitrary BMP codepoints (minus surrogates) through encode →
    // decode — the delta/bias machinery on unstructured input
    for (seed <- 0 until 100) {
      val rnd = new scala.util.Random(seed)
      val n = rnd.nextInt(12) + 1
      val cps = Array.fill(n) {
        var c = 0
        do c = rnd.nextInt(0xFFFF) + 1 while (c >= 0xD800 && c <= 0xDFFF)
        c
      }
      val enc = Punycode.encode(cps)
      assert(enc != null, s"seed=$seed")
      assert(Punycode.decode(enc).toSeq == cps.toSeq, s"seed=$seed")
    }
  }

  test("malformation rejects, never throws") {
    // bad digit, truncated integer, basic part with non-ASCII
    assert(Punycode.decode("abc-!") == null)
    assert(Punycode.decode("ü-abc") == null)
    // overflow: a variable-length integer past Int.MaxValue must
    // reject, not wrap (each 'z' digit multiplies the weight)
    assert(Punycode.decode("a-" + "z" * 40) == null)
    // every prefix of a valid encoding returns (decodes or rejects),
    // never throws
    val enc = Punycode.encode("3年B組金八先生".codePoints().toArray)
    for (n <- 0 to enc.length) Punycode.decode(enc.take(n))
  }
}
