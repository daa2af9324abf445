package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PdfText

/** m42 PDF text extraction: analytic replay over all 251 seeds (flate
  * and raw streams, flat and nested page trees), operator-level checks
  * of the content-stream scan (escapes, TJ kerning, hex, ', comments),
  * and byte-flip/truncation fuzz (never throws). */
class PdfTextSpec extends AnyFunSuite {

  test("all 251 seeds replay analytically") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 6
      val e = PdfText.extract(PdfText.encodePdfText(docId, "fr"))
      assert(e != null, s"seed $k")
      assert(e.nPages == k % 4 + 1, s"seed $k")
      assert(e.text == PdfText.expectedText(docId, "fr"),
        s"seed $k:\n${e.text}\n---\n${PdfText.expectedText(docId, "fr")}")
    }
  }

  test("content scan: escapes, octal, nesting, kerning, hex, comments") {
    assert(PdfText.contentText(
      "BT (a\\(b\\)c) Tj ET") == "a(b)c")
    assert(PdfText.contentText(
      "BT (oct \\101\\102) Tj ET") == "oct AB")
    assert(PdfText.contentText(
      "BT ((nested) parens) Tj ET") == "(nested) parens")
    assert(PdfText.contentText(
      "BT [(x) -250 (y) 12 (z)] TJ ET") == "xyz")
    assert(PdfText.contentText("BT <486921> Tj ET") == "Hi!")
    // odd final hex digit pads with 0: "48 69 20" = "Hi " -> fold trims
    assert(PdfText.contentText("BT <48692> Tj ET") == "Hi")
    assert(PdfText.contentText(
      "BT (one) Tj T* (two) Tj ET") == "one\ntwo")
    assert(PdfText.contentText(
      "BT (head) Tj (next) ' ET") == "head\nnext")
    assert(PdfText.contentText(
      "% comment (not text) Tj\nBT (real) Tj ET") == "real")
    // text outside BT/ET is ignored
    assert(PdfText.contentText("(loose) Tj BT (in) Tj ET") == "in")
    // line continuation inside a literal
    assert(PdfText.contentText("BT (ab\\\ncd) Tj ET") == "abcd")
  }

  test("budget: a stream declaring more than the cap rejects") {
    val good = PdfText.encodePdfText(10L, "en") // k=10: flate
    // corrupt the /Length of the first content stream to a huge value
    val s = new String(good, "ISO-8859-1")
    val at = s.indexOf("/Length ")
    val end = s.indexOf(" ", at + 8)
    val mut = (s.substring(0, at) + "/Length 999999999" + s.substring(end))
      .getBytes("ISO-8859-1")
    // offsets after the first stream shift, so the whole doc degrades —
    // the point is: no throw, no huge allocation
    PdfText.extract(mut)
  }

  test("byte-flip and truncation fuzz never throws") {
    val bases = Seq(PdfText.encodePdfText(4L, "en"), // flate
      PdfText.encodePdfText(5L, "en")) // raw, nested(k=5)
    val rnd = new scala.util.Random(42)
    for (base <- bases) {
      for (_ <- 0 until 300) {
        val mut = base.clone()
        for (_ <- 0 to rnd.nextInt(4)) {
          val i = rnd.nextInt(mut.length)
          mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        PdfText.extract(mut)
      }
      for (_ <- 0 until 100)
        PdfText.extract(java.util.Arrays.copyOfRange(base, 0,
          rnd.nextInt(base.length)))
    }
    assert(PdfText.extract(null) == null)
    assert(PdfText.extract("%PDF-1.7 but nothing else".getBytes) == null)
  }
}
