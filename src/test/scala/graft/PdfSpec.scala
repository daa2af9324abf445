package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pdf

/** PDF census: analytic replay over all fixture seeds, a hand-built
  * multi-subsection xref golden (independent of the fixture encoder),
  * and adversarial offsets/fuzz (never throws). */
class PdfSpec extends AnyFunSuite {

  test("fixture census matches the analytic replay for all 251 seeds") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 4
      val m = Pdf.pdfMeta(Pdf.encodePdf(docId, "de"))
      assert(m != null, s"seed $k")
      assert(m.version == s"1.${k % 8}")
      assert(m.nObjects == k % 30 + 4)
      assert(m.pageCount == k % 30 + 1)
      assert(m.title == s"doc ($docId) \\de", s"seed $k: ${m.title}")
      assert(m.author == s"de author $k")
      assert(m.creationDate ==
        f"D:2026${k % 12 + 1}%02d${k % 28 + 1}%02d120000")
      assert(m.encrypted == (k % 11 == 0))
    }
  }

  test("hand-built golden: multi-subsection xref, no Info dict") {
    // the fixture encoder always writes ONE subsection; real
    // incrementally-updated PDFs split the xref — build one by hand so
    // the walk is tested against the format, not the encoder
    val b = new StringBuilder
    b.append("%PDF-1.4\n")
    val off1 = b.length
    b.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val off2 = b.length
    b.append("2 0 obj\n<< /Type /Pages /Kids [ ] /Count 7 >>\nendobj\n")
    val xrefAt = b.length
    b.append("xref\n")
    b.append("0 1\n0000000000 65535 f \n")
    b.append(f"1 1\n$off1%010d 00000 n \n")
    b.append(f"2 1\n$off2%010d 00000 n \n")
    b.append("trailer\n<< /Size 3 /Root 1 0 R >>\n")
    b.append(s"startxref\n$xrefAt\n%%EOF\n")
    val m = Pdf.pdfMeta(b.toString.getBytes("ISO-8859-1"))
    assert(m != null)
    assert(m.nObjects == 2 && m.pageCount == 7 && !m.encrypted)
    assert(m.title == null && m.author == null)
  }

  test("adversarial input: bad offsets, entry bombs, fuzz — null, no throw") {
    assert(Pdf.pdfMeta(null) == null)
    assert(Pdf.pdfMeta("%PDF-1.4\n%%EOF".getBytes("ISO-8859-1")) == null)
    // startxref pointing past EOF / at garbage
    assert(Pdf.pdfMeta(
      "%PDF-1.4\nxref\ntrailer\nstartxref\n999999\n%%EOF\n"
        .getBytes("ISO-8859-1")) == null)
    // xref claiming 2^30 entries: budget rejects before any allocation
    val bomb = s"%PDF-1.4\nxref\n0 1073741824\ntrailer\n<< /Root 1 0 R >>\nstartxref\n9\n%%EOF\n"
    assert(Pdf.pdfMeta(bomb.getBytes("ISO-8859-1")) == null)
    // root ref whose xref offset points mid-file at a different object
    val lying = {
      val base = Pdf.encodePdf(7L, "en")
      val s = new String(base, "ISO-8859-1")
      // corrupt the first xref data offset to point at the header
      s.replaceFirst("\\d{10} 00000 n", "0000000000 00000 n").getBytes("ISO-8859-1")
    }
    assert(Pdf.pdfMeta(lying) == null) // "1 0 obj" check fails
    val rnd = new scala.util.Random(33)
    for (_ <- 0 until 300) {
      val base = Pdf.encodePdf(rnd.nextInt(100000).toLong, "fr")
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Pdf.pdfMeta(mut) // parse or null; never throws
      Pdf.pdfMeta(base.take(rnd.nextInt(base.length)))
    }
  }
}
