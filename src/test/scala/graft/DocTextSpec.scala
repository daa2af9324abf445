package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DocText

/** m39 document-text extraction: analytic replay over all 251 fixture
  * seeds (docx AND epub, spine reversal included), the JDK
  * ZipOutputStream as an independent archive author for the inflate
  * path, zip-bomb budgets, lying-stream rejection, `..` href
  * quarantine, and byte-flip fuzz (never throws). */
class DocTextSpec extends AnyFunSuite {

  private def docxExpected(docId: Long, lang: String): (Long, String) = {
    val k = ((docId % 251) + 251) % 251
    val np = (k % 7 + 1).toInt
    (np.toLong, (0 until np)
      .map(i => s"Para $i of doc $docId in $lang & more.").mkString("\n"))
  }

  private def epubExpected(docId: Long, lang: String): (Long, String) = {
    val k = ((docId % 251) + 251) % 251
    val nc = (k % 4 + 1).toInt
    val order = if (k % 3 == 0) (nc - 1) to 0 by -1 else 0 until nc
    (nc.toLong, order
      .map(i => s"T$i Chapter $i Doc $docId speaks $lang & reads.")
      .mkString("\n"))
  }

  test("all 251 seeds replay analytically (both kinds)") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 3
      val isDocx = k % 2 == 0
      val bytes =
        if (isDocx) DocText.encodeDocx(docId, "en")
        else DocText.encodeEpub(docId, "en")
      val e = DocText.extract(bytes)
      assert(e != null, s"seed $k")
      val (np, text) =
        if (isDocx) docxExpected(docId, "en") else epubExpected(docId, "en")
      assert(e.kind == (if (isDocx) "ooxml" else "epub"), s"seed $k")
      assert(e.srcName ==
        (if (isDocx) "word/document.xml" else "OEBPS/content.opf"), s"seed $k")
      assert(e.nParts == np, s"seed $k")
      assert(e.text == text, s"seed $k: got '${e.text}'")
    }
  }

  test("JDK-authored docx (independent deflate author) extracts exactly") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes("UTF-8"))
    z.closeEntry()
    z.putNextEntry(new ZipEntry("word/document.xml"))
    z.write(("<w:document><w:body>" +
      "<w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:t xml:space=\"preserve\"> " +
      "world &amp; friends</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>Second   para</w:t></w:r></w:p>" +
      "<w:p><w:pPr/></w:p>" + // no runs: not a text paragraph
      "</w:body></w:document>").getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    val e = DocText.extract(bos.toByteArray)
    assert(e != null && e.kind == "ooxml")
    assert(e.nParts == 2L)
    assert(e.text == "Hello world & friends\nSecond para")
  }

  test("JDK-authored epub honors spine order and strips script/style") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def add(name: String, body: String, stored: Boolean = false): Unit = {
      val e = new ZipEntry(name)
      if (stored) {
        val data = body.getBytes("UTF-8")
        e.setMethod(ZipEntry.STORED)
        e.setSize(data.length)
        val c = new java.util.zip.CRC32(); c.update(data)
        e.setCrc(c.getValue)
      }
      z.putNextEntry(e); z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    add("mimetype", "application/epub+zip", stored = true)
    add("META-INF/container.xml",
      "<container><rootfiles><rootfile full-path='book/pkg.opf'/>" +
        "</rootfiles></container>")
    add("book/pkg.opf",
      "<package><manifest>" +
        "<item id='a' href='a.xhtml'/><item id='b' href='b.xhtml'/>" +
        "</manifest><spine><itemref idref='b'/><itemref idref='a'/>" +
        "</spine></package>")
    add("book/a.xhtml",
      "<html><body><p>Alpha</p><script>x()</script></body></html>")
    add("book/b.xhtml",
      "<html><head><style>b{}</style></head><body>Beta <!--no--> two</body></html>")
    z.close()
    val e = DocText.extract(bos.toByteArray)
    assert(e != null && e.kind == "epub" && e.nParts == 2L)
    assert(e.text == "Beta two\nAlpha") // spine order b, a
  }

  test("zip-bomb budget: declared size over the per-member cap rejects") {
    // JDK-authored archive whose document.xml declares > 8 MiB
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes("UTF-8")); z.closeEntry()
    z.putNextEntry(new ZipEntry("word/document.xml"))
    val big = new Array[Byte]((8 << 20) + 1) // zeros compress tiny
    java.util.Arrays.fill(big, 'a'.toByte)
    z.write(big); z.closeEntry(); z.close()
    assert(DocText.extract(bos.toByteArray) == null)
  }

  test("lying declared size rejects (stream shorter than declared)") {
    val good = DocText.encodeDocx(42L, "en")
    // find the central-directory record for word/document.xml and bump
    // its declared uncompressed size by one — the bounded inflate must
    // detect the short stream and reject, not pad
    val name = "word/document.xml".getBytes("UTF-8")
    def findCd(from: Int): Int = {
      var i = from
      while (i + 46 + name.length <= good.length) {
        if ((good(i) & 0xff) == 0x50 && (good(i + 1) & 0xff) == 0x4b &&
            (good(i + 2) & 0xff) == 0x01 && (good(i + 3) & 0xff) == 0x02 &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(good, i + 46, i + 46 + name.length),
              name)) return i
        i += 1
      }
      -1
    }
    val cd = findCd(0)
    assert(cd >= 0)
    val mut = good.clone()
    mut(cd + 24) = (mut(cd + 24) + 1).toByte // uncomp size low byte
    assert(DocText.extract(mut) == null)
  }

  test("`..` hrefs are quarantined, remaining chapters still extract") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def add(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    val mt = new ZipEntry("mimetype")
    val mtb = "application/epub+zip".getBytes("UTF-8")
    mt.setMethod(ZipEntry.STORED); mt.setSize(mtb.length)
    val c = new java.util.zip.CRC32(); c.update(mtb); mt.setCrc(c.getValue)
    z.putNextEntry(mt); z.write(mtb); z.closeEntry()
    add("META-INF/container.xml",
      "<container><rootfiles><rootfile full-path='p/pkg.opf'/></rootfiles></container>")
    add("p/pkg.opf",
      "<package><manifest><item id='a' href='../secret.xhtml'/>" +
        "<item id='b' href='ok.xhtml'/></manifest>" +
        "<spine><itemref idref='a'/><itemref idref='b'/></spine></package>")
    add("secret.xhtml", "<body>LEAK</body>")
    add("p/ok.xhtml", "<body>fine</body>")
    z.close()
    val e = DocText.extract(bos.toByteArray)
    assert(e != null && e.nParts == 1L && e.text == "fine")
  }

  test("xlsx/pptx seeds replay analytically (numeric slide order)") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 4
      val isXlsx = k % 2 == 0
      val bytes =
        if (isXlsx) DocText.encodeXlsx(docId, "de")
        else DocText.encodePptx(docId, "de")
      val e = DocText.extract(bytes)
      assert(e != null, s"seed $k")
      if (isXlsx) {
        val np = (k % 8 + 1).toInt
        assert(e.kind == "xlsx" && e.srcName == "xl/sharedStrings.xml")
        assert(e.nParts == np, s"seed $k")
        assert(e.text == (0 until np)
          .map(i => s"Cell $i doc $docId in de & co.").mkString("\n"),
          s"seed $k")
      } else {
        val ns = (k % 12 + 1).toInt
        assert(e.kind == "pptx" && e.srcName == "ppt/presentation.xml")
        assert(e.nParts == ns, s"seed $k")
        assert(e.text == (1 to ns)
          .map(i => s"Slide $i title doc $docId\nBullet $i de & done.")
          .mkString("\n"), s"seed $k")
      }
    }
  }

  test("JDK-authored pptx with 11 slides honors numeric order") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def add(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    add("[Content_Types].xml", "<Types/>")
    add("ppt/presentation.xml", "<p/>")
    // zip order: 10, 11, 1..9 — lexicographic AND zip order both wrong
    for (i <- Seq(10, 11) ++ (1 to 9))
      add(s"ppt/slides/slide$i.xml", s"<a:p><a:t>s$i</a:t></a:p>")
    z.close()
    val e = DocText.extract(bos.toByteArray)
    assert(e != null && e.kind == "pptx" && e.nParts == 11)
    assert(e.text == (1 to 11).map(i => s"s$i").mkString("\n"))
  }

  test("byte-flip fuzz never throws (null or valid only)") {
    val seeds = Seq(DocText.encodeDocx(7L, "en"), DocText.encodeEpub(8L, "en"))
    val rnd = new scala.util.Random(17)
    for (base <- seeds; _ <- 0 until 400) {
      val mut = base.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      DocText.extract(mut) // must not throw; result may be null or valid
    }
    // truncations too
    for (base <- seeds; _ <- 0 until 100) {
      val cut = rnd.nextInt(base.length)
      DocText.extract(java.util.Arrays.copyOfRange(base, 0, cut))
    }
  }
}
