package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Brotli, BrotliFixture, Http}
import graft.ops.{Av1, Avif, DocText, PdfText, Tables, Woff2}

/** Never-throws fuzz for the round-17 byte walkers (the
  * Round16CodecFuzzSpec discipline): adversarial prefixes splice real
  * fixture heads onto random tails so every walker gets past its magic
  * check and into length arithmetic; suffixed variants feed the
  * backward scans (zip EOCD under OOXML, PDF startxref). Fixed seed —
  * the corpus is deterministic. */
class Round17CodecFuzzSpec extends AnyFunSuite {

  private def corpus: Seq[Array[Byte]] = {
    val raw = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val magics: Seq[Array[Byte]] = Seq(
      // OOXML/EPUB zips cut inside the central directory / members
      DocText.encodeDocx(1L, "en").take(90),
      DocText.encodeEpub(2L, "en").take(120),
      DocText.encodeXlsx(3L, "en").take(90),
      DocText.encodePptx(4L, "en").take(120),
      Array[Byte](0x50, 0x4b, 0x03, 0x04),
      // AVIF: ftyp head; meta box cut inside iloc
      Avif.encodeAvif(1L).take(24),
      Avif.encodeAvif(2L).take(90),
      // AV1 OBU: header byte + leb128 size with fuzzed payload
      Array[Byte](0x0a, 0x20),
      Av1.encodeSeqHeader(640, 480, 7L).take(4),
      // WOFF2: signature + fuzzed directory; a real font cut in the blob
      "wOF2".getBytes("ISO-8859-1"),
      Woff2.encodeWoff2(1L).take(60),
      // PDF with text: header; a real doc cut inside a content stream
      "%PDF-1.7\n".getBytes("ISO-8859-1"),
      PdfText.encodePdfText(2L, "en").take(200),
      "startxref\n17\n%%EOF\n".getBytes("ISO-8859-1"),
      // brotli: a real assembled stream cut mid-meta-block; stored-mode
      // head; the dictionary-heavy golden's head
      BrotliFixture.encode(3L, "en").take(12),
      BrotliFixture.encodeRaw("seed".getBytes).take(5),
      // gzip magic for the content-encoding chain
      Array[Byte](0x1f, 0x8b.toByte, 8, 0))
    val prefixed = for {
      m <- Gen.oneOf(magics)
      tail <- raw
    } yield m ++ tail
    val suffixed = for {
      head <- raw
      m <- Gen.oneOf(magics)
    } yield head ++ m // magic at the END — EOCD/startxref backward scans
    val gen = Gen.listOfN(700,
      Gen.frequency(1 -> raw, 2 -> prefixed, 1 -> suffixed))
    gen(Gen.Parameters.default, Seed(17L)).get
  }

  test("round-17 walkers never throw and never report impossible shapes") {
    corpus.foreach { b =>
      val dt = DocText.extract(b)
      if (dt != null) assert(dt.nParts >= 1 && dt.text != null)
      val av = Avif.avifMeta(b)
      if (av != null) assert(av.nItems >= 1 && av.width >= 0)
      Avif.primaryItemData(b) // bytes or null, never a throw
      val a1 = Av1.seqHeader(b)
      if (a1 != null) assert(a1.width >= 1 && a1.height >= 1)
      val w2 = Woff2.woff2Meta(b)
      if (w2 != null) assert(w2.nTables >= 1 && w2.sumOrig >= 0)
      val pt = PdfText.extract(b)
      if (pt != null) assert(pt.nPages >= 1 && pt.text != null)
      val br = Brotli.decode(b, maxOut = 1 << 20) // tight bomb budget
      if (br != null) assert(br.length <= (1 << 20))
      // content-encoding chain over fuzz bytes under every coding name
      for (enc <- Seq("gzip", "deflate", "br", "identity", "bogus", null))
        Http.decodeContentEncoding(enc, b, maxOut = 1 << 20)
      // string walkers over the bytes as latin-1 text
      val s = new String(b.take(4096), "ISO-8859-1")
      Tables.extractTables(s).foreach { case (_, nr, nc, hh, _) =>
        assert(nr >= 1 && nc >= 1 && (hh == 0 || hh == 1))
      }
    }
  }
}
