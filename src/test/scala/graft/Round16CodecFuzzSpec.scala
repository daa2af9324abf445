package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Http, HtmlMeta}
import graft.ops.{Exif, Ico, JpegProgressive, Mp3, Ogg, Pdf, Tar, Vp8, WebpAnim, Zip}
import graft.sources.{ParquetFooter, ZstdMembers}

/** Never-throws fuzz for the round-16 byte walkers (the
  * ByteParserFuzzSpec discipline): at corpus scale malformed bytes are
  * data, so every census/decoder must return its null/sentinel on ANY
  * input — including inputs that start with valid magic and lie after
  * it. Adversarial prefixes splice real fixture heads onto random
  * tails so the walkers get past the cheap checks and into length
  * arithmetic. Fixed seed — the corpus is deterministic. */
class Round16CodecFuzzSpec extends AnyFunSuite {

  private def corpus: Seq[Array[Byte]] = {
    val raw = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val magics: Seq[Array[Byte]] = Seq(
      // zstd: frame magic; skippable magic with a fuzzed size; a real
      // frame head cut before its blocks
      Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte),
      Array[Byte](0x50, 0x2a, 0x4d, 0x18),
      com.github.luben.zstd.Zstd.compress("seed".getBytes, 3).take(7),
      // MP3: bare ID3 header; ID3 + first frame sync cut mid-frame
      "ID3".getBytes("ISO-8859-1") ++ Array[Byte](3, 0, 0),
      Mp3.encodeMp3(1L, "en", 7L).take(40),
      Array[Byte](0xff.toByte, 0xfb.toByte),
      // EXIF: SOI+APP1+"Exif\0\0"+byte-order mark, fuzz decides IFDs
      Exif.encodeExifJpeg(1L).take(22),
      Exif.encodeExifJpeg(2L).take(40),
      // PDF: header + a tail that points startxref into fuzz
      "%PDF-1.4\n".getBytes("ISO-8859-1"),
      Pdf.encodePdf(1L, "en").take(60),
      "startxref\n9\n%%EOF\n".getBytes("ISO-8859-1"),
      // ZIP: local-header magic; a real archive cut inside the central
      // directory; an EOCD with fuzzed counts
      Array[Byte](0x50, 0x4b, 0x03, 0x04),
      Zip.encodeZip(1L, "en").take(80),
      Array[Byte](0x50, 0x4b, 0x05, 0x06),
      // Ogg: page magic + fuzzed header; a real BOS page cut mid-lacing
      "OggS".getBytes("ISO-8859-1") ++ Array[Byte](0),
      Ogg.encodeOggOpus(1L, "en").take(30),
      // TAR: a real ustar header with fuzz deciding the data blocks
      Tar.encodeTar(1L, "en").take(512),
      // ICO: directory claiming entries the payload lacks
      Array[Byte](0, 0, 1, 0, 9, 0),
      Ico.encodeIco(1L).take(24),
      // WebP container: VP8X head with fuzzed chunk stream; a lossy
      // still cut inside the bitstream
      WebpAnim.encodeWebpAnim(2L).take(34), // animated head (k=2)
      Vp8.encodeFixture(1L).take(30),
      // parquet: footer magic with fuzzed length; a real tail cut short
      "PAR1".getBytes("ISO-8859-1"),
      // progressive JPEG: SOI..SOS prefix, fuzz decides the scans
      JpegProgressive.encodeJpegProg(1L, 1, 1).take(120))
    val prefixed = for {
      m <- Gen.oneOf(magics)
      tail <- raw
    } yield m ++ tail
    val suffixed = for {
      head <- raw
      m <- Gen.oneOf(magics)
    } yield head ++ m // magic at the END — the EOCD/PAR1/startxref scans
    val gen = Gen.listOfN(700,
      Gen.frequency(1 -> raw, 2 -> prefixed, 1 -> suffixed))
    gen(Gen.Parameters.default, Seed(16L)).get
  }

  test("round-16 walkers never throw and never report impossible shapes") {
    corpus.foreach { b =>
      val mp3 = Mp3.mp3Meta(b)
      if (mp3 != null) assert(mp3.nFrames >= 1 && mp3.sampleRate > 0)
      val ex = Exif.exifMeta(b)
      if (ex != null) assert(ex.byteOrder == "II" || ex.byteOrder == "MM")
      val pdf = Pdf.pdfMeta(b)
      if (pdf != null) assert(pdf.nObjects >= 0)
      val zip = Zip.zipMeta(b)
      if (zip != null) assert(zip.nEntries >= 0 && zip.sumComp >= 0)
      val ogg = Ogg.oggMeta(b)
      if (ogg != null) assert(ogg.nPages >= 1 && ogg.durationMs >= 0)
      val tar = Tar.tarMeta(b)
      if (tar != null) assert(tar.nEntries >= 1)
      val ico = Ico.icoStats(b)
      if (ico != null) assert(ico.nImages >= 1 && ico.nTransparent >= 0)
      val webp = WebpAnim.webpMeta(b)
      if (webp != null) assert(webp.canvasW >= 1 && webp.canvasH >= 1)
      val pf = ParquetFooter.parse(b)
      if (pf != null) assert(pf.numRows >= 0)
      val (jw, jh, _, _, _, _) = JpegProgressive.decodeJpegProgStats(b)
      assert(jw >= -1 && jh >= -1)
      val (vw, vh, _, _, _, _) = Vp8.decodeWebpVp8Stats(b)
      assert(vw >= -1 && vh >= -1)
      // zstd member walk: parse or IOException — never an unbounded
      // allocation or a hang (budgets bound the loop)
      val ms = new ZstdMembers(new java.io.ByteArrayInputStream(b))
      try {
        var in = ms.nextMember()
        var budget = 64
        while (in != null && budget > 0) {
          in.readAllBytes(); in.close(); in = ms.nextMember(); budget -= 1
        }
      } catch { case _: java.io.IOException => () }
      // string walkers over the bytes as latin-1 text
      val s = new String(b.take(2048), "ISO-8859-1")
      HtmlMeta.parse(s)
      val c = Http.parseSetCookie(s)
      if (c != null) assert(c.name.nonEmpty)
    }
  }
}
