package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Zip

/** ZIP census: analytic replay over all fixture seeds, JDK
  * ZipOutputStream as an INDEPENDENT archive author (deflate + stored,
  * comments, real CRCs — our walk must report exactly what went in),
  * and adversarial EOCD/central-directory abuse (never throws). */
class ZipSpec extends AnyFunSuite {

  test("fixture census matches the analytic replay for all 251 seeds") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 5
      val m = Zip.zipMeta(Zip.encodeZip(docId, "en"))
      assert(m != null, s"seed $k")
      val np = (k % 12 + 1).toInt
      val marker = (k % 3).toInt match {
        case 0 => s"<Types doc='$docId'/>".length
        case 1 => "application/epub+zip".length
        case _ => 0
      }
      val payload = (0 until np)
        .map(i => s"entry $i of doc $docId in en".length.toLong).sum
      assert(m.kind == Seq("ooxml", "epub", "zip")((k % 3).toInt))
      assert(m.nEntries == np + (if (k % 3 == 2) 0 else 1))
      assert(m.sumUncomp == payload + marker && m.sumComp == m.sumUncomp)
      assert(m.maxRatioPpm == 1000000L && m.nDeflate == 0L)
      assert(m.nStored == m.nEntries && m.crcOk)
      assert(m.firstName == (if (k % 3 == 0) "[Content_Types].xml"
        else if (k % 3 == 1) "mimetype" else "part/e0.txt"))
    }
  }

  test("JDK-written archives (deflate + stored + comment) census exactly") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    val texts = Seq(
      "alpha.txt" -> ("alpha " * 100),
      "dir/beta.bin" -> "beta-data",
      "gamma.txt" -> ("gamma! " * 37))
    texts.foreach { case (name, body) =>
      val e = new ZipEntry(name)
      z.putNextEntry(e)
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    // one STORED entry (JDK requires pre-set size/crc for STORED)
    val stored = "stored payload".getBytes("UTF-8")
    val se = new ZipEntry("stored.txt")
    se.setMethod(ZipEntry.STORED)
    se.setSize(stored.length.toLong)
    se.setCompressedSize(stored.length.toLong)
    val c = new java.util.zip.CRC32(); c.update(stored)
    se.setCrc(c.getValue)
    z.putNextEntry(se); z.write(stored); z.closeEntry()
    z.setComment("archive comment exercising the EOCD backward scan")
    z.close()
    val m = Zip.zipMeta(bos.toByteArray)
    assert(m != null)
    assert(m.nEntries == 4 && m.nDeflate == 3 && m.nStored == 1)
    assert(m.sumUncomp ==
      texts.map(_._2.getBytes("UTF-8").length.toLong).sum + stored.length)
    assert(m.firstName == "alpha.txt" && m.kind == "zip" && m.crcOk)
    // highly-repetitive text must show a bomb-ish ratio > 1
    assert(m.maxRatioPpm > 1000000L)
  }

  test("adversarial: truncation, CRC lies, entry bombs, fuzz — no throw") {
    assert(Zip.zipMeta(null) == null)
    assert(Zip.zipMeta(Array.empty[Byte]) == null)
    val good = Zip.encodeZip(42L, "fr")
    // flip one payload byte: structure parses, CRC must catch it
    val bad = good.clone()
    // find "entry 0 of doc" payload and corrupt a byte inside it
    val at = new String(good, "ISO-8859-1").indexOf("entry 0 of doc")
    assert(at > 0)
    bad(at) = 'X'.toByte
    val m = Zip.zipMeta(bad)
    assert(m != null && !m.crcOk, "corrupted stored payload must fail CRC")
    // truncation sweep
    val rnd = new scala.util.Random(34)
    for (_ <- 0 until 300) {
      Zip.zipMeta(good.take(rnd.nextInt(good.length)))
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Zip.zipMeta(mut)
    }
    // EOCD claiming an entry count the directory doesn't carry
    val lying = good.clone()
    // EOCD total-entries field is 10 bytes after the magic; find it
    val eocdAt = {
      var i = lying.length - 22
      while (!(lying(i) == 0x50 && lying(i + 1) == 0x4b &&
        lying(i + 2) == 0x05 && lying(i + 3) == 0x06)) i -= 1
      i
    }
    lying(eocdAt + 10) = 0xff.toByte
    lying(eocdAt + 11) = 0x7f.toByte
    assert(Zip.zipMeta(lying) == null)
  }
}
