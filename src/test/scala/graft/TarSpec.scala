package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tar

/** TAR census: analytic replay over all fixture seeds, checksum
  * sensitivity (any header flip caught), tar-slip detection on
  * hand-built archives, and malformation fuzz. */
class TarSpec extends AnyFunSuite {

  test("fixture census matches the analytic replay for all 251 seeds") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 8
      val m = Tar.tarMeta(Tar.encodeTar(docId, "nl"))
      assert(m != null, s"seed $k")
      val nf = (k % 9 + 1).toInt
      val esc = if (k % 6 == 0) 1 else 0
      val lens = (0 until nf).map(i =>
        (s"member $i of doc $docId in nl " * ((k % 4 + 1).toInt)).length.toLong)
      val escLen = if (esc == 1) s"escaped $docId".length.toLong else 0L
      assert(m.nEntries == 1 + nf + esc)
      assert(m.nFiles == nf + esc && m.nDirs == 1)
      assert(m.sumBytes == lens.sum + escLen)
      assert(m.maxEntryBytes == math.max(lens.max, escLen))
      assert(m.firstName == s"pkg$docId/")
      assert(m.unsafePaths == esc.toLong, s"seed $k")
      assert(m.checksumOk)
    }
  }

  test("any header byte flip breaks the checksum (or structure)") {
    val good = Tar.encodeTar(10L, "en")
    val rnd = new scala.util.Random(38)
    for (_ <- 0 until 100) {
      // flip inside the FIRST header block only (name/mode area) so the
      // block arithmetic survives and the checksum must do the catching
      val mut = good.clone()
      val at = rnd.nextInt(100)
      if (mut(at) != 0) {
        mut(at) = (mut(at) ^ 1).toByte
        val m = Tar.tarMeta(mut)
        assert(m == null || !m.checksumOk, s"flip at $at undetected")
      }
    }
  }

  test("tar-slip paths flag as unsafe; clean archives do not") {
    assert(Tar.tarMeta(Tar.encodeTar(13L, "en")).unsafePaths == 0L) // k=13
    assert(Tar.tarMeta(Tar.encodeTar(6L, "en")).unsafePaths == 1L) // ../escape
    // absolute path: rewrite the escape member's name to /etc/x and
    // re-checksum by hand
    val arch = Tar.encodeTar(6L, "en")
    // find the header whose name starts with "../"
    var at = 0
    while (!(arch(at) == '.' && arch(at + 1) == '.' && arch(at + 2) == '/'))
      at += 512
    val mut = arch.clone()
    java.util.Arrays.fill(mut, at, at + 100, 0.toByte)
    "/etc/x".getBytes("UTF-8").copyToArray(mut, at)
    // recompute the checksum (sum with chksum field as spaces)
    java.util.Arrays.fill(mut, at + 148, at + 156, ' '.toByte)
    var sum = 0L
    (at until at + 512).foreach(i => sum += mut(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    (("0" * (6 - cs.length)) + cs).getBytes("ISO-8859-1").copyToArray(mut, at + 148)
    mut(at + 154) = 0; mut(at + 155) = ' '
    val m = Tar.tarMeta(mut)
    assert(m != null && m.checksumOk && m.unsafePaths == 1L)
  }

  test("malformation: truncation, bad octal, size lies — null, no throw") {
    assert(Tar.tarMeta(null) == null)
    assert(Tar.tarMeta(Array.empty[Byte]) == null)
    assert(Tar.tarMeta(new Array[Byte](512)) == null) // too short
    val good = Tar.encodeTar(3L, "pt")
    // non-512 length
    assert(Tar.tarMeta(good.take(good.length - 7)) == null)
    // size field lying past EOF
    val lie = good.clone()
    // first file header follows the dir header at 512; size field at +124
    lie(512 + 124) = '7'; lie(512 + 125) = '7'
    assert(Tar.tarMeta(lie) == null)
    val rnd = new scala.util.Random(39)
    for (_ <- 0 until 300) {
      val base = Tar.encodeTar(rnd.nextInt(100000).toLong, "es")
      val cut = rnd.nextInt(base.length) / 512 * 512
      Tar.tarMeta(base.take(cut)) // block-aligned truncation: parse or null
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Tar.tarMeta(mut)
    }
  }
}
