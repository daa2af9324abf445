package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Woff2

/** m43 WOFF2 census: analytic replay over all 251 seeds (the brotli
  * blob decoded through the x23 decoder and length-gated), reserved
  * transform rejection, base128 abuse, and byte-flip fuzz. */
class Woff2Spec extends AnyFunSuite {

  test("all 251 seeds replay analytically") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 8
      val m = Woff2.woff2Meta(Woff2.encodeWoff2(docId))
      assert(m != null, s"seed $k")
      val g = if (k % 2 == 0) 1 else 0
      val extra = (k % 3).toInt match { case 0 => 0; case 1 => 20; case _ => 41 }
      val fixed = 54 + (k % 900 + 120) + (k % 50 + 8) + (k % 200 + 16)
      assert(m.flavor == (if (k % 3 == 0) "otf" else "ttf"), s"seed $k")
      assert(m.nTables == 4 + 2 * g + k % 3, s"seed $k")
      assert(m.nKnown == 3 + 2 * g + k % 3 && m.nCustom == 1, s"seed $k")
      assert(m.nTransformed == 2 * g, s"seed $k")
      assert(m.sumOrig ==
        fixed + extra + g * ((k % 3000 + 200) + (k % 400 + 100)), s"seed $k")
      assert(m.blobOk, s"seed $k")
      assert(m.decompLen == fixed + extra + g * (k % 700 + 90), s"seed $k")
      assert(m.hasMeta == (k % 4 == 0), s"seed $k")
      if (k % 4 == 0)
        assert(m.metaOrig == s"<metadata doc='$docId'/>".length, s"seed $k")
    }
  }

  test("truncated blob flips blob_ok (integrity, not a throw)") {
    val full = Woff2.encodeWoff2(2L) // k=2: no meta (meta would shift)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 10)
    // declared total length no longer matches → null; patch the length
    val n = cut.length
    cut(8) = ((n >> 24) & 0xff).toByte
    cut(9) = ((n >> 16) & 0xff).toByte
    cut(10) = ((n >> 8) & 0xff).toByte
    cut(11) = (n & 0xff).toByte
    val m = Woff2.woff2Meta(cut)
    // either the compressed size now overruns (null) or decode fails
    assert(m == null || !m.blobOk)
  }

  test("reserved transform version on a non-glyf table rejects") {
    val full = Woff2.encodeWoff2(1L)
    // first directory entry is head (flags byte at offset 48): set its
    // transform version bits to 1 (reserved for non-glyf/loca)
    val mut = full.clone()
    mut(48) = (mut(48) | 0x40).toByte
    assert(Woff2.woff2Meta(mut) == null)
  }

  test("leading-zero base128 rejects") {
    val full = Woff2.encodeWoff2(3L)
    // head's origLength base128 starts right after its flags byte
    val mut = full.clone()
    // inject 0x80 as the first length byte by... simplest: flags ok,
    // overwrite the next byte with 0x80 (orig was 54, single byte)
    mut(49) = 0x80.toByte
    assert(Woff2.woff2Meta(mut) == null)
  }

  test("byte-flip and truncation fuzz never throws") {
    val base = Woff2.encodeWoff2(12L)
    val rnd = new scala.util.Random(51)
    for (_ <- 0 until 400) {
      val mut = base.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Woff2.woff2Meta(mut)
    }
    for (_ <- 0 until 100)
      Woff2.woff2Meta(java.util.Arrays.copyOfRange(base, 0,
        rnd.nextInt(base.length)))
    assert(Woff2.woff2Meta(null) == null)
    assert(Woff2.woff2Meta("wOF2 but tiny".getBytes) == null)
  }
}
