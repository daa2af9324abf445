package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Apng

/** m46 APNG animation-control walk: analytic replay over all 251 fixture
  * seeds, the shared fcTL/fdAT sequence protocol, spec rules (den==0 →
  * 1/100s, default-image dispatch), sequence/geometry violation
  * detection, an ImageIO referee on the container (APNG is
  * backward-compatible PNG — the default image must decode), and
  * byte-flip/truncation fuzz (never throws). */
class ApngSpec extends AnyFunSuite {

  test("all 251 seeds replay analytically") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 11
      val m = Apng.apngMeta(Apng.encodeApng(docId))
      assert(m != null, s"seed $k")
      val n = k % 5 + 1
      assert(m.width == k % 40 + 8 && m.height == k % 30 + 8, s"seed $k")
      assert(m.framesDeclared == n && m.plays == k % 4, s"seed $k")
      assert(m.nFctl == n, s"seed $k")
      assert(m.nFdat == (if (k % 2 == 0) n - 1 else n), s"seed $k")
      val delay = (0L until n).map(i => ((k + i) % 50 + 1) * 10).sum
      assert(m.totalDelayMs == delay, s"seed $k")
      assert(m.firstDispose == k % 3 && m.firstBlend == k % 2, s"seed $k")
      assert(m.seqOk && m.intact, s"seed $k")
      assert(m.defaultIsFrame == (k % 2 == 0), s"seed $k")
    }
  }

  test("ImageIO referee: the container is a real PNG (default image decodes)") {
    for (k <- Seq(0L, 1L, 7L, 42L, 250L)) {
      val bytes = Apng.encodeApng(k)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"seed $k")
      assert(img.getWidth == (k % 40 + 8).toInt, s"seed $k")
      assert(img.getHeight == (k % 30 + 8).toInt, s"seed $k")
    }
  }

  test("sequence and geometry violations are detected, not mis-parsed") {
    val base = Apng.encodeApng(10) // even seed: fcTL before IDAT
    // find the first fcTL and corrupt its sequence number
    def find(b: Array[Byte], tag: String, from: Int = 0): Int = {
      val t = tag.getBytes("US-ASCII")
      var i = from
      while (i + 4 <= b.length) {
        if (b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) &&
            b(i + 3) == t(3)) return i
        i += 1
      }
      -1
    }
    val seqAt = find(base, "fcTL") + 4 // sequence field (CRC now stale: fine)
    val badSeq = base.clone()
    badSeq(seqAt + 3) = 9 // seq 0 -> 9
    val m1 = Apng.apngMeta(badSeq)
    assert(m1 != null && !m1.seqOk)
    // corrupt the first fcTL's frame width beyond IHDR bounds
    val badGeom = base.clone()
    badGeom(seqAt + 4) = 0x7f // x_offset+width >> IHDR width
    val m2 = Apng.apngMeta(badGeom)
    assert(m2 != null && !m2.intact)
    // acTL declaring more frames than fcTL chunks flips intact
    val acAt = find(base, "acTL") + 4
    val badN = base.clone()
    badN(acAt + 3) = 99.toByte
    val m3 = Apng.apngMeta(badN)
    assert(m3 != null && !m3.intact && m3.seqOk)
  }

  test("byte-flip and truncation fuzz never throws") {
    val base = Apng.encodeApng(123)
    val rnd = new scala.util.Random(46)
    for (_ <- 0 until 400) {
      val mut = base.clone()
      for (_ <- 0 to rnd.nextInt(3)) {
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Apng.apngMeta(mut) // null or Meta, never a throw
    }
    for (c <- 0 until base.length by 7)
      Apng.apngMeta(java.util.Arrays.copyOfRange(base, 0, c))
    assert(Apng.apngMeta(null) == null)
    assert(Apng.apngMeta(Array[Byte](1, 2, 3)) == null)
    // declared-length abuse: a chunk claiming 2 GiB rejects via budget
    val abusive = base.clone()
    abusive(8) = 0x7f.toByte // IHDR length -> huge
    assert(Apng.apngMeta(abusive) == null)
  }
}
