package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ico, Multimodal}

/** ICO decode: analytic replay over all fixture seeds (both payload
  * dialects + AND mask), mask-sensitivity, and malformation fuzz. */
class IcoSpec extends AnyFunSuite {

  private def replay(docId: Long): (Long, Long, Long, Long, Long, Long, Long) = {
    val k = docId % 251
    val n = (k % 3 + 1).toInt
    var sr = 0L; var sg = 0L; var sb = 0L; var tr = 0L
    for (i <- 0 until n) {
      val ki = (k + 31 * i) % 251
      val w = ((k + i) % 12 + 5).toInt
      val h = ((k + i) % 9 + 5).toInt
      val png = (k + i) % 2 == 1
      for (y <- 0 until h; x <- 0 until w) {
        val masked = !png && (x + 2 * y + ki) % 7 == 0
        if (masked) tr += 1
        else {
          val (r, g, b) = Multimodal.testPixel(ki, x, y)
          sr += r; sg += g; sb += b
        }
      }
    }
    (n.toLong, k % 12 + 5, k % 9 + 5, sr, sg, sb, tr)
  }

  test("fixture decode matches the analytic replay for all 251 seeds") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 7
      val s = Ico.icoStats(Ico.encodeIco(docId))
      assert(s != null, s"seed $k")
      val (n, w0, h0, sr, sg, sb, tr) = replay(docId)
      assert((s.nImages, s.width0, s.height0) == ((n, w0, h0)), s"seed $k dims")
      assert((s.sumR, s.sumG, s.sumB) == ((sr, sg, sb)), s"seed $k sums")
      assert(s.nTransparent == tr, s"seed $k mask")
      // every seed class occurs: at least one masked pixel whenever a
      // DIB image exists (w*h ≥ 25 > 7 guarantees a %7 hit)
      if ((0 until s.nImages.toInt).exists(i => (k + i) % 2 == 0))
        assert(s.nTransparent > 0, s"seed $k: DIB present but mask empty")
    }
  }

  test("the AND mask changes the sums (mask actually applied)") {
    // seed with a DIB first image: flipping one mask byte must change
    // either the transparent count or the sums
    val docId = 2L // k=2 → image 0 is DIB ((k+0)%2=0)
    val base = Ico.encodeIco(docId)
    val s0 = Ico.icoStats(base)
    // the AND mask of image 0 sits at its payload end; flip its first byte
    val off = 6 + 16 * s0.nImages.toInt + 40 // dir + first DIB header
    val w = (2 % 12 + 5); val h = (2 % 9 + 5)
    val xorStride = (w * 3 + 3) / 4 * 4
    val maskAt = off + xorStride * h
    val mut = base.clone()
    mut(maskAt) = (mut(maskAt) ^ 0xff).toByte
    val s1 = Ico.icoStats(mut)
    assert(s1 != null && (s1.nTransparent != s0.nTransparent ||
      (s1.sumR, s1.sumG, s1.sumB) != ((s0.sumR, s0.sumG, s0.sumB))))
  }

  test("malformation: dimension lies, offset abuse, fuzz — null, no throw") {
    assert(Ico.icoStats(null) == null)
    assert(Ico.icoStats(Array.empty[Byte]) == null)
    assert(Ico.icoStats(Array[Byte](0, 0, 1, 0, 1, 0)) == null)
    val good = Ico.encodeIco(9L)
    // directory width lying about the payload dims
    val lie = good.clone()
    lie(6) = (lie(6) + 1).toByte
    assert(Ico.icoStats(lie) == null)
    // entry offset pointing past EOF
    val far = good.clone()
    far(6 + 12) = 0xff.toByte; far(6 + 13) = 0xff.toByte
    far(6 + 14) = 0xff.toByte; far(6 + 15) = 0x7f.toByte
    assert(Ico.icoStats(far) == null)
    val rnd = new scala.util.Random(37)
    for (_ <- 0 until 300) {
      val base = Ico.encodeIco(rnd.nextInt(100000).toLong)
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Ico.icoStats(mut) // parse or null; never throws
      Ico.icoStats(base.take(rnd.nextInt(base.length)))
    }
  }
}
