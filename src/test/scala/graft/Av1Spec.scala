package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Av1, Avif}

/** m44 AV1 sequence-header tier: analytic replay through the AVIF
  * container for all 251 seeds, bare-OBU parse, non-seq-header OBUs
  * rejected, and byte-flip fuzz (never throws). */
class Av1Spec extends AnyFunSuite {

  test("all 251 seeds parse through the AVIF primary item") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 9
      val payload = Avif.primaryItemData(Avif.encodeAvif(docId))
      assert(payload != null, s"seed $k")
      val s = Av1.seqHeader(payload)
      assert(s != null, s"seed $k")
      assert(s.profile == 0 && s.stillPicture, s"seed $k")
      assert(s.level == k % 14, s"seed $k")
      assert(s.width == k % 200 + 16 && s.height == k % 150 + 16, s"seed $k")
      assert(s.bitDepth == 8 && !s.monochrome, s"seed $k")
      assert(s.use128Superblock == (k % 2 == 1), s"seed $k")
      assert(s.enableCdef == ((k + 1) % 2 == 1), s"seed $k")
      assert(s.enableRestoration == (k % 7 == 0), s"seed $k")
      assert(s.filmGrain == (k % 4 == 0), s"seed $k")
    }
  }

  test("bare OBU round-trips; wrong OBU types reject") {
    val obu = Av1.encodeSeqHeader(640, 480, 5)
    val s = Av1.seqHeader(obu)
    assert(s != null && s.width == 640 && s.height == 480)
    // temporal-delimiter type (2) must not parse as a sequence header
    val td = obu.clone()
    td(0) = 0x12 // type 2, has_size
    assert(Av1.seqHeader(td) == null)
    // forbidden bit set
    val fb = obu.clone()
    fb(0) = (fb(0) | 0x80).toByte
    assert(Av1.seqHeader(fb) == null)
  }

  test("byte-flip and truncation fuzz never throws") {
    val base = Av1.encodeSeqHeader(1920, 1080, 77)
    val rnd = new scala.util.Random(60)
    for (_ <- 0 until 500) {
      val mut = base.clone()
      for (_ <- 0 to rnd.nextInt(3)) {
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Av1.seqHeader(mut)
    }
    for (c <- 0 until base.length)
      Av1.seqHeader(java.util.Arrays.copyOfRange(base, 0, c))
    assert(Av1.seqHeader(null) == null)
  }
}
