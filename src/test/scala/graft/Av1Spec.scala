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

  // spec-only MSB-first writer for the color_config variants the shared
  // fixture encoder never emits (AV1 spec 5.5.2 corner branches)
  private final class W {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def f(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def obu(): Array[Byte] = {
      if (n > 0) { out.write(cur << (8 - n)); cur = 0; n = 0 }
      val p = out.toByteArray
      val o = new java.io.ByteArrayOutputStream(p.length + 2)
      o.write(0x0a); o.write(p.length); o.write(p); o.toByteArray
    }
  }

  private def preamble(w: W, profile: Int, width: Int, height: Int): Unit = {
    w.f(profile, 3); w.f(1, 1); w.f(1, 1) // still, reduced
    w.f(4, 5) // level
    w.f(10, 4); w.f(10, 4) // 11-bit dims
    w.f(width - 1, 11); w.f(height - 1, 11)
    w.f(0, 1) // use_128x128_superblock
    w.f(0, 1); w.f(0, 1) // filter_intra, intra_edge
    w.f(0, 1); w.f(0, 1); w.f(0, 1) // superres, cdef, restoration
  }

  test("sRGB-identity color_config (cp=1/tc=13/mc=0) skips range/chroma bits") {
    // profile 1 so mono_chrome is absent and 4:4:4 is legal at 8-bit
    val w = new W
    preamble(w, 1, 800, 600)
    w.f(0, 1) // high_bitdepth → 8-bit
    w.f(1, 1) // color_description_present
    w.f(1, 8); w.f(13, 8); w.f(0, 8) // BT.709 / sRGB / identity
    // NO color_range, NO subsampling/chroma bits per spec
    w.f(0, 1) // separate_uv_delta_q
    w.f(1, 1) // film_grain_params_present
    val s = Av1.seqHeader(w.obu())
    assert(s != null && s.profile == 1 && s.width == 800 && s.height == 600)
    assert(s.bitDepth == 8 && !s.monochrome && s.filmGrain)
  }

  test("profile-2 12-bit reads explicit subsampling bits") {
    // 4:2:0 at 12-bit: subsampling_x=1, subsampling_y=1 → csp present
    val a = new W
    preamble(a, 2, 320, 240)
    a.f(1, 1); a.f(1, 1) // high_bitdepth, twelve_bit → 12
    a.f(0, 1) // mono_chrome
    a.f(0, 1) // color_description_present
    a.f(0, 1) // color_range
    a.f(1, 1); a.f(1, 1) // subsampling_x, subsampling_y
    a.f(2, 2) // chroma_sample_position
    a.f(0, 1) // separate_uv_delta_q
    a.f(1, 1) // film_grain
    val sa = Av1.seqHeader(a.obu())
    assert(sa != null && sa.profile == 2 && sa.bitDepth == 12 && sa.filmGrain)
    // 4:4:4 at 12-bit: subsampling_x=0 → no y bit, no csp
    val b = new W
    preamble(b, 2, 320, 240)
    b.f(1, 1); b.f(1, 1)
    b.f(0, 1); b.f(0, 1); b.f(0, 1) // mono, described, color_range
    b.f(0, 1) // subsampling_x=0 (4:4:4)
    b.f(0, 1) // separate_uv_delta_q
    b.f(1, 1) // film_grain
    val sb = Av1.seqHeader(b.obu())
    assert(sb != null && sb.bitDepth == 12 && sb.filmGrain)
    // profile-2 10-bit: 4:2:2 implied, no subsampling bits, no csp
    val c = new W
    preamble(c, 2, 320, 240)
    c.f(1, 1); c.f(0, 1) // high_bitdepth, twelve_bit=0 → 10
    c.f(0, 1); c.f(0, 1); c.f(0, 1) // mono, described, color_range
    c.f(0, 1) // separate_uv_delta_q
    c.f(1, 1) // film_grain
    val sc = Av1.seqHeader(c.obu())
    assert(sc != null && sc.bitDepth == 10 && sc.filmGrain)
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
