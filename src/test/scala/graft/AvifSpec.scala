package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Avif

/** m40 AVIF/HEIF metadata walk: analytic replay over all 251 fixture
  * seeds, ipma-resolution checks (the alpha item's own ispe must NOT
  * win; the unreferenced auxC distractor must not fire), iloc bounds
  * integrity on truncation, and byte-flip fuzz (never throws). */
class AvifSpec extends AnyFunSuite {

  test("all 251 seeds replay analytically") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 7
      val m = Avif.avifMeta(Avif.encodeAvif(docId))
      assert(m != null, s"seed $k")
      val alpha = k % 5 == 0
      val exif = k % 2 == 1
      assert(m.kind == (if (k % 4 == 0) "heic" else "avif"), s"seed $k")
      assert(m.primaryItem == 1L, s"seed $k")
      assert(m.nItems == 1 + (if (alpha) 1 else 0) + (if (exif) 1 else 0),
        s"seed $k")
      assert(m.width == k % 200 + 16 && m.height == k % 150 + 16, s"seed $k")
      assert(m.nChannels == k % 3 + 1, s"seed $k")
      assert(m.hasAlpha == alpha && m.hasExif == exif, s"seed $k")
      assert(m.primaryBytes == (k % 2 + 1) * (k % 900 + 100), s"seed $k")
      assert(m.nExtents == k % 2 + 1, s"seed $k")
      assert(m.boundsOk, s"seed $k")
    }
  }

  test("auxC distractor never fires without an association") {
    // seeds with k%5 != 0 carry the auxC property in ipco but no item
    // references it — hasAlpha must be false (checked above), and the
    // property pool itself must still parse (width from prop 1)
    val m = Avif.avifMeta(Avif.encodeAvif(1L)) // k=1: no alpha
    assert(m != null && !m.hasAlpha && m.width == 17)
  }

  test("truncated mdat flips bounds_ok, walk still completes") {
    val full = Avif.encodeAvif(3L)
    // cut half the mdat: meta is intact (it precedes mdat) but iloc
    // extents now point past EOF
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 50)
    val m = Avif.avifMeta(cut)
    // either null (box size check fails on mdat) or bounds flagged
    assert(m == null || !m.boundsOk)
  }

  test("size==0 (to end-of-range) and size==1 (largesize) boxes walk") {
    def find(b: Array[Byte], tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      var i = 0
      while (i + 4 <= b.length) {
        if (b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) &&
            b(i + 3) == t(3)) return i
        i += 1
      }
      -1
    }
    val base = Avif.encodeAvif(99)
    val ref = Avif.avifMeta(base)
    assert(ref != null && ref.boundsOk)
    // iloc is the LAST child of meta: size==0 extends to end of the
    // enclosing range (ISO 14496-12 §4.2 to-EOF form) — same extent
    val toEof = base.clone()
    val ilocAt = find(toEof, "iloc")
    assert(ilocAt > 0)
    for (j <- 1 to 4) toEof(ilocAt - j) = 0
    assert(Avif.avifMeta(toEof) == ref)
    // rewrite iinf as a 64-bit largesize box (size=1 + 8-byte size):
    // the walk reads the largesize; every census field is unchanged
    val iinfAt = find(base, "iinf")
    assert(iinfAt > 0)
    val oldSize = ((base(iinfAt - 4) & 0xffL) << 24) |
      ((base(iinfAt - 3) & 0xffL) << 16) | ((base(iinfAt - 2) & 0xffL) << 8) |
      (base(iinfAt - 1) & 0xffL)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, iinfAt - 4)
    out.write(Array[Byte](0, 0, 0, 1)) // size==1
    out.write("iinf".getBytes("US-ASCII"))
    val ls = oldSize + 8
    for (s <- 56 to 0 by -8) out.write(((ls >> s) & 0xff).toInt)
    out.write(base, iinfAt + 4, base.length - (iinfAt + 4))
    val larged = out.toByteArray
    // meta's own size grew by 8
    val metaAt = find(larged, "meta")
    val metaSize = ((larged(metaAt - 4) & 0xffL) << 24) |
      ((larged(metaAt - 3) & 0xffL) << 16) |
      ((larged(metaAt - 2) & 0xffL) << 8) | (larged(metaAt - 1) & 0xffL)
    val ns = metaSize + 8
    larged(metaAt - 4) = ((ns >> 24) & 0xff).toByte
    larged(metaAt - 3) = ((ns >> 16) & 0xff).toByte
    larged(metaAt - 2) = ((ns >> 8) & 0xff).toByte
    larged(metaAt - 1) = (ns & 0xff).toByte
    val m2 = Avif.avifMeta(larged)
    assert(m2 != null)
    assert(m2.width == ref.width && m2.height == ref.height &&
      m2.nItems == ref.nItems && m2.nChannels == ref.nChannels &&
      m2.hasAlpha == ref.hasAlpha && m2.hasExif == ref.hasExif &&
      m2.primaryBytes == ref.primaryBytes && m2.boundsOk)
  }

  test("non-brand ftyp and non-isobmff bytes return null") {
    val mp4ish = Avif.encodeAvif(2L).clone()
    // overwrite the major brand with 'isom' (a video brand, not image)
    System.arraycopy("isom".getBytes("US-ASCII"), 0, mp4ish, 8, 4)
    assert(Avif.avifMeta(mp4ish) == null)
    assert(Avif.avifMeta("not a box".getBytes("UTF-8")) == null)
    assert(Avif.avifMeta(null) == null)
    assert(Avif.avifMeta(Array.emptyByteArray) == null)
  }

  test("byte-flip and truncation fuzz never throws") {
    val base = Avif.encodeAvif(11L)
    val rnd = new scala.util.Random(40)
    for (_ <- 0 until 600) {
      val mut = base.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Avif.avifMeta(mut) // null or valid, never a throw
    }
    for (_ <- 0 until 150)
      Avif.avifMeta(java.util.Arrays.copyOfRange(base, 0,
        rnd.nextInt(base.length)))
  }
}
