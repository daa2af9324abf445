package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Exif, Multimodal}

/** EXIF/TIFF walk: analytic replay over all fixture seeds, hand-built
  * minimal TIFF goldens for each structural branch (both byte orders,
  * inline vs offset values, real d/m/s rationals), pixel-decode
  * coexistence, and adversarial offsets/fuzz (never throws). */
class ExifSpec extends AnyFunSuite {

  test("fixture walk matches the analytic replay for all 251 seeds") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 2
      val m = Exif.exifMeta(Exif.encodeExifJpeg(docId))
      assert(m != null, s"seed $k")
      assert(m.byteOrder == (if (k % 2 == 0) "II" else "MM"))
      assert(m.orientation == k % 8 + 1)
      assert(m.make == s"cam${k % 7}" && m.model == s"model ${docId % 5}")
      assert(m.dateTime == f"2026:08:${k % 28 + 1}%02d ${k % 24}%02d:00:00")
      assert(m.dateTimeOriginal ==
        f"2026:07:${k % 28 + 1}%02d ${(k + 5) % 24}%02d:30:00")
      assert(m.pixelX == docId % 1000 + 1 && m.pixelY == docId % 800 + 1)
      if (k % 3 == 0) {
        assert(m.hasGps)
        val lat = (docId * 7919) % 90000000L
        val lon = (docId * 104729) % 180000000L
        assert(m.gpsLatPpm == (if (k % 4 < 2) lat else -lat), s"lat seed $k")
        assert(m.gpsLonPpm == (if (k % 5 < 3) lon else -lon), s"lon seed $k")
      } else assert(!m.hasGps)
    }
  }

  test("the EXIF-bearing JPEG still pixel-decodes (APP1 skipped)") {
    // metadata and pixels coexist: the m22 decoder must skip APP1 and
    // produce the same stats as the EXIF-free file
    for (k <- Seq(0L, 7L, 100L)) {
      val plain = Multimodal.decodeJpegStats(Multimodal.encodeJpegAc(k, 1, 1))
      val withExif = Multimodal.decodeJpegStats(Exif.encodeExifJpeg(k))
      assert(withExif == plain, s"seed $k")
    }
  }

  /** Hand-built minimal TIFF in an APP1 wrapper — independent of the
    * fixture builder, so encoder and walk are each checked against the
    * format. */
  private def wrap(tiff: Array[Byte]): Array[Byte] = {
    val app1 = "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ tiff
    val len = app1.length + 2
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ app1 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  test("hand-built golden: big-endian, offset ASCII, real d/m/s rationals") {
    // MM header, IFD0 with Orientation=6 + GPS pointer; GPS IFD with
    // lat 12° 30' 36" N (= 12510000 ppm, integer-exact) as true d/m/s
    val b = new java.io.ByteArrayOutputStream()
    def w8(v: Int) = b.write(v & 0xff)
    def w16(v: Int) = { w8(v >> 8); w8(v) }
    def w32(v: Long) = { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    w8('M'); w8('M'); w16(42); w32(8)
    // IFD0 @8: 2 entries → next @ 8+2+24+4 = 38 (GPS IFD)
    w16(2)
    w16(0x0112); w16(3); w32(1); w16(6); w16(0) // orientation
    w16(0x8825); w16(4); w32(1); w32(38) // GPS pointer
    w32(0)
    // GPS IFD @38: 4 entries → data @ 38+2+48+4 = 92
    w16(4)
    w16(0x0001); w16(2); w32(2); w8('N'); w8(0); w8(0); w8(0)
    w16(0x0002); w16(5); w32(3); w32(92)
    w16(0x0003); w16(2); w32(2); w8('W'); w8(0); w8(0); w8(0)
    w16(0x0004); w16(5); w32(3); w32(116)
    w32(0)
    // lat rationals @92: 12/1, 30/1, 36/1; lon @116: 5/1, 0/1, 0/1
    w32(12); w32(1); w32(30); w32(1); w32(36); w32(1)
    w32(5); w32(1); w32(0); w32(1); w32(0); w32(1)
    val m = Exif.exifMeta(wrap(b.toByteArray))
    assert(m != null && m.byteOrder == "MM" && m.orientation == 6L)
    assert(m.hasGps)
    // 12e6 + 30e6/60 + 36e6/3600 = 12_510_000; W → negative
    assert(m.gpsLatPpm == 12510000L)
    assert(m.gpsLonPpm == -5000000L)
  }

  test("GPS requires BOTH coordinates; lone latitude is not location PII hit") {
    val b = new java.io.ByteArrayOutputStream()
    def w8(v: Int) = b.write(v & 0xff)
    def w16(v: Int) = { w8(v); w8(v >> 8) }
    def w32(v: Long) = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    w8('I'); w8('I'); w16(42); w32(8)
    w16(1)
    w16(0x8825); w16(4); w32(1); w32(26) // GPS pointer → @26
    w32(0)
    // GPS IFD @26: lat only
    w16(1)
    w16(0x0002); w16(5); w32(3); w32(44)
    w32(0)
    w32(1); w32(1); w32(0); w32(1); w32(0); w32(1)
    val m = Exif.exifMeta(wrap(b.toByteArray))
    assert(m != null && !m.hasGps && m.gpsLatPpm == -1L && m.gpsLonPpm == -1L)
  }

  test("adversarial offsets and fuzz: null, never throws, bounded work") {
    assert(Exif.exifMeta(null) == null)
    assert(Exif.exifMeta(Array.empty[Byte]) == null)
    // JPEG without EXIF
    assert(Exif.exifMeta(Multimodal.encodeJpegAc(3L, 1, 1)) == null)
    // IFD offset pointing at itself (cycle attempt): depth is fixed, so
    // the walk terminates; out-of-bounds pointers are malformed
    val b = new java.io.ByteArrayOutputStream()
    def w8(v: Int) = b.write(v & 0xff)
    def w16(v: Int) = { w8(v); w8(v >> 8) }
    def w32(v: Long) = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    w8('I'); w8('I'); w16(42); w32(8)
    w16(1)
    w16(0x8769); w16(4); w32(1); w32(8) // Exif pointer back to IFD0
    w32(0)
    val cyc = Exif.exifMeta(wrap(b.toByteArray))
    assert(cyc == null || cyc.orientation == -1L) // terminated, no loop
    // entry-count bomb: declared 65535 entries in a tiny segment
    val bomb = new java.io.ByteArrayOutputStream()
    def x8(v: Int) = bomb.write(v & 0xff)
    x8('I'); x8('I'); x8(42); x8(0); x8(8); x8(0); x8(0); x8(0)
    x8(0xff); x8(0xff)
    assert(Exif.exifMeta(wrap(bomb.toByteArray)) == null)
    // byte-flip fuzz over real fixtures
    val rnd = new scala.util.Random(32)
    for (_ <- 0 until 300) {
      val base = Exif.encodeExifJpeg(rnd.nextInt(100000).toLong)
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Exif.exifMeta(mut) // parse or null; must not throw
      Exif.exifMeta(base.take(rnd.nextInt(base.length)))
    }
  }
}
