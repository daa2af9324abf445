package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mp3

/** MP3 metadata walk: analytic replay over every fixture regime,
  * hand-assembled streams for each structural variation, and corruption
  * fuzz (never throws, sentinel on malformation). */
class Mp3Spec extends AnyFunSuite {

  private val BR = Mp3.BitrateKbps
  private val SR = Mp3.SampleRate

  test("fixture census matches the analytic replay for all 251 seeds") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 3 // exercise docId ≠ k
      val m = Mp3.mp3Meta(Mp3.encodeMp3(docId, "en", 1234L))
      assert(m != null, s"seed $k")
      val sr = SR((k % 3).toInt)
      val nf = k % 40 + 10
      val audio = (0L until nf).map(i =>
        144000L * BR(((k + 3 * i) % 14 + 1).toInt) / sr + (k + i) % 2).sum
      assert(m.sampleRate == sr && m.nFrames == nf, s"seed $k")
      val modes = Array("stereo", "joint", "dual", "mono")
      assert(m.mode == modes((k % 4).toInt))
      assert(m.audioBytes == audio, s"seed $k")
      assert(m.durationMs == nf * 1152L * 1000L / sr)
      assert(m.avgKbps == audio * 8L * sr / (nf * 1152L * 1000L))
      if (k % 3 == 2) assert(m.vbrHeader == null && m.vbrFrames == -1L)
      else {
        assert(m.vbrHeader == (if (k % 2 == 0) "Xing" else "Info"))
        assert(m.vbrFrames == nf)
      }
      assert(m.title == s"doc $docId" && m.artist == "en")
      assert(m.track == docId % 99 + 1 && m.ncharsTag == 1234L)
      assert(m.hasId3v1 == (k % 5 == 0))
    }
    // regime coverage: both ID3v2 versions, all 3 sample rates, all 4
    // channel modes (incl. mono's 17-byte side-info Xing offset), Xing
    // present/absent, ID3v1 present/absent all occur across the sweep
    val ks = 0L until 251L
    assert(ks.exists(_ % 2 == 0) && ks.exists(_ % 2 == 1))
    assert((0 to 2).forall(s => ks.exists(_ % 3 == s)))
    assert((0 to 3).forall(c => ks.exists(k => k % 4 == c && k % 3 != 2)))
    assert(ks.exists(k => k % 4 == 3 && k % 3 != 2), "no mono-with-Xing seed")
  }

  test("hand-assembled minimal streams pin each structural branch") {
    // bare 1-frame CBR stream, no tags: 128 kbps, 44.1 kHz, stereo
    val f = new Array[Byte](144000 * 128 / 44100)
    f(0) = 0xff.toByte; f(1) = 0xfb.toByte
    f(2) = ((9 << 4) | (0 << 2)).toByte; f(3) = 0x04.toByte
    val m = Mp3.mp3Meta(f)
    assert(m != null && m.nFrames == 1 && m.sampleRate == 44100 &&
      m.mode == "stereo" && m.vbrHeader == null &&
      m.title == null && !m.hasId3v1)
    assert(m.audioBytes == f.length)

    // the same frame followed by a bare ID3v1 tag
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    val m2 = Mp3.mp3Meta(f ++ v1)
    assert(m2 != null && m2.nFrames == 1 && m2.hasId3v1)

    // padding bit changes the frame length by exactly one byte
    val fp = new Array[Byte](f.length + 1)
    Array.copy(f, 0, fp, 0, 4)
    fp(2) = (fp(2) | 2).toByte
    assert(Mp3.mp3Meta(fp).audioBytes == f.length + 1)

    // a v2.3 tag with a plain 32-bit frame size that would be a DIFFERENT
    // value read as syncsafe (size 200 > 0x7f)
    val big = "x" * 199
    val body = (3.toByte +: big.getBytes("UTF-8"))
    val tag = new java.io.ByteArrayOutputStream()
    tag.write("ID3".getBytes("ISO-8859-1")); tag.write(3); tag.write(0); tag.write(0)
    val inner = "TIT2".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 200.toByte, 0, 0) ++ body
    val ts = inner.length
    tag.write((ts >> 21) & 0x7f); tag.write((ts >> 14) & 0x7f)
    tag.write((ts >> 7) & 0x7f); tag.write(ts & 0x7f)
    tag.write(inner)
    val m3 = Mp3.mp3Meta(tag.toByteArray ++ f)
    assert(m3 != null && m3.title == big)
  }

  test("malformed input returns null, never throws") {
    assert(Mp3.mp3Meta(null) == null)
    assert(Mp3.mp3Meta(Array.empty[Byte]) == null)
    assert(Mp3.mp3Meta(Array[Byte](0x49, 0x44, 0x33)) == null)
    // MPEG2 (0xfa lsb variants), free-format (brIdx 0), bad bitrate (15),
    // reserved sample rate (3) all rejected
    for (b1 <- Seq(0xf3, 0xfa, 0xe2); b2 <- Seq(0x00, 0xf0, 0x9c)) {
      val a = Array[Byte](0xff.toByte, b1.toByte, b2.toByte, 0x04, 0, 0, 0, 0)
      assert(Mp3.mp3Meta(a) == null, s"$b1/$b2")
    }
    val rnd = new scala.util.Random(30)
    for (_ <- 0 until 300) {
      val base = Mp3.encodeMp3(rnd.nextInt(100000).toLong, "de", 77L)
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      val r = Mp3.mp3Meta(mut) // may parse or be null; must not throw
      if (r != null) assert(r.nFrames >= 1)
      assert(Mp3.mp3Meta(base.take(rnd.nextInt(base.length))) != null ||
        true) // truncation: any result is fine, no throw
    }
    // adversarial declared lengths: huge syncsafe tag size, huge v2.3
    // frame size — bounded rejects, no allocation blowup
    val hugeTag = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(Mp3.mp3Meta(hugeTag) == null)
  }
}
