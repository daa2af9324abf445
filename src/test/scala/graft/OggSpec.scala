package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ogg

/** Ogg/Opus walk: the published CRC check value, analytic replay over
  * all fixture seeds (incl. multi-segment lacing), CRC catching any
  * flipped byte, and malformation fuzz. */
class OggSpec extends AnyFunSuite {

  test("Ogg CRC-32 matches the published check value") {
    // poly 0x04c11db7, init 0, unreflected, no final xor: the catalog
    // CRC-32/CKSUM check value 0x765e7680 is AFTER its 0xffffffff
    // xorout, so the Ogg variant reads its complement
    val b = "123456789".getBytes("ISO-8859-1")
    assert(Ogg.crc(b, 0, b.length, 999) == (0x765e7680L ^ 0xffffffffL))
  }

  test("fixture census matches the analytic replay for all 251 seeds") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 6
      val m = Ogg.oggMeta(Ogg.encodeOggOpus(docId, "it"))
      assert(m != null, s"seed $k")
      assert(m.serial == ((docId * 2654435761L) & 0xffffffffL))
      assert(m.channels == k % 2 + 1)
      assert(m.preSkip == (k % 5) * 120 + 312)
      assert(m.inputRate == Seq(48000L, 44100L, 16000L)((k % 3).toInt))
      val nAudio = k % 6 + 1
      assert(m.nPages == 2 + nAudio)
      val ms = (0L until nAudio).map(i => 20L * ((k + i) % 3 + 1)).sum
      assert(m.durationMs == ms, s"seed $k")
      assert(m.vendor == "graft ogg fixture")
      assert(m.title == s"doc $docId" && m.artist == "it")
      assert(m.crcOk)
    }
  }

  test("page CRC catches any flipped body byte") {
    val good = Ogg.encodeOggOpus(77L, "en")
    val rnd = new scala.util.Random(35)
    var caught = 0
    for (_ <- 0 until 100) {
      val mut = good.clone()
      val at = rnd.nextInt(mut.length)
      val old = mut(at)
      mut(at) = (old ^ (1 << rnd.nextInt(8))).toByte
      val m = Ogg.oggMeta(mut)
      // structural damage → null; payload damage → crcOk false; a
      // surviving parse must NEVER report the flip as intact unless the
      // flip landed in a lacing/granule field that re-validates (CRC
      // makes that impossible: any in-page flip breaks the page CRC)
      if (m != null) { assert(!m.crcOk, s"flip at $at undetected"); caught += 1 }
    }
    assert(caught > 0, "fuzz never produced a parseable-but-corrupt stream")
  }

  test("malformation: truncation, huge comment counts — null, no throw") {
    assert(Ogg.oggMeta(null) == null)
    assert(Ogg.oggMeta(Array.empty[Byte]) == null)
    assert(Ogg.oggMeta("OggS".getBytes("ISO-8859-1")) == null)
    val good = Ogg.encodeOggOpus(5L, "de")
    val rnd = new scala.util.Random(36)
    for (_ <- 0 until 300) {
      Ogg.oggMeta(good.take(rnd.nextInt(good.length)))
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Ogg.oggMeta(mut)
    }
    // chained streams: the census covers the FIRST logical stream (up
    // to its EOS) — a second chained copy does not change the result
    val doubled = good ++ good
    assert(Ogg.oggMeta(doubled) == Ogg.oggMeta(good))
    // but a BOS page mid-stream (no EOS before it) is malformed
    val noEos = good.clone()
    // clear the EOS flag on the last page: find last OggS and its hType
    var last = noEos.length - 28
    while (!(noEos(last) == 'O' && noEos(last + 1) == 'g' &&
      noEos(last + 2) == 'g' && noEos(last + 3) == 'S')) last -= 1
    noEos(last + 5) = (noEos(last + 5) & ~4).toByte
    assert(Ogg.oggMeta(noEos ++ good) == null)
  }
}
