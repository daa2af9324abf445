package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Brotli

/** x23 Brotli decoder vs the reference library: 102 golden pairs
  * written by tools/brotli_ref.py (libbrotlienc at qualities 1/5/9/11
  * over english text, structured data, binary, utf-8 multibyte, and
  * edge cases — exercising simple+complex codes, context modes,
  * block switching, backward refs, and the static dictionary with
  * transforms), plus budget, truncation, and byte-flip fuzz. */
class BrotliSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val goldenIds = {
    // resource dirs aren't listable from a jar; the ids are contiguous
    Iterator.from(0).map(i => f"g$i%03d")
      .takeWhile(id => getClass.getResourceAsStream(s"/brotli/$id.br") != null)
      .toSeq
  }

  test("output-buffer growth terminates and clamps past 1<<30 (overflow guard)") {
    // The wrap case: cap doubles 1<<16 → 1<<30, then must jump to the
    // clamp instead of overflowing to Int.MinValue and looping forever.
    assert(Brotli.grownCapacity(1 << 16, (1 << 30) + 1, Int.MaxValue) == Int.MaxValue)
    assert(Brotli.grownCapacity(1 << 16, (1 << 30) + 1, (1 << 30) + 7) == (1 << 30) + 7)
    assert(Brotli.grownCapacity(1 << 30, Int.MaxValue, Int.MaxValue) == Int.MaxValue)
    // normal doubling path unchanged
    assert(Brotli.grownCapacity(1 << 16, (1 << 16) + 1, Int.MaxValue) == (1 << 17))
    assert(Brotli.grownCapacity(1 << 16, 100 << 10, 1 << 20) == 128 << 10)
    assert(Brotli.grownCapacity(1 << 16, 300 << 10, 300 << 10) == 300 << 10)
  }

  test("all libbrotli-encoded goldens decode byte-exactly") {
    assert(goldenIds.size >= 100, s"expected 100+ goldens, found ${goldenIds.size}")
    for (id <- goldenIds) {
      val raw = res(s"$id.raw")
      val br = res(s"$id.br")
      val got = Brotli.decode(br)
      assert(got != null, s"$id: decode returned null")
      assert(java.util.Arrays.equals(got, raw),
        s"$id: mismatch at ${got.zip(raw).indexWhere(p => p._1 != p._2)} " +
          s"(got ${got.length} bytes, want ${raw.length})")
    }
  }

  test("static dictionary geometry matches RFC 7932 section 8") {
    assert(Brotli.DictData.length == 122784)
    // offsets are cumulative word-table sizes; the table must end at EOF
    assert(Brotli.OffsetsByLength(25) == 122784)
  }

  test("output budget: oversized payloads reject instead of allocating") {
    // 100 KB of 'x' compresses tiny; a 64 KB budget must reject it
    val big = res("g100.br") // the 100000-byte 'x' run fixture
    assert(Brotli.decode(big, maxOut = 64 << 10) == null)
    assert(Brotli.decode(big, maxOut = 1 << 20) != null)
  }

  test("truncation and byte-flip fuzz never throws") {
    val rnd = new scala.util.Random(23)
    val bases = Seq(res("g000.br"), res("g011.br"), res("g101.br"))
    for (base <- bases) {
      for (_ <- 0 until 300) {
        val mut = base.clone()
        for (_ <- 0 to rnd.nextInt(3)) {
          val i = rnd.nextInt(mut.length)
          mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        Brotli.decode(mut) // null or some bytes, never a throw
      }
      for (_ <- 0 until 100)
        Brotli.decode(java.util.Arrays.copyOfRange(base, 0,
          rnd.nextInt(base.length)))
    }
    assert(Brotli.decode(null) == null)
    assert(Brotli.decode(Array.emptyByteArray) == null)
  }
}
