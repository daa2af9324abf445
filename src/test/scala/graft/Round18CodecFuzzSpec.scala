package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Apng
import graft.sources.ZstdMembers

/** Never-throws fuzz for the round-18 byte walkers (the
  * Round16/17CodecFuzzSpec discipline): spliced real fixture heads over
  * random tails so every walker gets past its magic check into length
  * arithmetic. Covers the APNG chunk walk and the warc-zstd
  * dictionary head scan (array form; the stream form shares the code
  * path via positioned reads). Fixed seed — deterministic corpus. */
class Round18CodecFuzzSpec extends AnyFunSuite {

  private def corpus: Seq[Array[Byte]] = {
    val raw = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val magics: Seq[Array[Byte]] = Seq(
      // APNG: signature only; a real file cut inside acTL; cut mid-fdAT
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Apng.encodeApng(1L).take(40),
      Apng.encodeApng(2L).take(120),
      Apng.encodeApng(4L), // full file, tail fuzz appends trailing junk
      // warc-zstd dictionary slot: skippable magic + fuzzed size/content
      Array[Byte](0x5d, 0x2a, 0x4d, 0x18),
      Array[Byte](0x5d, 0x2a, 0x4d, 0x18, 8, 0, 0, 0),
      // other skippable magics walk-then-stop
      Array[Byte](0x50, 0x2a, 0x4d, 0x18, 4, 0, 0, 0),
      // a zstd data frame head (no dict slot)
      Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte))
    val prefixed = for {
      m <- Gen.oneOf(magics)
      tail <- raw
    } yield m ++ tail
    val gen = Gen.listOfN(600, Gen.frequency(1 -> raw, 3 -> prefixed))
    gen(Gen.Parameters.default, Seed(18L)).get
  }

  test("round-18 walkers never throw and never report impossible shapes") {
    corpus.foreach { b =>
      val m = Apng.apngMeta(b)
      if (m != null) {
        assert(m.width >= 0 && m.height >= 0)
        assert(m.nFctl >= 0 && m.nFdat >= 0 && m.totalDelayMs >= 0)
      }
      // head scan returns bytes or null; a declared-size lie must not
      // allocate past the dict budget (8 MiB) — throws are a bug
      val d = try ZstdMembers.dictAtHead(b)
        catch { case _: java.io.IOException => null } // budgeted inflate only
      if (d != null) assert(d.length <= (8 << 20))
    }
  }
}
