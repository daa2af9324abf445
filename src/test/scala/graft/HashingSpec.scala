package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Hashing, RabinFingerprint}

class HashingSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("rabin fp64 is deterministic and input-sensitive") {
    val fp = RabinFingerprint.std64
    assert(fp.fp("http://example.com/") == fp.fp("http://example.com/"))
    assert(fp.fp("http://example.com/") != fp.fp("http://example.com/a"))
    assert(fp.fp("") == fp.empty)
  }

  test("rabin fp64 byte-array and long views agree") {
    val fp = RabinFingerprint.std64
    val v = 0x123456789abcdefL
    val bytes = (0 until 8).map(i => ((v >>> (56 - 8 * i)) & 0xff).toByte).toArray
    assert(fp.fpLong(v) == fp.fp(bytes))
  }

  test("rabin fp64 extend is associative over concatenation") {
    val fp = RabinFingerprint.std64
    (1 to 200).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      // fp(a+b) must equal folding chars onto the unreduced running state
      var f = fp.empty
      (a + b).foreach(c => f = fp.extendChar(f, c))
      assert(fp.reduce(f) == fp.fp(a + b))
    }
  }

  test("simhash: identical text → identical hash; near-identical → small hamming") {
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val tweaked = base.replace("lazy dog", "lazy dogs")
    val h1 = Hashing.simhash64(base)
    val h2 = Hashing.simhash64(tweaked)
    assert(h1 == Hashing.simhash64(base))
    assert(Hashing.hammingDistance(h1, h2) <= 12)
    val other = Hashing.simhash64("completely different content about spark engines " * 20)
    assert(Hashing.hammingDistance(h1, other) > 12)
  }

  test("band keys: hamming<=3 guarantees a shared band (C(6,3) patterns)") {
    assert(Hashing.NumBands == 20)
    (1 to 500).foreach { _ =>
      val h = rnd.nextLong()
      val bits = List.fill(3)(rnd.nextInt(64)).distinct
      val mutated = bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val k1 = Hashing.bandKeys(h).toSet
      val k2 = Hashing.bandKeys(mutated).toSet
      assert(k1.intersect(k2).nonEmpty)
    }
  }

  test("band keys: different pattern indexes never collide") {
    val keys = Hashing.bandKeys(-1L)
    assert(keys.distinct.length == 20)
  }

  test("shingles + jaccard match reference semantics (3-gram, set-based)") {
    assert(Hashing.shingles("abcd") == Set("abc", "bcd"))
    assert(Hashing.shingles("ab") == Set.empty[String])
    assert(Hashing.jaccard(Set("abc", "bcd"), Set("abc", "bcd")) == 1.0)
    assert(Hashing.jaccard(Set("abc"), Set("xyz")) == 0.0)
  }

  test("crc16/ARC matches the published check value") {
    assert(core.Crc16.crc("123456789") == 0xBB3D)
    assert(core.Crc16.crc("") == 0)
  }

  test("murmur2-64A: deterministic, seed- and input-sensitive, full tail handling") {
    // lengths 0..9 cross the 8-byte block boundary and every tail size
    val hs = (0 to 9).map(n => core.Murmur2.hash64("a" * n))
    assert(hs.distinct.size == hs.size)
    assert(core.Murmur2.hash64("abc") == core.Murmur2.hash64("abc"))
    assert(core.Murmur2.hash64("abc", 1L) != core.Murmur2.hash64("abc", 2L))
    // avalanche sanity: one-bit input change flips ~half the output bits
    val d = java.lang.Long.bitCount(
      core.Murmur2.hash64("abcdefgh") ^ core.Murmur2.hash64("abcdefgi"))
    assert(d > 16 && d < 48)
  }
}
