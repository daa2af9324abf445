package graft.core

/** Rabin fingerprints over GF(2), clean-room implementation of the classic
  * DEC-SRC fingerprint scheme the reference uses for all URL/domain identity
  * (reference: util/FPGenerator.java:67-240, std64 polynomial at :499 with
  * polynomials[64][0]).
  *
  * Representation: a polynomial of degree < 64 is stored in a Long with the
  * coefficient of x^i at bit (63-i) — i.e. `1` (the polynomial "1") is
  * 0x8000000000000000L. A string S is fingerprinted as
  * f(0x01 ‖ 0x00⁸ ‖ S) mod P.
  */
final class RabinFingerprint(val polynomial: Long, val degree: Int) {
  private val one = 0x8000000000000000L

  // powerTable(i) = x^i mod P, for i in [0,128)
  private val powerTable: Array[Long] = {
    val t = new Array[Long](128)
    val degreeMinusOneBit = one >>> (degree - 1)
    var xi = one
    var i = 0
    while (i < 128) {
      t(i) = xi
      val overflow = (xi & degreeMinusOneBit) != 0
      xi = xi >>> 1
      if (overflow) xi ^= polynomial
      i += 1
    }
    t
  }

  /** Fingerprint of the empty string: x^64 mod P (the leading 0x01 marker). */
  val empty: Long = powerTable(64)

  // byteMod(i)(b) = x^(127 - 8i) * f(b) mod P  — lets us fold 8 bits at a time.
  private val byteMod: Array[Array[Long]] = Array.tabulate(16, 256) { (i, j) =>
    var v = 0L
    var k = 0
    while (k < 8) {
      if ((j & (1 << k)) != 0) v ^= powerTable(127 - i * 8 - k)
      k += 1
    }
    v
  }

  /** Reduce an (up to 128-bit-equivalent) intermediate back to degree<64. */
  def reduce(fp: Long): Long = {
    val n = 8 - degree / 8
    val local = if (n == 8) 0L else fp & (-1L << (8 * n))
    var temp = 0L
    var f = fp
    var i = 0
    while (i < n) {
      temp ^= byteMod(8 + i)((f & 0xff).toInt)
      f = f >>> 8
      i += 1
    }
    local ^ temp
  }

  /** Extend with the low 8 bits of v, without full reduction. */
  @inline def extendByte(f0: Long, v: Int): Long = {
    val f = f0 ^ (v & 0xff)
    (f >>> 8) ^ byteMod(7)((f & 0xff).toInt)
  }

  /** Extend with the full 16 bits of a char, without full reduction. */
  @inline def extendChar(f0: Long, v: Int): Long = {
    val f = f0 ^ (v & 0xffff)
    ((f >>> 16)
      ^ byteMod(6)((f & 0xff).toInt)
      ^ byteMod(7)(((f >>> 8) & 0xff).toInt))
  }

  /** Fingerprint of a byte range. */
  def fp(buf: Array[Byte], start: Int, n: Int): Long = {
    var f = empty
    var i = start
    val end = start + n
    while (i < end) { f = extendByte(f, buf(i)); i += 1 }
    reduce(f)
  }

  def fp(buf: Array[Byte]): Long = fp(buf, 0, buf.length)

  /** Fingerprint of all 16 bits of each character (reference fp(CharSequence)). */
  def fp(s: CharSequence): Long = {
    var f = empty
    var i = 0
    while (i < s.length) { f = extendChar(f, s.charAt(i)); i += 1 }
    reduce(f)
  }

  /** Fingerprint of a single 64-bit value, big-endian byte order. */
  def fpLong(v: Long): Long = {
    var f = empty
    var shift = 56
    while (shift >= 0) { f = extendByte(f, ((v >>> shift) & 0xff).toInt); shift -= 8 }
    reduce(f)
  }
}

object RabinFingerprint {
  /** The standard degree-64 irreducible polynomial the reference's std64
    * generator is built from (FPGenerator.java:499, polynomials[64][0]). */
  val Std64Poly: Long = 0xD74307D3FD3382DBL
  val std64 = new RabinFingerprint(Std64Poly, 64)
}

/** SimHash + shingling + LSH banding — same semantics as the reference
  * (util/SimHash.java:52-146, util/Shingle.java:32-55,
  * mapred/ec2/postprocess/deduper/DeduperUtils.java:199-300) re-expressed
  * for Spark UDF/Expression use.
  */
object Hashing {
  val SimHashBits = 64
  /** Matching threshold used by the reference dedupe verifier
    * (DeduperUtils.java:621). */
  val DefaultHammingThreshold = 3

  /** 64-bit SimHash over distinct 4-char packed shingles, each shingle
    * Rabin-fingerprinted; bit i set iff the vote for bit i is positive
    * (SimHash.computeOptimizedSimHashForString semantics). */
  def simhash64(s: String): Long = {
    if (s == null) return 0L
    val n = s.length
    val shingles = new java.util.HashSet[Long](math.min(n, 1 << 16))
    var i = 0
    while (i + 4 <= n) {
      var sh = s.charAt(i).toLong
      sh = (sh << 16) | s.charAt(i + 1)
      sh = (sh << 16) | s.charAt(i + 2)
      sh = (sh << 16) | s.charAt(i + 3)
      shingles.add(sh)
      i += 1
    }
    val votes = new Array[Int](SimHashBits)
    val it = shingles.iterator()
    while (it.hasNext) {
      val h = RabinFingerprint.std64.fpLong(it.next())
      var b = 0
      while (b < SimHashBits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < SimHashBits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Distinct character n-grams (reference CHAR_GRAM_LENGTH=3). */
  def shingles(s: String, n: Int = 3): Set[String] =
    if (s == null || s.length < n) Set.empty
    else (0 to s.length - n).view.map(i => s.substring(i, i + n)).toSet

  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val inter = a.count(b.contains)
    inter.toDouble / (a.size + b.size - inter)
  }

  // ---- LSH banding over a 64-bit simhash: 6 chunks (11,11,11,11,10,10 bits),
  // all C(6,3)=20 ways of choosing 3 chunks. Two hashes within hamming
  // distance 3 differ in at most 3 chunks, so at least one of the 20
  // patterns picks 3 clean chunks → they share a band key.
  private val ChunkLens = Array(11, 11, 11, 11, 10, 10)
  private val ChunkPos = Array(0, 11, 22, 33, 44, 54)
  val NumChunks = 6
  val ChunksPerKey = 3

  /** The 20 patterns: 6-bit masks with exactly 3 bits set. */
  val Patterns: Array[Int] =
    (0 to 63).filter(Integer.bitCount(_) == ChunksPerKey).toArray

  val NumBands: Int = Patterns.length // 20

  /** Band keys for a simhash: for pattern p, the key packs the pattern index
    * (high bits) with the concatenated bits of the 3 selected chunks. */
  def bandKeys(simhash: Long): Array[Long] = {
    val out = new Array[Long](NumBands)
    var p = 0
    while (p < NumBands) {
      val pattern = Patterns(p)
      var key = 0L
      var c = 0
      while (c < NumChunks) {
        if ((pattern & (1 << (NumChunks - 1 - c))) != 0) {
          val chunkBits = (simhash >>> ChunkPos(c)) & ((1L << ChunkLens(c)) - 1)
          key = (key << ChunkLens(c)) | chunkBits
        }
        c += 1
      }
      out(p) = (p.toLong << 34) | key // ≤33 key bits + 5 pattern bits
      p += 1
    }
    out
  }
}

/** MurmurHash2 64A — the classic public-domain 64-bit Murmur2 variant the
  * reference's util/MurmurHash.java derives from. Clean-room from the
  * published algorithm (m = 0xc6a4a7935bd1e995, r = 47). */
object Murmur2 {
  private val M = 0xc6a4a7935bd1e995L
  private val R = 47

  def hash64(data: Array[Byte], seed: Long): Long = {
    var h = seed ^ (data.length * M)
    val nBlocks = data.length / 8
    var i = 0
    while (i < nBlocks) {
      var k = 0L
      var j = 0
      while (j < 8) {
        k |= (data(i * 8 + j) & 0xffL) << (8 * j)
        j += 1
      }
      k *= M; k ^= k >>> R; k *= M
      h ^= k; h *= M
      i += 1
    }
    val tail = nBlocks * 8
    var t = data.length & 7
    while (t > 0) {
      t -= 1
      h ^= (data(tail + t) & 0xffL) << (8 * t)
      if (t == 0) h *= M
    }
    h ^= h >>> R; h *= M; h ^= h >>> R
    h
  }

  def hash64(s: String, seed: Long = 0L): Long = hash64(s.getBytes("UTF-8"), seed)
}

/** CRC-16/ARC (poly 0x8005 reflected = 0xA001, init 0) — the CRC16 the
  * reference uses for short checksums (util/CRC16.java). Check value for
  * "123456789" is the published 0xBB3D. */
object Crc16 {
  private val table: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    var k = 0
    while (k < 8) {
      c = if ((c & 1) != 0) 0xA001 ^ (c >>> 1) else c >>> 1
      k += 1
    }
    c
  }

  def crc(data: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i < data.length) {
      c = table((c ^ data(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    c & 0xffff
  }

  def crc(s: String): Int = crc(s.getBytes("UTF-8"))
}
