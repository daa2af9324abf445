package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hashing
import graft.ops.Dedupe

class DedupeSpec extends AnyFunSuite with SparkSuite {

  test("simhash LSH pairs == brute-force hamming<=3 pairs (sf0.001)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lsh = Dedupe.simhashNearDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    // brute force on the driver — fine at sf0.001 scale
    val hashed = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Hashing.simhash64(r.getString(1))))
    val brute = (for {
      (ida, ha) <- hashed
      (idb, hb) <- hashed
      if ida < idb && Hashing.hammingDistance(ha, hb) <= 3
    } yield (ida, idb)).toSet

    assert(lsh == brute)
  }

  test("minhash LSH finds all high-jaccard pairs found exactly (sf0.001)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lsh = Dedupe.minhashNearDupPairs(docs, "doc_id", "text", 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact within single block (use a constant block → full O(n²))
    val exact = Dedupe.exactJaccardPairs(
        docs.withColumn("blk", lit(1)), "doc_id", "text", "blk", 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH must find every exact pair at this jaccard level (prob ≈ 1 at j≥0.8
    // with 4 bands × 3 rows and deterministic md5 hashing on this data)
    assert(lsh == exact)
  }

  test("connected components: min-label clusters over known pairs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val got = Dedupe.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("portable simhash LSH pairs == brute-force hamming<=3 (sf0.001)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lsh = Dedupe.portableSimhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // driver-side reimplementation of the portable 60-bit simhash
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def portable(text: String): Long = {
      val sh = (0 to text.length - 3).map(i => text.substring(i, i + 3)).distinct
      val hs = sh.map(s => java.lang.Long.parseLong(md5hex(s).take(15), 16))
      (0 until 60).map { b =>
        if (hs.count(h => ((h >> b) & 1L) == 1L) * 2 >= hs.size) 1L << b else 0L
      }.sum
    }
    val sims = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), portable(r.getString(1))))
    val brute = (for {
      (ida, sa) <- sims; (idb, sb) <- sims
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    assert(lsh == brute)
  }

  test("exact dup groups: md5 grouping counts copies") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedupe.exactDupGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }
}
