package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** t26: the two-pass heavy-hitter n-gram head must be EXACT — equal to
  * the single-pass t9 head — under the production 64-bit keying AND
  * under a deliberately lossy 4-bit key (where every gram collides
  * massively but the 3×k overfetch exceeds the whole 16-bucket space,
  * so the candidate set degrades to all grams and the exact second
  * pass recovers the full head — the designed failure mode is
  * graceful-exact, not wrong). */
class NgramHeadSpec extends AnyFunSuite with SparkSuite {

  private def singlePassHead(minCount: Int, k: Int): Seq[(Long, Long, String, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = docs.select(
      filter(TextAnalysis.tokens(lower(col("text"))), t => t =!= "").as("ts"))
    val uni = toks.select(explode(col("ts")).as("gram")).withColumn("n", lit(1L))
    val bi = toks.filter(size(col("ts")) >= 2)
      .select(explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("gram"))
      .withColumn("n", lit(2L))
    uni.unionByName(bi)
      .groupBy(col("n"), col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .groupBy(col("n"))
      .agg(graft.ops.TopK.topScoredStrings(k)(col("cnt"), col("gram")).as("top"))
      .select(col("n"), posexplode(col("top")))
      .select(col("n"), (col("pos") + 1).cast("long").as("pos"),
        col("col.key").as("gram"), col("col.score").as("cnt"))
      .orderBy("n", "pos")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
  }

  private def twoPassHead(keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      minCount: Int, k: Int): Seq[(Long, Long, String, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    TextAnalysis.ngramHeadTwoPass(docs, "text", minCount, k, 3 * k, keyOf)
      .orderBy("n", "pos")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
  }

  test("t26 two-pass head == single-pass head under the production 64-bit keying (sf0.001)") {
    val want = singlePassHead(5, 100)
    assert(want.nonEmpty)
    assert(twoPassHead(g => xxhash64(g), 5, 100) == want)
  }

  test("t26 degrades gracefully-exact under a lossy 4-bit key (overfetch covers the bucket space)") {
    val want = singlePassHead(5, 100)
    assert(twoPassHead(g => pmod(xxhash64(g), lit(16L)), 5, 100) == want)
  }
}
