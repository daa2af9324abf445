package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedupe

/** r20 optimization pin: d12's ground-truth gram join carries the
  * set-similarity LENGTH filter (5·min(|A|,|B|) ≥ 4·max(|A|,|B|)) in the
  * join condition. The filter must be EXACT — the surviving (probe, doc)
  * pair set has to equal the unfiltered replay's, because a pair with
  * inter ≤ min(pn,cn) can only reach jaccard ≥ 0.8 inside that size
  * band. A future threshold change that forgets to re-derive the bound
  * (0.8 ⇒ 4/5) breaks this spec, not the recall audit's meaning. */
class SizeFilterSpec extends AnyFunSuite with SparkSuite {

  test("d12 truth with the length filter equals the unfiltered replay") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val P = 100
    val sh = docs.select(col("doc_id"), Dedupe.shingles3(col("text")).as("sh"))
      .localCheckpoint(true)
    val pex = sh.filter(col("doc_id") < P)
      .select(col("doc_id").as("probe_id"), size(col("sh")).as("pn"),
        explode(col("sh")).as("g"))
    val cex = sh.select(col("doc_id"), size(col("sh")).as("cn"),
      explode(col("sh")).as("g"))
    def truth(withSizeFilter: Boolean) = {
      val cond =
        if (withSizeFilter)
          cex("g") === pex("g") &&
            col("cn") * 5 >= col("pn") * 4 && col("pn") * 5 >= col("cn") * 4
        else cex("g") === pex("g")
      cex.join(broadcast(pex), cond)
        .where(col("doc_id") =!= col("probe_id"))
        .groupBy("probe_id", "doc_id")
        .agg(count(lit(1)).as("inter"), max(col("pn")).as("pn"),
          max(col("cn")).as("cn"))
        .where(col("inter") * 5 >= (col("pn") + col("cn") - col("inter")) * 4)
        .select(col("probe_id"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val filtered = truth(withSizeFilter = true)
    val exhaustive = truth(withSizeFilter = false)
    assert(filtered == exhaustive,
      s"length filter changed the truth set: only-filtered=" +
        s"${filtered -- exhaustive}, missing=${exhaustive -- filtered}")
    assert(exhaustive.nonEmpty, "fixture produced no truth pairs — vacuous")
  }
}
