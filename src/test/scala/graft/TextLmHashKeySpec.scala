package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Pins for the t10/cu30 PRODUCTION bigram-LM keying (the d19 lever one
  * tier down): the df gate and LM join-back shuffle xxhash64(gram), not
  * token text. Two pins, the d19 discipline:
  *  1. hash-identity — on the gate fixture the hashed keying reproduces
  *     the string-keyed scores exactly (this is what lets the gated
  *     queries keep their string-replay DuckDB oracles);
  *  2. collision DIRECTION under a deliberately lossy key (16 buckets —
  *     mass collisions by construction): colliding grams MERGE their LM
  *     counts, so per doc hit_mass can only inflate and n_oov can only
  *     deflate, never the reverse. Proof shape: an occurrence of gram g
  *     scores its key's total count when that total ≥ minCount, else 0;
  *     the lossy total is ≥ c(g) (it includes g's own count), so every
  *     occurrence's contribution is monotonically ≥ the exact one, and
  *     an exact-LM member stays a member. */
class TextLmHashKeySpec extends AnyFunSuite with SparkSuite {

  private def scores(keyOf: Column => Column): Map[Long, (Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    TextAnalysis.bigramLmScores(docs, "doc_id", "text", 5, keyOf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("t10/cu30 keying: xxhash64 gram keys reproduce the string-keyed scores exactly (sf0.001)") {
    val hashed = scores(g => xxhash64(g))
    val strung = scores(identity)
    assert(hashed.nonEmpty)
    assert(hashed == strung)
  }

  test("t10/cu30 collision direction: a lossy key only inflates hit_mass and deflates n_oov") {
    val exact = scores(identity)
    val lossy = scores(g => pmod(xxhash64(g), lit(16L)))
    assert(exact.keySet == lossy.keySet)
    exact.foreach { case (id, (nb, oov, mass)) =>
      val (nbL, oovL, massL) = lossy(id)
      assert(nbL == nb, s"doc $id: bigram count must be key-independent")
      assert(oovL <= oov, s"doc $id: lossy key RAISED n_oov ($oov -> $oovL)")
      assert(massL >= mass, s"doc $id: lossy key LOWERED hit_mass ($mass -> $massL)")
    }
    // the lossy key must actually collide somewhere or the pin is vacuous
    assert(exact.exists { case (id, (_, oov, mass)) =>
      lossy(id)._2 < oov || lossy(id)._3 > mass })
  }
}
