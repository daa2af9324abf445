package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** d17 honesty pins, simulated driver-side on the real sf0.01 corpus:
  * (a) prefix-filter candidates contain EVERY true Jaccard≥0.8 pair
  * (the canonical-order completeness theorem, checked on real data,
  * not trusted), and (b) the candidate set is a tiny fraction of the
  * n²/2 all-pairs space — the whole reason the operator scales. */
class PrefixFilterSpec extends AnyFunSuite with SparkSuite {

  test("prefix candidates: complete for J>=0.8 and <1% of all pairs at sf0.01") {
    val docs = Registry.table(spark, "/root/testdata/sf0.01", "documents")
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), "[^a-z]+"), t => t =!= "").as("ts"))
    val sh = toks.select(col("doc_id"),
      explode(array_distinct(when(size(col("ts")) < 3,
        expr("CAST(array() AS array<string>)"))
        .otherwise(expr(
          """transform(slice(ts, 1, size(ts) - 2),
            |  (t, i) -> concat(t, ' ', element_at(ts, i + 2),
            |                   ' ', element_at(ts, i + 3)))"""
            .stripMargin)))).as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byDoc = sh.groupBy(_._1).map { case (d, gs) => d -> gs.map(_._2).toSet }
    val dfreq = sh.groupBy(_._2).map { case (g, xs) => g -> xs.size }

    // per-doc prefix under the (df asc, gram asc) canonical order
    val prefixes = byDoc.map { case (d, gs) =>
      val n = gs.size
      val p = n - (4 * n + 4) / 5 + 1
      d -> gs.toSeq.sortBy(g => (dfreq(g), g)).take(p).toSet
    }
    val byGram = prefixes.toSeq.flatMap { case (d, gs) => gs.map(_ -> d) }
      .groupBy(_._1).values
    val candidates = byGram.flatMap { vs =>
      val ds = vs.map(_._2).distinct.sorted
      for (a <- ds; b <- ds if a < b) yield (a, b)
    }.toSet

    val ids = byDoc.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      inter = (byDoc(a) & byDoc(b)).size
      if inter * 5 >= (byDoc(a).size + byDoc(b).size - inter) * 4
    } yield (a, b)).toSet

    assert(truth.nonEmpty, "no true near-dup pairs — the threshold check is vacuous")
    assert(truth.subsetOf(candidates),
      s"prefix filtering MISSED ${(truth -- candidates).size} true pairs")
    val allPairs = ids.size.toLong * (ids.size - 1) / 2
    assert(candidates.size * 100L < allPairs,
      s"candidates ${candidates.size} not <1% of $allPairs — filtering is vacuous")
  }
}
