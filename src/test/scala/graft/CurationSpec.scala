package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationQueries

/** Pins cu5's bounded-state invariant: tokens over the doc-frequency cap
  * never reach the `collect_list` aggregate, so per-group state is bounded
  * by the cap regardless of corpus size (the reference's list truncation,
  * DatabaseIndexV2.java:772,811-814, enforced at build time).
  */
class CurationSpec extends AnyFunSuite with SparkSuite {

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("postings gates stop-wordish tokens before collect_list") {
    val d = docs(
      1L -> "common alpha",
      2L -> "common bravo",
      3L -> "common alpha",
      4L -> "common delta",
      5L -> "common bravo",
    )
    // cap 3: "common" (df=5) must be dropped; "alpha"/"bravo" (df=2) kept
    val out = CurationQueries.postings(d, maxDocFreq = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(!out.exists(_._1 == "common"))
    assert(out.contains(("alpha", 2L, 4L))) // docs 1,3
    assert(out.contains(("bravo", 2L, 7L))) // docs 2,5
    assert(out.contains(("delta", 1L, 4L)))
  }

  test("default cap keeps sub-cap tokens intact (codec round-trip live)") {
    val d = docs(1L -> "zebra quagga", 2L -> "zebra okapi")
    val out = CurationQueries.postings(d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq(("okapi", 1L, 2L), ("quagga", 1L, 1L), ("zebra", 2L, 3L)))
  }

  test("cu5's plan carries the doc-freq gate upstream of the collect") {
    val plan = CurationQueries.postings(docs(1L -> "alpha"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("collect_list"))
    assert(plan.contains("doc_freq"))
  }
}
