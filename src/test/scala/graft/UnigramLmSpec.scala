package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UnigramLm

/** t21 integer-EM unigram tokenizer: the deterministic Viterbi rules the
  * SQL oracle replays (fewest pieces, then highest total count, ties to
  * the smallest split point), char-floor coverage, and a train smoke. */
class UnigramLmSpec extends AnyFunSuite with SparkSuite {

  private val base = Map("a" -> 10L, "b" -> 10L, "c" -> 8L)

  test("fewest pieces dominates any count sum") {
    val counts = base ++ Map("ab" -> 5L, "abc" -> 1L)
    // one 1-count piece beats two/three high-count pieces
    assert(UnigramLm.viterbi("abc", counts, 4) == Seq("abc"))
    assert(UnigramLm.viterbi("ab", counts, 4) == Seq("ab"))
  }

  test("among equal piece counts the higher total count wins") {
    val counts = base ++ Map("ab" -> 5L, "bc" -> 9L)
    // [a, bc] (10+9) beats [ab, c] (5+8)
    assert(UnigramLm.viterbi("abc", counts, 4) == Seq("a", "bc"))
  }

  test("exact ties resolve to the smallest split point") {
    val counts = Map("a" -> 3L, "aa" -> 3L)
    // [a, aa] and [aa, a] both score 6 with 2 pieces; min split wins
    assert(UnigramLm.viterbi("aaa", counts, 2) == Seq("a", "aa"))
  }

  test("single chars guarantee coverage; unknown multi-grams never used") {
    val counts = Map("x" -> 1L, "y" -> 1L, "z" -> 1L)
    assert(UnigramLm.viterbi("zyx", counts, 4) == Seq("z", "y", "x"))
    assert(UnigramLm.viterbi("", counts, 4) == Seq.empty)
  }

  test("train: frequent substrings become pieces, output deterministic") {
    import spark.implicits._
    val docs = Seq.fill(8)("the batch the batch stream")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = UnigramLm.train(docs, "text", rounds = 2, topN = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // 'the' appears 16x and fits in one piece → survives with full usage
    assert(out.exists(r => r._2 == "the" && r._3 == 16L))
    // every surviving multi-char piece carries real usage; ranks contiguous
    assert(out.filter(_._2.length >= 2).forall(_._3 >= 2L))
    assert(out.map(_._1).toSeq == (1L to out.length).toSeq)
    // re-run reproduces the identical table (determinism end-to-end)
    val again = UnigramLm.train(docs, "text", rounds = 2, topN = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }
}
