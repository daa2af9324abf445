package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Edge cases of the text operators that the oracle corpus (long,
  * well-formed docs) never exercises: sub-n-gram documents, the
  * residual-text semantics of ordered scrub rules. */
class TextAnalysisSpec extends AnyFunSuite with SparkSuite {

  test("wordNgrams yields no grams for docs shorter than n") {
    import spark.implicits._
    val df = Seq("one", "one two", "one two three")
      .toDF("text")
      .select(
        col("text"),
        TextAnalysis.wordNgrams(TextAnalysis.tokens(col("text")), 3).as("g3"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // sequence(1, size-2) would COUNT DOWN for short docs without the
    // guard and fabricate grams out of nulls
    assert(rows("one") == Seq.empty)
    assert(rows("one two") == Seq.empty)
    assert(rows("one two three") == Seq("one two three"))
  }

  test("repetitionMetrics counts duplicated and top n-gram occupancy") {
    import spark.implicits._
    // "a b a b a": 2-grams = [a b, b a, a b, b a] -> all 4 occurrences
    // duplicated, top gram (a b) holds 2 of 4
    val df = Seq((1L, "a b a b a"), (2L, "x y z w")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = m(1L)
    assert(r1.getLong(r1.fieldIndex("total_2grams")) == 4L)
    assert(r1.getDouble(r1.fieldIndex("dup_2gram_frac")) == 1.0)
    assert(r1.getDouble(r1.fieldIndex("top_2gram_frac")) == 0.5)
    // doc 2 has no repeated grams at all
    val r2 = m(2L)
    assert(r2.getLong(r2.fieldIndex("total_2grams")) == 3L)
    assert(r2.getDouble(r2.fieldIndex("dup_2gram_frac")) == 0.0)
    // 3-grams of doc 1: [a b a, b a b, a b a] -> 2 of 3 duplicated
    assert(r1.getLong(r1.fieldIndex("total_3grams")) == 3L)
    assert(r1.getDouble(r1.fieldIndex("dup_3gram_frac")) == 2.0 / 3.0)
  }

  test("gopherGates: each rule discriminates on crafted inputs") {
    import spark.implicits._
    val longOk = ("the of " + Seq.fill(60)("word").mkString(" ")).trim
    val df = Seq(
      (1L, longOk),                                  // passes all gates
      (2L, "the of too short"),                      // fails gate_words
      (3L, ("the of " + Seq.fill(60)("w").mkString(" ")).trim), // mean len < 3
      (4L, ("the of " + Seq.fill(30)("1234 5678").mkString(" ")).trim), // alpha < 0.8
      (5L, Seq.fill(60)("word").mkString(" ")),      // no stopwords
    ).toDF("doc_id", "text")
    val g = TextAnalysis.gopherGates(df, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g(1L).getAs[Boolean]("pass"))
    assert(!g(2L).getAs[Boolean]("gate_words") && g(2L).getAs[Boolean]("gate_stop"))
    assert(!g(3L).getAs[Boolean]("gate_word_len"))
    assert(!g(4L).getAs[Boolean]("gate_alpha") && g(4L).getAs[Boolean]("gate_words"))
    assert(!g(5L).getAs[Boolean]("gate_stop") && g(5L).getAs[Boolean]("gate_alpha"))
    assert(Seq(2L, 3L, 4L, 5L).forall(i => !g(i).getAs[Boolean]("pass")))
  }

  test("piiScrub applies rules in order and counts on the residual text") {
    import spark.implicits._
    val df = Seq("id 123456 then 42 and 7").toDF("txt")
    val r = TextAnalysis.piiScrub(df, "txt").collect().head
    // rule 1 (\d{4,}) sees only the long run; rule 2 (\d+) runs on the
    // already-redacted text, so it must NOT re-count the long id
    assert(r.getAs[Long]("n_longid") == 1L)
    assert(r.getAs[Long]("n_num") == 2L)
    assert(r.getAs[String]("redacted") == "id [ID] then # and #")
  }
}
