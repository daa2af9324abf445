package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedupe, TextAnalysis}

/** Randomized equivalence fuzz for the native string kernels against their
  * built-in-functions formulations — fixed ScalaCheck seed so the corpus
  * (and therefore the test) is deterministic. Real-data equivalence lives
  * in NativeExpressionsSpec; this covers the shapes testdata never hits:
  * control characters, isolated multi-byte runs, repeated text, length
  * 0-2 degenerates. */
class NativeKernelFuzzSpec extends AnyFunSuite with SparkSuite {

  private def corpus: Seq[String] = {
    // includes supplementary-plane chars (surrogate pairs in UTF-16,
    // 4-byte sequences in UTF-8) so code-point stepping is exercised
    // where it differs from naive char/byte indexing
    val weird = Gen.listOf(Gen.oneOf(Seq(
      "a", "b", " ", "\t", "\n", "0", ".", "日", "本", "語",
      "é", "ß", "\u0001", "😀", "𝛼")))
      .map(_.mkString)
    val gen = Gen.listOfN(300,
      Gen.frequency(3 -> Gen.asciiPrintableStr, 2 -> weird))
    gen(Gen.Parameters.default, Seed(42L)).get
  }

  test("native string kernels == builtin formulations on fuzzed inputs") {
    import spark.implicits._
    val df = corpus.toDF("t")
      .select(col("t"), Dedupe.shingles3(col("t")).as("sh"))
      .localCheckpoint(true)

    val checks = df.select(
      (Dedupe.shingles3(col("t")) === Dedupe.shingles3Builtin(col("t"))).as("c1"),
      (Dedupe.shingleHash40(col("sh"), "1") ===
        Dedupe.shingleHash40Builtin(col("sh"), "1")).as("c2"),
      (Dedupe.shingleHashes60(col("sh")) ===
        Dedupe.shingleHashes60Builtin(col("sh"))).as("c3"),
      (TextAnalysis.docFingerprint(col("t")) ===
        TextAnalysis.docFingerprintBuiltin(col("t"))).as("c4"))
    assert(checks.filter(!col("c1") || !col("c2") || !col("c3") || !col("c4"))
      .count() == 0)

    // anchor grams (d8): native one-pass vs the declarative
    // filter(transform(...)) + array_distinct formulation, short grams so
    // the fuzz corpus (mostly short strings) actually produces anchors
    val ag = df.select(
      (graft.functions.NativeExpressions.anchorGrams(col("t"), 3, 0) ===
        array_distinct(expr(
          "filter(transform(sequence(1, greatest(char_length(t) - 2, 1)), " +
            "i -> substring(t, i, 3)), " +
            "g -> char_length(g) = 3 and substring(md5(g), 32, 1) = '0')")))
        .as("ok"))
    assert(ag.filter(!col("ok")).count() == 0)

    // jaccard over fuzzed pairs (cross join of a small sample)
    val sample = df.limit(30)
    val pairs = sample.as("a").crossJoin(sample.as("b"))
      .filter(size(col("a.sh")) > 0 || size(col("b.sh")) > 0)
      .select(
        Dedupe.jaccardOf(col("a.sh"), col("b.sh")).as("nat"),
        Dedupe.jaccardOfBuiltin(col("a.sh"), col("b.sh")).as("ref"))
    assert(pairs.filter(col("nat") =!= col("ref")).count() == 0)
  }
}
