package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Hashing, RabinFingerprint}
import graft.functions.GraftExtensions

/** The extension-registered native functions must be callable from SQL
  * text and agree with the core library. (Registered into the shared
  * test session's registry — the same function triples the
  * SparkSessionExtensions path injects at session build time.) */
class GraftExtensionsSpec extends AnyFunSuite with SparkSuite {

  test("spark.sql can call extension-registered native expressions") {
    GraftExtensions.registerInto(spark)
    val row = spark.sql(
      """SELECT rabin_fp64('example.com') AS fp,
        |       simhash64('hello world hello world') AS sh,
        |       size(band_keys(simhash64('hello world hello world'))) AS nb
        |""".stripMargin).collect().head
    assert(row.getLong(0) == RabinFingerprint.std64.fp("example.com"))
    assert(row.getLong(1) == Hashing.simhash64("hello world hello world"))
    assert(row.getInt(2) == 20)
  }

  test("binary and parameterized native functions work from SQL text") {
    GraftExtensions.registerInto(spark)
    val row = spark.sql(
      """SELECT jaccard3(shingles3('abcdef'), shingles3('abcdeX')) AS j,
        |       dot_seq(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       doc_fp('the quick brown fox') AS fp1,
        |       doc_fp('the quick brown fox', 4) AS fp2,
        |       marker_counts(array('the', 'la', 'x'), 'the,and|la|la,el') AS mc
        |""".stripMargin).collect().head
    // shingles of abcdef = {abc,bcd,cde,def}; abcdeX = {abc,bcd,cde,deX}
    assert(row.getDouble(0) == 3.0 / 5.0)
    assert(row.getDouble(1) == 11.0)
    assert(row.getString(2) == row.getString(3)) // default k == explicit 4
    assert(row.getSeq[Long](4) == Seq(1L, 1L, 1L))
    // the spec argument must be a literal
    val err = intercept[Exception](
      spark.sql("SELECT marker_counts(array('a'), concat(rand()::string))").collect())
    assert(err.getMessage.contains("literal"))
  }
}
