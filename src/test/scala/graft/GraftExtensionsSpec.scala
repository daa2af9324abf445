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
}
