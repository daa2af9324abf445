package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Hashing, RabinFingerprint}
import graft.functions.GraftFunctions

/** The codegen'd native expressions must agree exactly with the core
  * library (which is itself parity-tested against reference constants),
  * both in interpreted eval and inside generated code. */
class NativeExpressionsSpec extends AnyFunSuite with SparkSuite {

  test("native rabin/simhash/band_keys expressions match the core library") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "The quick brown fox", "ümlaut-ø")
    val df = texts.toDF("t")
      .select(
        col("t"),
        GraftFunctions.rabinFp64(col("t")).as("fp"),
        GraftFunctions.simhash64(col("t")).as("sh"),
        GraftFunctions.bandKeys(GraftFunctions.simhash64(col("t"))).as("bk"))
    val rows = df.collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == RabinFingerprint.std64.fp(t))
      assert(r.getLong(2) == Hashing.simhash64(t))
      assert(r.getAs[scala.collection.Seq[Long]](3) == Hashing.bandKeys(Hashing.simhash64(t)).toSeq)
    }
  }

  test("native expressions run inside whole-stage codegen") {
    // parquet-backed input so the projection cannot constant-fold away
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs
      .select(GraftFunctions.rabinFp64(col("text")).as("fp"))
      .filter(col("fp") =!= 0L)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [rabinFp64"))
    assert(plan.contains("*(1) Filter"))
    // a Scala UDF would appear as a non-codegen "UDF" node in the plan
    assert(!plan.contains("UDF"))
    assert(df.count() > 0)
  }
}
