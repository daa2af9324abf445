package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite with SparkSuite {

  private def df(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, (i % 100) + 1L, 200L))
      .toDF("id", "w", "denom")
  }

  /** Reference implementation: BigInt over the same md5 bits. */
  private def keepRef(salt: String, id: Long, w: Long, d: Long): Boolean = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.take(15)
    val u = BigInt(hex, 16)
    val thr = (BigInt(2).pow(60) * w / d).min(BigInt(2).pow(60))
    u < thr
  }

  test("matches the BigInt reference decision row-for-row") {
    import spark.implicits._
    val got = Sampling.weightedKeep(df(5000), "t", "id", "w", "denom", "kept")
      .select($"id", $"w", $"kept").as[(Long, Long, Boolean)]
      .collect()
    got.foreach { case (id, w, kept) =>
      assert(kept == keepRef("t", id, w, 200L), s"id=$id w=$w")
    }
  }

  test("empirical keep rate tracks weight/denom") {
    import spark.implicits._
    val rates = Sampling.weightedKeep(df(100000), "r", "id", "w", "denom", "kept")
      .groupBy(($"w" / 25).cast("int").as("band"))
      .agg(avg($"kept".cast("double")).as("rate"), avg($"w" / lit(200.0)).as("p"))
      .as[(Int, Double, Double)].collect()
    rates.foreach { case (band, rate, p) =>
      assert(math.abs(rate - p) < 0.02, s"band=$band rate=$rate expected=$p")
    }
  }

  test("probability clamps at 1 and 0") {
    import spark.implicits._
    val d = Seq((1L, 500L, 200L), (2L, 0L, 200L)).toDF("id", "w", "denom")
    val out = Sampling.weightedKeep(d, "c", "id", "w", "denom", "kept")
      .select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(out(1L)) // w >= denom: always kept
    assert(!out(2L)) // zero weight: never kept
  }

  test("partitioning-invariant: same sample under any layout") {
    import spark.implicits._
    val base = Sampling.weightedKeep(df(10000), "p", "id", "w", "denom", "kept")
      .filter($"kept").select($"id").as[Long].collect().toSet
    val shuffled = Sampling.weightedKeep(
        df(10000).repartition(13, $"w"), "p", "id", "w", "denom", "kept")
      .filter($"kept").select($"id").as[Long].collect().toSet
    assert(base == shuffled)
    assert(base.nonEmpty)
  }
}
