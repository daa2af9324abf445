package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkSuite {

  test("bucketed interval join equals nested-loop BETWEEN semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // overlapping ranges of wildly different widths, negative and positive
    val ranges = (0 until 60).map { i =>
      val lo = rnd.nextLong() % 1000000L
      val hi = lo + rnd.nextInt(200000)
      (i, lo, hi)
    }.toDF("range_id", "lo", "hi")
    val probes = (0 until 3000).map { i =>
      (i.toLong, rnd.nextLong() % 1100000L)
    }.toDF("probe_id", "p")

    val got = RangeJoin.lookup(probes, "p", ranges, "lo", "hi", bucketBits = 14)
      .select("probe_id", "range_id").as[(Long, Int)].collect().toSet

    val want = probes.join(ranges,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("probe_id", "range_id").as[(Long, Int)].collect().toSet

    assert(want.nonEmpty)
    assert(got == want)
  }

  test("no duplicate candidates for ranges spanning many buckets") {
    import spark.implicits._
    val ranges = Seq((1, 0L, 1000000L)).toDF("range_id", "lo", "hi") // ~61 buckets at 2^14
    val probes = Seq((1L, 5L), (2L, 999999L), (3L, 1000001L)).toDF("probe_id", "p")
    val out = RangeJoin.lookup(probes, "p", ranges, "lo", "hi", 14)
      .select("probe_id").as[Long].collect().toSeq.sorted
    assert(out == Seq(1L, 2L)) // each matching probe exactly once
  }

  test("plan is an equi-join on the bucket key, not a nested loop") {
    import spark.implicits._
    val ranges = (0 until 50).map(i => (i, i * 100L, i * 100L + 150L))
      .toDF("range_id", "lo", "hi")
    val probes = (0 until 500).map(i => (i.toLong, i * 13L % 5000L))
      .toDF("probe_id", "p")
    val plan = RangeJoin.lookup(probes, "p", ranges, "lo", "hi", 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
