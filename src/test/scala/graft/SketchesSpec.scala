package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite with SparkSuite {

  /** Zipf-ish stream: key i appears ~N/i times — a few giants, a long
    * tail far wider than the sketch capacity. */
  private def skewed(n: Int, keys: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      val k = math.min(keys - 1, (1.0 / math.max(u, 1e-9) - 1).toInt)
      s"k$k"
    }
  }

  test("exact when capacity covers the distinct keys, any partitioning") {
    import spark.implicits._
    val data = skewed(20000, 50, 42)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 7)) {
      val got = data.toDF("k").repartition(parts)
        .agg(Sketches.frequentItems(64)(col("k")).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key"), col("h.count"))
        .as[(String, Long)].collect().toMap
      assert(got == truth, s"parts=$parts")
    }
  }

  test("eviction regime: guarantees hold with capacity << distinct") {
    import spark.implicits._
    val n = 60000
    val cap = 16
    val data = skewed(n, 5000, 7)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bound = n.toLong / (cap + 1)

    val got = data.toDF("k").repartition(8)
      .agg(Sketches.frequentItems(cap)(col("k")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"))
      .as[(String, Long)].collect().toMap

    assert(got.size <= cap)
    // every key with true frequency > n/(cap+1) survives every merge
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(got.contains(k), s"heavy key $k evicted")
    }
    // counts under-estimate by at most n/(cap+1)
    got.foreach { case (k, c) =>
      val t = truth(k)
      assert(c <= t, s"$k over-counted: $c > $t")
      assert(t - c <= bound, s"$k error ${t - c} exceeds bound $bound")
    }
  }

  test("report order is deterministic: (count desc, key asc)") {
    import spark.implicits._
    val data = Seq("b", "a", "a", "c", "b", "d").toDF("k")
    val out = data.agg(Sketches.frequentItems(8)(col("k")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count")).as[(String, Long)].collect().toSeq
    assert(out == Seq("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("runs as ObjectHashAggregate with partial merge, no sort-based fallback") {
    import spark.implicits._
    val plan = skewed(2000, 100, 3).toDF("k").repartition(4)
      .agg(Sketches.frequentItems(64)(col("k")).as("hh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
