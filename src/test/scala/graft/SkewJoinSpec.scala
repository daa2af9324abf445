package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftSession turns on AQE skew-join splitting as the engine's answer
  * to hot keys (super-domains owning a large share of the link graph —
  * SURVEY §1.7). This spec proves the mechanism actually fires: a join
  * where one key holds ~all the rows gets its oversized shuffle
  * partition split at runtime, instead of stalling one straggler task.
  * Thresholds are lowered to make "skewed" reachable at test scale; the
  * mechanism is scale-free (ratios, not absolute sizes). */
class SkewJoinSpec extends AnyFunSuite with SparkSuite {

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: a partition is "skewed" past 64 KiB and
      // 2× median, and splits into ~16 KiB reads
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a sort-merge join — skew splitting applies to SMJ reads
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // ~50k rows, 99% on ONE key, with a fat payload; vs 100 uniform keys
      val skewed = spark.range(0, 50000)
        .select(
          when(col("id") % 100 < 99, lit(0L)).otherwise(col("id") % 100).as("k"),
          col("id").as("v"),
          lit("x" * 64).as("pad"))
      val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))

      val joined = skewed.join(dim, "k")
      // execute THIS Dataset's queryExecution (count() would plan a
      // separate query and leave this one's adaptive plan unfinalized)
      assert(joined.collect().length == 50000)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
