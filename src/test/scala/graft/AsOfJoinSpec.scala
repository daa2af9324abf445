package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def build() = {
    import spark.implicits._
    Seq(
      ("a", ts(100), 1.0),
      ("a", ts(200), 2.0),
      ("a", ts(300), 3.0),
      ("b", ts(150), 10.0),
    ).toDF("k", "ts", "v")
  }

  private def probe() = {
    import spark.implicits._
    Seq(
      (1L, "a", ts(50)),   // before any state -> null
      (2L, "a", ts(100)),  // equal ts -> inclusive, takes 1.0
      (3L, "a", ts(250)),  // between -> 2.0
      (4L, "a", ts(999)),  // after all -> 3.0
      (5L, "b", ts(149)),  // before b's only state -> null
      (6L, "b", ts(150)),  // equal -> 10.0
      (7L, "c", ts(500)),  // key with no state at all -> null
    ).toDF("event_id", "k", "ts")
  }

  test("backward: most recent state at-or-before, null when none") {
    val out = AsOfJoin.backward(probe(), build(), "k", "ts")
      .orderBy(col("event_id"))
      .collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    assert(out == Map(1L -> null, 2L -> 1.0, 3L -> 2.0, 4L -> 3.0,
      5L -> null, 6L -> 10.0, 7L -> null))
  }

  test("forward: earliest state at-or-after") {
    val out = AsOfJoin.forward(probe(), build(), "k", "ts")
      .orderBy(col("event_id"))
      .collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    assert(out == Map(1L -> 1.0, 2L -> 1.0, 3L -> 3.0, 4L -> null,
      5L -> 10.0, 6L -> 10.0, 7L -> null))
  }

  test("bucketed equals plain on random data across bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // states sparse, probes dense, many bucket-boundary collisions
    val st = (1 to 400).map { _ =>
      (s"k${rnd.nextInt(12)}", ts(rnd.nextInt(100000).toLong), rnd.nextDouble())
    }.distinct
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq // unique per (k, ts)
      .toDF("k", "ts", "v")
    val pr = (1 to 2000).map { i =>
      (i.toLong, s"k${rnd.nextInt(14)}", ts(rnd.nextInt(110000).toLong))
    }.toDF("event_id", "k", "ts")

    val plain = AsOfJoin.backward(pr, st, "k", "ts")
      .orderBy(col("event_id")).collect().toSeq
    for (width <- Seq(7L, 1000L, 86400L)) {
      val bucketed = AsOfJoin.backwardBucketed(pr, st, "k", "ts", width)
        .orderBy(col("event_id")).collect().toSeq
      assert(bucketed == plain, s"bucket width $width diverged")
    }
  }

  test("bucketed: heavy window is partitioned by (key, bucket), not key") {
    val pr = probe()
    val plan = AsOfJoin.backwardBucketed(pr, build(), "k", "ts", 60L)
      .queryExecution.optimizedPlan.toString
    // phase-1 window must carry the bucket in its partition spec
    assert(plan.contains("_asof_bucket"))
  }

  test("micro-batched as-of with compacted carry == one-shot backward") {
    // the ingest decomposition: time-ordered micro-batches, each joined
    // against carry ∪ batch-build, carry compacted to last-state-per-key
    // (O(keys) streaming state) — union of outputs equals the one-shot
    // join over the full log
    val ev = graft.queries.Registry.table(spark, sfDir, "events")
    val st = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("v"))
    val pr = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))

    val oneShot = AsOfJoin.backward(pr, st, "user_id", "ts")
      .orderBy(col("event_id")).collect().toSeq

    val cuts = st.select(col("ts")).unionByName(pr.select(col("ts")))
      .selectExpr(
        "timestamp_micros(cast(percentile_disc(0.25) WITHIN GROUP (ORDER BY unix_micros(ts)) AS BIGINT)) p1",
        "timestamp_micros(cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY unix_micros(ts)) AS BIGINT)) p2",
        "timestamp_micros(cast(percentile_disc(0.75) WITHIN GROUP (ORDER BY unix_micros(ts)) AS BIGINT)) p3")
      .collect()(0)
    val bounds = Seq(cuts.getTimestamp(0), cuts.getTimestamp(1), cuts.getTimestamp(2))
    def slice(df: org.apache.spark.sql.DataFrame, i: Int) = i match {
      case 0 => df.filter(col("ts") <= bounds(0))
      case 3 => df.filter(col("ts") > bounds(2))
      case n => df.filter(col("ts") > bounds(n - 1) && col("ts") <= bounds(n))
    }

    var carry = st.limit(0) // empty state, build schema
    val outs = (0 to 3).map { i =>
      val bBuild = slice(st, i)
      val bProbe = slice(pr, i)
      val withState = carry.unionByName(bBuild)
      val out = AsOfJoin.backward(bProbe, withState, "user_id", "ts")
      carry = AsOfJoin.lastStatePerKey(withState, "user_id", "ts")
        .localCheckpoint(true) // truncate the growing lineage, as ingest would
      out
    }
    val incremental = outs.reduce(_ unionByName _)
      .orderBy(col("event_id")).collect().toSeq
    assert(incremental == oneShot)
    assert(oneShot.nonEmpty)
    // the carry stays O(keys): never more rows than distinct users
    assert(carry.count() <= ev.select("user_id").distinct().count())
  }

  test("probe/build column collision is rejected") {
    import spark.implicits._
    val b = Seq(("a", ts(1), 1.0)).toDF("k", "ts", "x")
    val p = Seq(("a", ts(2), 2.0)).toDF("k", "ts", "x")
    assertThrows[IllegalArgumentException](AsOfJoin.backward(p, b, "k", "ts"))
  }
}
