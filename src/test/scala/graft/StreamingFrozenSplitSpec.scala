package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FrozenSplit
import graft.streaming.FrozenSplit.DocArrival

/** Streaming frozen-split admission (the cu24 online twin): the first
  * sighting of a cluster decides its split with the batch md5 rule and
  * freezes it in TTL-free keyed state; later arrivals inherit — across
  * micro-batches AND a full query restart — even when a re-root means a
  * fresh hash would assign differently. Any state loss shows up as a
  * flipped split on the post-restart batch. */
class StreamingFrozenSplitSpec extends AnyFunSuite with SparkSuite {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  test("splitOf mirrors the batch md5 bucket rule engine-for-engine") {
    import spark.implicits._
    // the batch side hashes with Spark's md5 expression; the streaming
    // side uses MessageDigest — prove they agree on a spread of reps
    val reps = (0 until 64).map(i => s"rep$i") ++ Seq("A", "A2", "B", "C")
    val viaSpark = reps.toDF("rep")
      .select(col("rep"),
        when(substring(md5(concat(lit("lsplit:"), col("rep"))), 1, 2) < "cc",
          "train").otherwise("heldout").as("split"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    reps.foreach { r =>
      assert(FrozenSplit.splitOf(r) == viaSpark(r), s"rep=$r")
    }
  }

  test("admission freezes per cluster across micro-batches and a restart") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-frozensplit-").toString
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"

    // batch 1: clusters A (rep "A" → heldout) and B (rep "B" → heldout),
    // two docs each so the within-batch inherit path runs too
    Seq(
      DocArrival("A", "A", 1L, ts(1)),
      DocArrival("A", "A", 2L, ts(2)),
      DocArrival("B", "B", 3L, ts(1)),
      DocArrival("B", "B", 4L, ts(3)),
    ).toDF().coalesce(1).write.parquet(in)
    val schema = spark.read.parquet(in).schema

    def runOnce(): Unit = {
      val ds = spark.readStream.schema(schema).parquet(in).as[DocArrival]
      val q = FrozenSplit.admissions(ds)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()

    // batch 2 lands AFTER a cold stop: cluster A re-rooted to rep "A2"
    // (a fresh hash says train — the flip the freeze must prevent),
    // B unchanged, C brand new (rep "C" → train, decided now)
    Seq(
      DocArrival("A", "A2", 5L, ts(10)),
      DocArrival("B", "B", 6L, ts(11)),
      DocArrival("C", "C", 7L, ts(12)),
    ).toDF().coalesce(1).write.mode("append").parquet(in)
    runOnce()

    val got = spark.read.parquet(out)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(got.size == 7)
    // batch 1: first doc per cluster decides, second inherits in-batch
    assert(got(1L) == (("A", "heldout", false, false)))
    assert(got(2L) == (("A", "heldout", true, false)))
    assert(got(3L) == (("B", "heldout", false, false)))
    assert(got(4L) == (("B", "heldout", true, false)))
    // batch 2, post-restart: A's re-root would hash train, but the
    // checkpointed state holds heldout — inherited AND marked flipped
    assert(got(5L) == (("A", "heldout", true, true)))
    assert(got(6L) == (("B", "heldout", true, false)))
    // C is genuinely new: decided now, not frozen, not flipped
    assert(got(7L) == (("C", "train", false, false)))
  }
}
