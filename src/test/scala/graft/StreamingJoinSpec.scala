package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** §2.13: watermarked stream-stream interval join — the event-correlation
  * shape (click attribution, fetch-result-to-request matching) the
  * reference performs with in-process maps keyed by URL fingerprint.
  * Spark-native: both sides carry event-time watermarks and the join
  * condition bounds the time skew, so the state store holds only the
  * watermark-deep tail of each side — bounded state is what makes the
  * join runnable on an unbounded 100 TB/day stream, and the purge
  * assertion below is the test for it. */
class StreamingJoinSpec extends AnyFunSuite with SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("interval join matches within the window, drops late data, purges state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]

    val impDf = imps.toDF.toDF("i_user", "i_ts").withWatermark("i_ts", "10 minutes")
    val clkDf = clicks.toDF.toDF("c_user", "c_ts").withWatermark("c_ts", "10 minutes")

    // attribute a click to an impression of the same user at most 10
    // minutes earlier — equi-key plus a bounded time range, so Spark can
    // expire impression state older than watermark − 10 min
    val joined = impDf.join(clkDf,
      expr("i_user = c_user AND c_ts >= i_ts AND c_ts <= i_ts + interval 10 minutes"))

    val q = joined.writeStream
      .format("memory").queryName("attributed").outputMode(OutputMode.Append).start()
    try {
      // batch 1: two impressions, one in-window click, one out-of-window
      imps.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(5)), (2L, ts(25)))
      q.processAllAvailable()
      val afterB1 = spark.table("attributed").as[(Long, Timestamp, Long, Timestamp)].collect()
      assert(afterB1.toSet == Set((1L, ts(0), 1L, ts(5))),
        s"only user 1's click is within 10 minutes: ${afterB1.mkString(",")}")

      // batch 2: advance both watermarks far past batch 1 (max event time
      // 70 − delay 10 → watermark 60; impression state before minute
      // 60−10 is purgeable)
      imps.addData((9L, ts(70)))
      clicks.addData((9L, ts(70)))
      q.processAllAvailable()
      // run one more empty-ish batch so the purge (computed from the
      // PREVIOUS batch's max event time) is reflected in metrics
      imps.addData((9L, ts(71)))
      q.processAllAvailable()

      // batch 3: a late click for user 2 at minute 6 — in-window for the
      // minute-0 impression, but both are behind the watermark: the
      // impression state is purged and the late row must NOT join
      clicks.addData((2L, ts(6)))
      q.processAllAvailable()
      val afterB3 = spark.table("attributed").as[(Long, Timestamp, Long, Timestamp)].collect()
      assert(afterB3.count(r => r._1 == 2L) == 0,
        s"late click behind the watermark must not produce a join row: ${afterB3.mkString(",")}")

      // bounded state: the store holds only the watermark-deep tail, not
      // every row ever seen (7 inputs so far; purged state ≤ the 3 live
      // tail rows plus the current batch's additions)
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      assert(state.map(_.numRowsTotal).sum <= 5,
        s"state must purge below watermark: ${q.lastProgress.prettyJson}")
    } finally q.stop()
  }

  test("stream-stream interval join parity with the batch join on events") {
    // replay the events table as two derived streams: impressions are the
    // raw events, clicks are a 1-in-3 sample time-shifted +5 minutes; the
    // streaming append-mode result must equal the batch join row-for-row
    val src = graft.queries.Registry.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
    val path = java.nio.file.Files.createTempDirectory("events_join").toString
    src.write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    def impsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id").as("i_user"), col("ts").as("i_ts"),
        col("event_id").as("i_id"))
    def clicksOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_id") % 3 === 0)
        .select(col("user_id").as("c_user"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("c_ts"),
          col("event_id").as("c_id"))
    val cond = "i_user = c_user AND c_ts >= i_ts AND c_ts <= i_ts + interval 10 minutes"

    val streamSrc = spark.readStream.schema(schema).parquet(path)
    val streamed = impsOf(streamSrc).withWatermark("i_ts", "1 hour")
      .join(clicksOf(streamSrc).withWatermark("c_ts", "1 hour"), expr(cond))
      .select("i_id", "c_id")

    val q = streamed.writeStream
      .format("memory").queryName("join_parity").outputMode(OutputMode.Append).start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.table("join_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = impsOf(src).join(clicksOf(src), expr(cond))
      .select("i_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }
}
