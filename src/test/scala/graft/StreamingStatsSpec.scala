package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.13: the reference's "streaming" is in-process hourly stats folding;
  * the Spark-native equivalent is Structured Streaming with event-time
  * windows. This spec replays the events table as a file stream and
  * proves the watermarked tumbling-window aggregation produces exactly
  * the batch hourly rollup (same fold, incremental execution). */
class StreamingStatsSpec extends AnyFunSuite with SparkSuite {

  test("streaming hourly window agg == batch hourly rollup") {
    // the driver parquet stores nanosecond timestamps, which the file
    // sources reject — re-materialize at micros precision via the
    // Registry's nanos-tolerant reader
    val path = java.nio.file.Files.createTempDirectory("events_stream").toString
    graft.queries.Registry.table(spark, sfDir, "events")
      .write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    val streamed = spark.readStream
      .schema(schema)
      .parquet(path)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"))

    val q = streamed.writeStream
      .format("memory")
      .queryName("hourly_stream")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }

    val got = spark.table("hourly_stream")
      .orderBy("hour", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSeq

    val want = graft.queries.Registry.table(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("hour", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSeq

    assert(got.nonEmpty)
    assert(got == want)
  }

  test("streaming sliding (2h/1h) window agg == batch hopping rollup (st6 shape)") {
    val path = java.nio.file.Files.createTempDirectory("events_slide").toString
    graft.queries.Registry.table(spark, sfDir, "events")
      .write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    def slidingAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

    val streamed = slidingAgg(
      spark.readStream.schema(schema).parquet(path).withWatermark("ts", "1 hour"))

    val q = streamed.writeStream
      .format("memory")
      .queryName("sliding_stream")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSeq

    val got = rows(spark.table("sliding_stream"))
    val want = rows(slidingAgg(graft.queries.Registry.table(spark, sfDir, "events")))
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("streaming session_window == batch gap-based sessionization") {
    // same parity discipline as the hourly test, for st5's sessionization.
    // Boundary note: session_window starts a NEW session when the gap is
    // exactly the timeout (windows are half-open), so the batch twin here
    // uses `gap >= 30 min`; st5's registered query uses `>` — identical on
    // this data (micro-precision timestamps never land on the boundary).
    val path = java.nio.file.Files.createTempDirectory("events_sess").toString
    graft.queries.Registry.table(spark, sfDir, "events")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    val streamed = spark.readStream
      .schema(schema)
      .parquet(path)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        // window end = last event + timeout; subtract it back to the
        // last-event timestamp so the tuple matches the batch fold
        (col("session_window.end") - expr("INTERVAL 30 MINUTES")).as("session_end"),
        col("n_events"))

    val q = streamed.writeStream
      .format("memory")
      .queryName("session_stream")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }

    val got = spark.table("session_stream")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val newSession = when(
      unix_millis(col("ts")) -
        unix_millis(lag(col("ts"), 1).over(byUser)) >= 1800000L, 1L)
      .otherwise(when(lag(col("ts"), 1).over(byUser).isNull, 1L).otherwise(0L))
    val want = graft.queries.Registry.table(spark, sfDir, "events")
      .withColumn("new_s", newSession)
      .withColumn("session_idx",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    assert(got.nonEmpty)
    assert(got == want)
  }
}
