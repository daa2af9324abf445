package graft

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
}
