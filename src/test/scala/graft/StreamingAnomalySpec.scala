package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** st7's streaming twin: the hourly series is maintained INCREMENTALLY
  * (watermarked tumbling-window count — the only corpus-sized work), and
  * the rolling anomaly flags are a view recomputed over the O(hours)
  * aggregate on each refresh. That split is the production design: the
  * trailing-day comparison needs 25 rows per type, so it belongs on the
  * serving read of the tiny state table, not inside the stream. The spec
  * proves the composed path emits exactly the batch st7 rows. */
class StreamingAnomalySpec extends AnyFunSuite with SparkSuite {

  test("streamed hourly state + rolling flag view == batch st7") {
    val path = java.nio.file.Files.createTempDirectory("events_anom").toString
    graft.queries.Registry.table(spark, sfDir, "events")
      .write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    val streamed = spark.readStream
      .schema(schema)
      .parquet(path)
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("window.start").as("hour"),
        col("n_events"))

    val q = streamed.writeStream
      .format("memory")
      .queryName("anomaly_hourly")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val tw = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    def tuples(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSeq

    val got = tuples(spark.table("anomaly_hourly")
      .withColumn("trail_sum", coalesce(sum(col("n_events")).over(tw), lit(0L)))
      .withColumn("trail_n", count(lit(1)).over(tw))
      .withColumn("is_anomaly",
        col("trail_n") === 24 && col("n_events") * 24 >= col("trail_sum") * 2)
      .select("event_type", "hour", "n_events", "trail_sum", "trail_n",
        "is_anomaly")
      .orderBy("event_type", "hour"))

    val want = tuples(
      graft.queries.Registry.queries("st7_anomalies")(spark, sfDir))

    assert(got.nonEmpty)
    assert(got == want)
  }
}
