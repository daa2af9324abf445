package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftAlarm
import graft.streaming.DriftAlarm.{Calibration, HourCount}

/** The ONLINE CUSUM (streaming/DriftAlarm): Page's recursion as per-type
  * flatMapGroupsWithState under frozen calibration — two longs of state
  * per event_type, carried across micro-batches AND a full query
  * restart. Calibrating on the whole series makes it numerically
  * identical to batch st16, so the batch query is the oracle: the feed
  * splits at the median hour, the query stops cold between the halves,
  * and the restarted query must continue the statistic from the
  * checkpointed state — any state loss shows up as a cusum reset. */
class StreamingDriftAlarmSpec extends AnyFunSuite with SparkSuite {

  test("online fold == batch st16 under frozen calibration, across a restart") {
    import spark.implicits._
    val hourly = graft.queries.Registry.table(spark, sfDir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) DIV 3600").as("h_idx"))
      .groupBy("event_type", "h_idx")
      .agg(count(lit(1)).as("n"))
    // frozen calibration = st16's retrospective per-type (n_hours, total)
    // over the same series, so the two formulations agree EXACTLY
    val calib = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum(col("n")).as("tot"))
      .collect()
      .map(r => r.getString(0) -> Calibration(r.getLong(1), r.getLong(2)))
      .toMap
    val Array(mnH, mxH) = hourly.agg(min(col("h_idx")), max(col("h_idx")))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val mid = (mnH + mxH) / 2

    val root = java.nio.file.Files.createTempDirectory("graft-drift-").toString
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
    hourly.filter(col("h_idx") <= mid).coalesce(1).write.parquet(in)
    val schema = spark.read.parquet(in).schema

    def runOnce(): Unit = {
      val ds = spark.readStream.schema(schema).parquet(in).as[HourCount]
      val q = DriftAlarm.online(ds, calib)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce() // first half of the series
    // the second half lands as new files; the RESTARTED query must pick
    // up the per-type (s, lastH) from the checkpoint, not from zero
    hourly.filter(col("h_idx") > mid).coalesce(1)
      .write.mode("append").parquet(in)
    runOnce()

    def tuples(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSeq
    val got = tuples(spark.read.parquet(out)
      .select("event_type", "h_idx", "n", "cusum", "alarm")
      .orderBy("event_type", "h_idx"))
    val want = tuples(
      graft.queries.Registry.queries("st16_cusum_drift")(spark, sfDir))
    assert(got.nonEmpty)
    assert(got == want)
    // non-vacuity: some type's statistic must be mid-accumulation AT the
    // split, or the restart never tested live state
    val carried = want.exists { case (_, h, _, s, _) => h == mid && s > 0 }
    assert(carried, s"no type had nonzero cusum at the split hour $mid")
  }
}
