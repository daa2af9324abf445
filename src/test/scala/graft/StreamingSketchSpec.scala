package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Streaming sketch maintenance: each micro-batch folds into a BOUNDED
  * summary row appended to a state table; a later rollup merges the
  * per-batch states without rescanning any batch. This is the streaming
  * face of the a13/a14 persisted-rollup path — the state crossing each
  * batch boundary is O(capacity), not O(batch), and the mergeable-
  * summaries guarantees make the incremental answer equal the batch
  * one-shot (exactly, in the capacity-covers-keys regime; KMV exactly in
  * EVERY regime since its merge is lossless). */
class StreamingSketchSpec extends AnyFunSuite with SparkSuite {

  private def restreamEvents(parts: Int): (String, org.apache.spark.sql.types.StructType) = {
    // re-materialize at micros precision (file sources reject the driver
    // parquet's nanos), split into `parts` files = `parts` micro-batches
    val path = java.nio.file.Files.createTempDirectory("events_sketch_stream").toString
    graft.queries.Registry.table(spark, sfDir, "events")
      .repartition(parts)
      .write.mode("overwrite").parquet(path)
    (path, spark.read.parquet(path).schema)
  }

  test("per-batch distinct states roll up to the exact batch COUNT(DISTINCT)") {
    import spark.implicits._
    val (path, schema) = restreamEvents(5)
    val stateDir = java.nio.file.Files.createTempDirectory("kmv_states").toString

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.groupBy(col("event_type"))
          .agg(Sketches.distinctState(4096)(col("user_id").cast("string")).as("st"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(stateDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val states = spark.read.parquet(stateDir)
    assert(states.select("batch_id").distinct.count() > 1, "expected multiple micro-batches")

    val rolled = states.groupBy(col("event_type"))
      .agg(Sketches.mergeDistinct(4096)(col("st.hashes"), col("st.full")).as("d"))
      .as[(String, Long)].collect().toMap
    val want = graft.queries.Registry.table(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"))
      .as[(String, Long)].collect().toMap
    assert(rolled == want)
  }

  test("streaming bloom: per-batch bit sets OR-merge into the crawl-history gate") {
    // the reference's URLFPBloomFilter use case is incremental by
    // nature — the crawl history grows batch by batch; the set-bit-rows
    // state makes the streaming build trivial (append per-batch bits,
    // distinct at probe time) and EXACTLY equal to the one-shot filter
    val (path, schema) = restreamEvents(4)
    val bitsDir = java.nio.file.Files.createTempDirectory("bloom_bits").toString
    val m = 1 << 16
    val k = 3

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.bloomBits(
          batch.select(concat(col("user_id"), lit(":"), col("event_type")).as("key")),
          "key", m, k)
          .write.mode("append").parquet(bitsDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamedBits = spark.read.parquet(bitsDir).distinct()
    val oneShot = Sketches.bloomBits(
      graft.queries.Registry.table(spark, sfDir, "events")
        .select(concat(col("user_id"), lit(":"), col("event_type")).as("key")),
      "key", m, k)
    assert(streamedBits.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(streamedBits).count() == 0,
      "incrementally built filter must equal the one-shot filter bit-for-bit")
  }

  test("per-batch heavy-hitter summaries roll up to the batch counts (exact regime)") {
    import spark.implicits._
    val (path, schema) = restreamEvents(4)
    val stateDir = java.nio.file.Files.createTempDirectory("mg_states").toString

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.agg(Sketches.frequentItems(4096)(
            col("user_id").cast("string")).as("hh"))
          .select(explode(col("hh")).as("h"))
          .select(col("h.key"), col("h.count"))
          .write.mode("append").parquet(stateDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val rolled = spark.read.parquet(stateDir)
      .agg(Sketches.mergeFrequent(4096)(col("key"), col("count")).as("m"))
      .select(explode(col("m")).as("h"))
      .select(col("h.key"), col("h.count"))
      .as[(String, Long)].collect().toMap
    val want = graft.queries.Registry.table(spark, sfDir, "events")
      .groupBy(col("user_id").cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(rolled == want)
  }
}
