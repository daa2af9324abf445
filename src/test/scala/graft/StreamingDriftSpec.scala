package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming face of cu23's distribution-drift audit — the corpus-monitor
  * topology: each arriving micro-batch folds into O(langs × snap) count
  * cells appended to a state table; the drift report (observed vs
  * independence expectation, signed dev_ppm) recomputes from the SUMMED
  * cells alone, never rescanning a batch. Counts are a semigroup, so the
  * incrementally maintained report equals the one-shot cu23 report
  * exactly — asserted row-for-row against the registry query itself. */
class StreamingDriftSpec extends AnyFunSuite with SparkSuite {

  test("per-batch drift cells roll up to the one-shot cu23 report") {
    val path = java.nio.file.Files.createTempDirectory("docs_drift_stream").toString
    graft.queries.Registry.table(spark, sfDir, "documents")
      .repartition(4)
      .write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema
    val cellsDir = java.nio.file.Files.createTempDirectory("drift_cells").toString

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch
          .select(col("lang"), (col("doc_id") % 2).cast("int").as("snap"))
          .groupBy("lang", "snap").agg(count(lit(1)).as("o"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(cellsDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val states = spark.read.parquet(cellsDir)
    assert(states.select("batch_id").distinct.count() > 1,
      "expected multiple micro-batches")

    // report from the state table alone (the monitor's read path)
    val cells = states.groupBy("lang", "snap").agg(sum(col("o")).as("o"))
    val rowM = cells.groupBy("lang").agg(sum(col("o")).as("r"))
    val colM = cells.groupBy("snap").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val incremental = cells
      .join(broadcast(rowM), "lang")
      .join(broadcast(colM), "snap")
      .crossJoin(broadcast(tot))
      .withColumn("e", expr("r * c div n"))
      .withColumn("dev_ppm", expr(
        """CASE WHEN o * n >= r * c
           THEN (o * n - r * c) * 1000000L div (r * c)
           ELSE -((r * c - o * n) * 1000000L div (r * c)) END"""))
      .select("lang", "snap", "o", "e", "dev_ppm")

    val oneShot = graft.queries.Registry.queries("cu23_drift_audit")(spark, sfDir)
    assert(incremental.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(incremental).count() == 0,
      "incrementally maintained drift report must equal the one-shot audit")
  }
}
