package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** §2.13 streaming form of the S7 multi-stream sink: the reference's
  * parser emits its metadata/text/raw splits continuously as segments
  * flow through (ParserOutputFormat under the crawl's segment cadence).
  * Spark-native: a file stream driven through `foreachBatch`, each batch
  * fanned out by `Sinks.writeByType` in append mode — the same one-pass
  * split as the batch path, so the accumulated streams must equal the
  * one-shot batch split regardless of micro-batch boundaries. */
class StreamingMultiSinkSpec extends AnyFunSuite with SparkSuite {

  test("streamed multi-sink fan-out == one-shot batch split") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        element_at(array(lit("meta"), lit("text"), lit("raw")),
          (col("doc_id") % 3 + 1).cast("int")).as("rec_type"))

    val in = java.nio.file.Files.createTempDirectory("ms-in").toString
    docs.repartition(4).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema

    val batchOut = java.nio.file.Files.createTempDirectory("ms-batch").toString
    Sinks.writeByType(docs, "rec_type", batchOut)

    val streamOut = java.nio.file.Files.createTempDirectory("ms-stream").toString
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // force several micro-batches
      .parquet(in)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.partitionBy("rec_type").mode("append").parquet(streamOut)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    def streams(base: String): Map[String, Set[(Long, String)]] =
      Seq("meta", "text", "raw").map { t =>
        t -> Sinks.readStreamDir(spark, base, "rec_type", t)
          .select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
      }.toMap

    val batchStreams = streams(batchOut)
    val streamStreams = streams(streamOut)
    assert(streamStreams == batchStreams)
    assert(batchStreams.values.map(_.size).sum == docs.count())
    assert(batchStreams.values.forall(_.nonEmpty))
  }
}
