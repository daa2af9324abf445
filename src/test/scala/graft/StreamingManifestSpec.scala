package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** cu19's streaming twin: because every manifest column is a commutative
  * aggregate (count / sum / min / max / hash-sum), the audit state
  * maintains INCREMENTALLY — each micro-batch folds into the running
  * per-source summary, no rescan — and must equal the batch manifest
  * exactly. This is how the audit runs in production: the ingest stream
  * keeps the manifest current for free, and a replica diff is a read of
  * two tiny state tables. */
class StreamingManifestSpec extends AnyFunSuite with SparkSuite {

  test("incrementally-maintained manifest == batch cu19") {
    val path = java.nio.file.Files.createTempDirectory("docs_manifest").toString
    graft.queries.Registry.table(spark, sfDir, "documents")
      .write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    val streamed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1") // force multi-batch folding
      .parquet(path)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        sum(conv(substring(md5(col("text")), 1, 7), 16, 10)
          .cast("long")).as("content_sum"))

    val q = streamed.writeStream
      .format("memory")
      .queryName("manifest_stream")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.table("manifest_stream").orderBy("source")
      .collect().map(_.toSeq).toSeq
    val want = graft.queries.Registry
      .queries("cu19_audit_manifest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }
}
