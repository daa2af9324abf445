package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest-time deduplication: the LLM-pipeline twin of batch d1
  * (exact content-hash dedupe). At 100 TB the cheapest place to drop
  * duplicates is on ingest, before they ever land in the corpus —
  * Structured Streaming's dropDuplicates keys state by the content hash,
  * so each arriving micro-batch is filtered against everything already
  * admitted. This spec replays the documents table as a file stream split
  * into multiple micro-batches (maxFilesPerTrigger=1) and proves the
  * admitted set is exactly the batch winner-per-hash set in count and in
  * key coverage (streaming keeps the FIRST arrival per hash, which is
  * arrival-order-dependent; batch d1 keeps min doc_id — same clusters,
  * same cardinality, deterministic representative only in batch). */
class StreamingDedupeSpec extends AnyFunSuite with SparkSuite {

  test("streaming dropDuplicates on content hash == batch exact-dedupe clusters") {
    val docs = graft.queries.Registry.table(spark, sfDir, "documents")
      .withColumn("content_hash", md5(col("text")))

    // several parquet files so the stream sees >1 micro-batch and the
    // dedupe state actually carries across triggers
    val path = java.nio.file.Files.createTempDirectory("docs_stream").toString
    docs.repartition(4).write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    val streamed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .dropDuplicates("content_hash")

    val q = streamed.writeStream
      .format("memory")
      .queryName("deduped_stream")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val admitted = spark.table("deduped_stream")

    val batchWinners = docs
      .groupBy("content_hash")
      .agg(min("doc_id").as("doc_id"))

    // one admitted doc per distinct hash…
    assert(admitted.count() == batchWinners.count())
    assert(admitted.select("content_hash").distinct().count() == admitted.count())
    // …covering exactly the batch hash set
    val missing = batchWinners
      .join(admitted, Seq("content_hash"), "left_anti")
      .count()
    assert(missing == 0)
    assert(admitted.count() > 0)
  }

  test("micro-batched incremental near-dup == one-shot d7 over the same batch") {
    // d7's batch-vs-corpus probe is stateless per new doc, so splitting the
    // ingest into micro-batches and probing the corpus per trigger must
    // accumulate exactly the one-shot result — the property that lets the
    // same operator run under foreachBatch at ingest time
    val docs = graft.queries.Registry.table(spark, sfDir, "documents")
    val corpus = docs.filter(col("source") =!= "src0")
    val batch = docs.filter(col("source") === "src0")

    val path = java.nio.file.Files.createTempDirectory("incdedupe_stream").toString
    batch.repartition(3).write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema

    val collected = scala.collection.mutable.Set[(Long, Long)]()
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .writeStream
      .foreachBatch { (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.Dedupe.incrementalNearDupPairs(
            corpus, mb, "doc_id", "text", threshold = 0.8)
          .select("new_id", "corpus_id").collect()
          .foreach(r => collected += ((r.getLong(0), r.getLong(1))))
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val oneShot = graft.ops.Dedupe.incrementalNearDupPairs(
        corpus, batch, "doc_id", "text", threshold = 0.8)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collected.toSet == oneShot)
    assert(oneShot.nonEmpty)
  }

  test("foreachBatch probe+append maintains the persistent index across triggers") {
    // the full production ingest loop under Structured Streaming: each
    // micro-batch probes the PERSISTENT banded index, drops its near-dups,
    // and appends the survivors — so later triggers dedupe against earlier
    // ones. Final state must equal the sequential batch computation.
    val docs = graft.queries.Registry.table(spark, sfDir, "documents")
    val corpus0 = docs.filter(col("source") =!= "src0" && col("source") =!= "src1")
    val ingest = docs.filter(col("source") === "src0" || col("source") === "src1")

    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val idxPath = java.nio.file.Files.createTempDirectory("graft-sidx-").toString
    graft.ops.Dedupe.writeBandedIndex(corpus0, "doc_id", "text",
      s"sidx_$suffix", idxPath)

    val path = java.nio.file.Files.createTempDirectory("ingest_stream").toString
    // deterministic trigger split (by source), not repartition: the
    // accumulated result depends on arrival grouping, and the sequential
    // reference below must replay the same grouping
    ingest.filter(col("source") === "src0").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/b0")
    val firstFiles = new java.io.File(s"$path/b0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    ingest.filter(col("source") === "src1").coalesce(1)
      .write.mode("append").parquet(s"$path/b0") // same dir, 2 files
    // pin the arrival order explicitly: FileStreamSource lists oldest-
    // first, and a coarse-mtime filesystem could otherwise tie the two
    // writes and leave the order (and the accumulated result) ambiguous
    val now = System.currentTimeMillis()
    new java.io.File(s"$path/b0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        f.setLastModified(
          if (firstFiles(f.getName)) now - 120000L else now - 60000L)
      }
    val schema = spark.read.parquet(s"$path/b0").schema

    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$path/b0")
      .writeStream
      .foreachBatch { (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val mbDf = mb.cache()
        val dupIds = graft.ops.Dedupe.probeBandedIndex(
            spark, s"sidx_$suffix", mbDf, "doc_id", "text", 0.8)
          .select("new_id").distinct()
          .collect().map(_.getLong(0)).toSet
        val survivors = mbDf.filter(!col("doc_id").isin(dupIds.toSeq: _*))
        graft.ops.Dedupe.appendToBandedIndex(
          survivors, "doc_id", "text", s"sidx_$suffix")
        admitted ++= survivors.select("doc_id").collect().map(_.getLong(0))
        mbDf.unpersist()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // sequential reference over the same trigger order (the file stream
    // picks up files oldest-first; part names are UUIDs, so order by mtime)
    val files = new java.io.File(s"$path/b0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(_.lastModified).map(_.toString)
    var refCorpus = corpus0
    val refAdmitted = scala.collection.mutable.ArrayBuffer[Long]()
    files.foreach { f =>
      val mb = spark.read.parquet(f)
      val dup = graft.ops.Dedupe.incrementalNearDupPairs(
          refCorpus, mb, "doc_id", "text", 0.8)
        .select("new_id").distinct().collect().map(_.getLong(0)).toSet
      val surv = mb.filter(!col("doc_id").isin(dup.toSeq: _*))
      refAdmitted ++= surv.select("doc_id").collect().map(_.getLong(0))
      refCorpus = refCorpus.unionByName(surv)
    }
    assert(admitted.toSet == refAdmitted.toSet)
    assert(admitted.nonEmpty)
  }
}
