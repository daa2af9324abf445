package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** The multimodal ingest gate composed end-to-end: WARC segments of
  * image responses stream in (`graft-warc` MICRO_BATCH_READ) → REAL BMP
  * pixel decode + perceptual dHash per micro-batch (the m14 path) →
  * each batch anti-joins a PERSISTED seen-hash set and appends its
  * survivors — so later segments dedupe against both the pre-existing
  * corpus AND earlier admitted segments, byte-DIFFERENT re-encodes of
  * the same scene (the jitter regime) are caught by hash identity, and
  * the offset log gives exactly-once across a stream restart. "Don't
  * store the same image twice" at 100 TB is exactly this topology.
  */
class StreamingImageDedupeSpec extends AnyFunSuite with SparkSuite {

  // injective-lattice dims so per-doc jitter always changes bytes
  private val W = 12; private val H = 9

  /** A WARC image segment: (doc_id, scene, jitterSeed) triples. */
  private def writeSegment(dir: String, name: String,
      imgs: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val stagedir = Files.createTempDirectory("imgdedupe-seg").toString
    val httpHead = "HTTP/1.1 200 OK\r\nContent-Type: image/bmp\r\n\r\n"
    imgs.map { case (id, scene, js) =>
        (s"http://img.example/$id", "response", "2026-01-01T00:00:00Z",
          "application/http; msgtype=response",
          httpHead.getBytes("UTF-8") ++
            Multimodal.encodeBmp24Jittered(scene, js, W, H))
      }
      .toDF("url", "warc_type", "warc_date", "content_type", "content")
      .coalesce(1)
      .write.format("graft-warc").mode("append").save(stagedir)
    val part = new java.io.File(stagedir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    Files.copy(part.toPath, Paths.get(dir, name))
  }

  test("WARC image stream → dHash → persisted dedupe gate, exactly-once across restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("imgdedupe-in").toString
    val ckpt = Files.createTempDirectory("imgdedupe-ckpt").toString
    val admittedOut = Files.createTempDirectory("imgdedupe-adm").toString + "/adm"
    val idxPath = Files.createTempDirectory("imgdedupe-idx").toString + "/idx"

    // pre-existing corpus: scenes 0 and 1 already stored
    def hashOf(scene: Long) = {
      val (_, _, hi, lo) =
        Multimodal.decodeBmpDHash(Multimodal.encodeBmp24Jittered(scene, 0L, W, H))
      (hi, lo)
    }
    Seq(hashOf(0L), hashOf(1L)).toDF("h_hi", "h_lo")
      .write.mode("overwrite").parquet(idxPath)

    // seg 1: doc 1 re-encodes corpus scene 0 (byte-different, drop),
    // docs 2/3 novel scenes (admit)
    writeSegment(in, "seg-001.warc.gz",
      Seq((1L, 0L, 7L), (2L, 2L, 1L), (3L, 3L, 1L)))

    def start() = spark.readStream.format("graft-warc").load(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val imgs = batch.filter(col("warc_type") === "response")
          .select(
            regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("doc_id"),
            col("payload"))
        val hashed = Multimodal.decodeBmpDHashes(imgs, "doc_id", "payload")
        val seen = spark.read.parquet(idxPath)
        val fresh = hashed
          .join(seen, Seq("h_hi", "h_lo"), "left_anti")
          // within-batch re-encodes collapse to one admit per hash
          .groupBy("h_hi", "h_lo").agg(min(col("id")).as("doc_id"))
          .cache()
        fresh.select("doc_id").write.mode("append").parquet(admittedOut)
        fresh.select("h_hi", "h_lo").write.mode("append").parquet(idxPath)
        fresh.unpersist()
        ()
      }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // seg 2 arrives while the stream is DOWN: doc 4 re-encodes the
    // seg-1-ADMITTED scene 2 (only the index append catches it), doc 5
    // is novel, doc 6 re-encodes corpus scene 1
    writeSegment(in, "seg-002.warc.gz",
      Seq((4L, 2L, 9L), (5L, 4L, 1L), (6L, 1L, 9L)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val admitted = spark.read.parquet(admittedOut)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // exactly-once: seg-001 not re-processed on restart, and the
    // admitted set is precisely the novel scenes' first carriers
    assert(admitted.sorted == Seq(2L, 3L, 5L),
      s"admitted=$admitted — wrong dedupe/replay behavior")

    // a third segment re-encoding every admitted scene admits nothing
    writeSegment(in, "seg-003.warc.gz",
      Seq((7L, 2L, 13L), (8L, 3L, 13L), (9L, 4L, 13L)))
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    val after = spark.read.parquet(admittedOut)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(after.sorted == Seq(2L, 3L, 5L),
      s"seg-003 should admit nothing, got $after")
  }
}
