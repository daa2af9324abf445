package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Flac, Multimodal}

/** The audio ingest gate composed end-to-end — the
  * [[StreamingImageDedupeSpec]] topology with the m25 CROSS-FORMAT
  * twist the image gate cannot express: WARC segments of audio
  * responses stream in (`graft-warc` MICRO_BATCH_READ) → format-
  * dispatched REAL decode (WAV and FLAC) + lattice fingerprint per
  * micro-batch → each batch anti-joins a PERSISTED seen-fp set and
  * appends its survivors. Because the fingerprint is computed over
  * decoded PCM, a FLAC re-encode of a WAV-admitted recording (byte-
  * unrelated files, different containers) is caught by fp identity —
  * "don't store the same recording twice, in any container" at
  * 100 TB is exactly this topology. Offset log gives exactly-once
  * across a stream restart.
  */
class StreamingAudioDedupeSpec extends AnyFunSuite with SparkSuite {

  private def sceneN(scene: Long): Int = (scene % 40 + 80).toInt

  private def audioBytes(scene: Long, docSeed: Long, flac: Boolean): Array[Byte] =
    if (flac)
      Flac.encodeFlacPcmMono(Multimodal.audioScenePcm(scene, docSeed, sceneN(scene)))
    else Multimodal.encodeWavScene(scene, docSeed, sceneN(scene))

  /** A WARC audio segment: (doc_id, scene, jitterSeed, isFlac). */
  private def writeSegment(dir: String, name: String,
      clips: Seq[(Long, Long, Long, Boolean)]): Unit = {
    import spark.implicits._
    val stagedir = Files.createTempDirectory("auddedupe-seg").toString
    clips.map { case (id, scene, js, flac) =>
        val mime = if (flac) "audio/flac" else "audio/wav"
        val httpHead = s"HTTP/1.1 200 OK\r\nContent-Type: $mime\r\n\r\n"
        (s"http://audio.example/$id", "response", "2026-01-01T00:00:00Z",
          "application/http; msgtype=response",
          httpHead.getBytes("UTF-8") ++ audioBytes(scene, js, flac))
      }
      .toDF("url", "warc_type", "warc_date", "content_type", "content")
      .coalesce(1)
      .write.format("graft-warc").mode("append").save(stagedir)
    val part = new java.io.File(stagedir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    Files.copy(part.toPath, Paths.get(dir, name))
  }

  test("WARC audio stream → cross-format fp → persisted dedupe gate, " +
      "exactly-once across restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("auddedupe-in").toString
    val ckpt = Files.createTempDirectory("auddedupe-ckpt").toString
    val admittedOut = Files.createTempDirectory("auddedupe-adm").toString + "/adm"
    val idxPath = Files.createTempDirectory("auddedupe-idx").toString + "/idx"

    // pre-existing corpus: scenes 0 (stored as WAV) and 1 (as FLAC)
    def fpOf(scene: Long, flac: Boolean): Long = {
      val pcm =
        if (flac) Flac.decodeFlacPcm(audioBytes(scene, 0L, flac = true))(0)
        else Multimodal.decodeWavPcm16(audioBytes(scene, 0L, flac = false))
      Multimodal.audioLatticeFp(pcm)
    }
    Seq(fpOf(0L, flac = false), fpOf(1L, flac = true)).toDF("fp")
      .write.mode("overwrite").parquet(idxPath)

    // seg 1: doc 1 is a FLAC re-encode of the WAV-stored corpus scene 0
    // (cross-format, byte-unrelated → drop); docs 2 (WAV) and 3 (FLAC)
    // carry novel scenes (admit)
    writeSegment(in, "seg-001.warc.gz",
      Seq((1L, 0L, 7L, true), (2L, 2L, 1L, false), (3L, 3L, 1L, true)))

    def start() = spark.readStream.format("graft-warc").load(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val clips = batch.filter(col("warc_type") === "response")
          .select(
            regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("doc_id"),
            col("payload"))
        val fps = Multimodal.decodeAudioFps(clips, "doc_id", "payload")
        val seen = spark.read.parquet(idxPath)
        val fresh = fps
          .join(seen, Seq("fp"), "left_anti")
          // within-batch re-encodes collapse to one admit per fp
          .groupBy("fp").agg(min(col("id")).as("doc_id"))
          .cache()
        fresh.select("doc_id").write.mode("append").parquet(admittedOut)
        fresh.select("fp").write.mode("append").parquet(idxPath)
        fresh.unpersist()
        ()
      }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // seg 2 arrives while the stream is DOWN: doc 4 is a WAV re-encode
    // of the FLAC-ADMITTED scene 3 (only the index append catches it),
    // doc 5 is novel, doc 6 re-encodes corpus scene 1 in the OTHER
    // container
    writeSegment(in, "seg-002.warc.gz",
      Seq((4L, 3L, 9L, false), (5L, 4L, 1L, true), (6L, 1L, 9L, false)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val admitted = spark.read.parquet(admittedOut)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // exactly-once: seg-001 not re-processed on restart, and the
    // admitted set is precisely the novel scenes' first carriers
    assert(admitted.sorted == Seq(2L, 3L, 5L),
      s"admitted=$admitted — wrong dedupe/replay behavior")

    // a third segment re-encoding every admitted scene — each in the
    // container the admit did NOT use — admits nothing
    writeSegment(in, "seg-003.warc.gz",
      Seq((7L, 2L, 13L, true), (8L, 3L, 13L, false), (9L, 4L, 13L, false)))
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    val after = spark.read.parquet(admittedOut)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(after.sorted == Seq(2L, 3L, 5L),
      s"seg-003 should admit nothing, got $after")
  }
}
