package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production ingest topology a 100 TB user actually runs, composed
  * end-to-end (§2.13 stretch): WARC archives arrive as segments →
  * `graft-warc` MICRO_BATCH_READ streams them → WET text extraction per
  * record → each micro-batch probes the PERSISTENT banded near-dup index
  * (d9) and appends its survivors — so later segments dedupe against
  * both the original corpus AND earlier admitted segments — with the
  * name-watermark offset log giving file-level exactly-once across a
  * stream restart. The individual seams are proven by StreamingWarcSpec
  * and StreamingDedupeSpec; this spec proves they COMPOSE: the text that
  * reaches the index is the WET-extracted text, the index state carries
  * across triggers and restarts, and nothing re-admits on recovery.
  */
class StreamingWarcDedupeSpec extends AnyFunSuite with SparkSuite {

  private val httpHead =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"

  /** Disjoint-vocabulary synthetic text per tag: identical tags give
    * jaccard 1.0, distinct tags sit far below any dedupe threshold. */
  private def mkText(tag: String): String =
    (0 until 80).map(j => s"$tag$j").mkString(" ")

  private def writeSegment(dir: String, name: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val stagedir = Files.createTempDirectory("warcdedupe-seg").toString
    docs.map { case (id, text) =>
        (s"http://w.example/$id", "response", "2026-01-01T00:00:00Z",
          "application/http; msgtype=response",
          (httpHead + s"<html><body><p>$text</p></body></html>").getBytes("UTF-8"))
      }
      .toDF("url", "warc_type", "warc_date", "content_type", "content")
      .coalesce(1)
      .write.format("graft-warc").mode("append").save(stagedir)
    val part = new java.io.File(stagedir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    Files.copy(part.toPath, Paths.get(dir, name))
  }

  /** The WET step of the pipeline: response records → (doc_id, text). */
  private def wetTexts(df: DataFrame): DataFrame =
    df.filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("doc_id"),
        graft.functions.GraftFunctions.htmlToText(col("payload").cast("string"))
          .as("text"))

  test("WARC stream → WET text → indexed incremental dedupe, exactly-once across restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("warcdedupe-in").toString
    val ckpt = Files.createTempDirectory("warcdedupe-ckpt").toString
    val admittedOut = Files.createTempDirectory("warcdedupe-adm").toString + "/adm"

    // persistent d9 index over the pre-existing corpus (tags qa, qb)
    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val idxPath = Files.createTempDirectory("warcdedupe-idx").toString
    val corpus = Seq((1000L, mkText("qa")), (1001L, mkText("qb")))
      .toDF("doc_id", "text")
    graft.ops.Dedupe.writeBandedIndex(corpus, "doc_id", "text",
      s"wdidx_$suffix", idxPath)

    // segment 1: doc 1 duplicates corpus qa (drop), docs 2/3 novel (admit)
    writeSegment(in, "seg-001.warc.gz",
      Seq((1L, mkText("qa")), (2L, mkText("rc")), (3L, mkText("rd"))))

    def start() = spark.readStream.format("graft-warc").load(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val texts = wetTexts(batch).cache()
        val dupIds = graft.ops.Dedupe.probeBandedIndex(
            spark, s"wdidx_$suffix", texts, "doc_id", "text", 0.8)
          .select("new_id").distinct()
          .collect().map(_.getLong(0)).toSet
        val survivors = texts.filter(!col("doc_id").isin(dupIds.toSeq: _*))
        graft.ops.Dedupe.appendToBandedIndex(
          survivors, "doc_id", "text", s"wdidx_$suffix")
        survivors.select("doc_id").write.mode("append").parquet(admittedOut)
        texts.unpersist()
        ()
      }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // segment 2 arrives while the stream is DOWN: doc 4 duplicates the
    // seg-1-ADMITTED doc 2 (only the index append can catch it), doc 6
    // duplicates the original corpus, doc 5 is novel
    writeSegment(in, "seg-002.warc.gz",
      Seq((4L, mkText("rc")), (5L, mkText("re")), (6L, mkText("qb"))))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val admitted = spark.read.parquet(admittedOut)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // exactly-once: seg-001 not re-processed on restart (3 rows total,
    // no duplicates), and the admitted set is precisely the novel docs
    assert(admitted.sorted == Seq(2L, 3L, 5L),
      s"admitted=$admitted — wrong dedupe/replay behavior")

    // and the index now holds corpus + all three admitted docs: a third
    // segment duplicating each of them admits nothing
    writeSegment(in, "seg-003.warc.gz",
      Seq((7L, mkText("rc")), (8L, mkText("rd")), (9L, mkText("re"))))
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    val after = spark.read.parquet(admittedOut)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(after.sorted == Seq(2L, 3L, 5L),
      s"seg-003 should admit nothing, got $after")
  }
}
