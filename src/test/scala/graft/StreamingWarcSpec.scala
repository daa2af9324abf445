package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.13 streaming form of the WET derivation (s11): WARC archives
  * arrive as segments, the stream extracts text from each response
  * record and appends WARC `conversion` records — the incremental
  * sidecar build the corpus runs on every crawl cycle. The name-
  * watermark offset log gives file-level exactly-once: micro-batch
  * boundaries and stream restarts must not duplicate or drop records
  * versus the one-shot batch conversion. */
class StreamingWarcSpec extends AnyFunSuite with SparkSuite {

  private def writeSegment(dir: String, name: String, ids: Range): Unit = {
    import spark.implicits._
    val httpHead = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"
    val stagedir = Files.createTempDirectory("warc-seg").toString
    ids.map(i => (s"http://w.example/$i", "response", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        (httpHead + s"<html><body><p>doc $i text</p></body></html>").getBytes("UTF-8")))
      .toDF("url", "warc_type", "warc_date", "content_type", "content")
      .coalesce(1)
      .write.format("graft-warc").mode("append").save(stagedir)
    // one archive per segment, arriving with a monotonic name
    val part = new java.io.File(stagedir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    Files.copy(part.toPath, Paths.get(dir, name))
  }

  private def wetBatch(batch: DataFrame, out: String): Unit =
    batch
      .filter(col("warc_type") === "response")
      .select(col("url"),
        lit("conversion").as("warc_type"),
        col("warc_date"),
        lit("text/plain").as("content_type"),
        graft.functions.GraftFunctions.htmlToText(col("payload").cast("string"))
          .cast("binary").as("content"))
      .write.format("graft-warc").mode("append").save(out)

  private def wetRows(out: String): Set[(String, String)] =
    spark.read.format("graft-warc").load(out)
      .filter(col("warc_type") === "conversion")
      .select("url", "payload").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
      .toSet

  test("streamed WET conversion: incremental segments, exactly-once across restart") {
    val in = Files.createTempDirectory("warcstream-in").toString
    val out = Files.createTempDirectory("warcstream-out").toString
    val ckpt = Files.createTempDirectory("warcstream-ckpt").toString
    writeSegment(in, "seg-001.warc.gz", 0 until 5)

    def start() = spark.readStream.format("graft-warc").load(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) => wetBatch(batch, out) }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    // second segment arrives while the stream runs
    writeSegment(in, "seg-002.warc.gz", 5 until 9)
    q1.processAllAvailable()
    q1.stop()
    assert(wetRows(out).map(_._1) == (0 until 9).map(i => s"http://w.example/$i").toSet)

    // third segment arrives while the stream is DOWN; restart from the
    // checkpoint must convert only it — no re-emission of seg-001/2
    writeSegment(in, "seg-003.warc.gz", 9 until 12)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val rows = wetRows(out)
    assert(rows.size == 12, s"expected 12 unique records, got ${rows.size}")
    assert(rows.map(_._1) == (0 until 12).map(i => s"http://w.example/$i").toSet)
    assert(rows.forall { case (url, text) =>
      text == s"doc ${url.split("/").last} text" })
  }
}
