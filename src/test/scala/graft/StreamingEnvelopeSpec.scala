package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Content-Encoding envelope (§2.13 composition of s32 over
  * the MICRO_BATCH source): response records whose bodies are brotli
  * (the libbrotlidec-pinned assembled stream), gzip, or identity —
  * half of them chunked — arrive as `.warc.zst` segments with a
  * per-file trained DICTIONARY slot (s31's writer option), and the
  * stream side dechunks + CE-decodes each payload as it lands. Proves
  * the x23 decoder, the RFC 9110 coding chain, and the zstd dictionary
  * capture all run under the streaming source, across late segments. */
private object EnvelopeStream {
  def decode(headers: Map[String, String], payload: Array[Byte]): String = {
    val h = if (headers == null) Map.empty[String, String] else headers
    def field(name: String): String =
      h.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
        .map(_.trim).orNull
    val te = Option(field("Transfer-Encoding")).exists(_.equalsIgnoreCase("chunked"))
    val body =
      if (te) {
        val r = graft.core.Http.dechunkCounted(payload)
        if (r == null) null else r._1
      } else payload
    val d = graft.core.Http.decodeContentEncoding(field("Content-Encoding"), body)
    if (d == null) null else new String(d, "UTF-8")
  }
}

class StreamingEnvelopeSpec extends AnyFunSuite with SparkSuite {

  private def message(id: Long, ce: String, chunked: Boolean,
      body: Array[Byte]): Array[Byte] = {
    val wrapped =
      if (chunked) graft.core.Http.enchunk(body, 13, withExt = false, trailer = None)
      else body
    val head = new StringBuilder("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n")
    if (ce != null) head.append("Content-Encoding: ").append(ce).append("\r\n")
    if (chunked) head.append("Transfer-Encoding: chunked\r\n")
    else head.append("Content-Length: ").append(wrapped.length).append("\r\n")
    head.append("\r\n")
    head.toString.getBytes("ISO-8859-1") ++ wrapped
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }

  private def writeSegment(dir: String, name: String,
      rows: Seq[(String, Array[Byte])]): Unit = {
    import spark.implicits._
    val stage = Files.createTempDirectory("envseg").toString
    rows.map { case (url, content) =>
      (url, "response", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response", content)
    }.toDF("url", "warc_type", "warc_date", "content_type", "content")
      .coalesce(1)
      .write.format("graft-warc")
      .option("codec", "zstd").option("dictSamples", "4")
      .mode("append").save(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".warc.zst")).head
    Files.copy(part.toPath, Paths.get(dir, name))
  }

  test("zst+dict WARC stream → chunked + gzip/br/identity decode") {
    val in = Files.createTempDirectory("envin").toString
    val brExpected = graft.core.BrotliFixture.expectedText(7L, "en")
    writeSegment(in, "seg-001.warc.zst", Seq(
      "http://e.example/br" ->
        message(1, "br", chunked = false, graft.core.BrotliFixture.encode(7L, "en")),
      "http://e.example/gz-chunked" ->
        message(2, "gzip", chunked = true, gz("gzip body text".getBytes("UTF-8"))),
      "http://e.example/plain" ->
        message(3, null, chunked = false, "plain body".getBytes("UTF-8"))))

    val dec = udf(EnvelopeStream.decode _)
    val real = spark.readStream.format("graft-warc").load(in)
      .filter(col("warc_type") === "response")
      .select(col("url"), dec(col("http_headers"), col("payload")).as("text"))
    val q = real.writeStream.format("memory").queryName("envelope_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("envelope_stream").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(r1 == Map(
        "http://e.example/br" -> brExpected,
        "http://e.example/gz-chunked" -> "gzip body text",
        "http://e.example/plain" -> "plain body"))

      // a late segment with a chunked brotli body decodes incrementally
      writeSegment(in, "seg-002.warc.zst", Seq(
        "http://e.example/br-chunked" ->
          message(4, "br", chunked = true, graft.core.BrotliFixture.encode(9L, "de"))))
      q.processAllAvailable()
      val r2 = spark.table("envelope_stream").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(r2.size == 4)
      assert(r2("http://e.example/br-chunked") ==
        graft.core.BrotliFixture.expectedText(9L, "de"))
    } finally q.stop()
  }
}
