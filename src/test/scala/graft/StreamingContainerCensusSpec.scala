package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ico, Mp3, Zip}

/** Streaming container census over a `.warc.zst` archive stream
  * (§2.13 composition): zstd-member WARC segments arrive → the
  * graft-warc MICRO_BATCH reader streams them through [[ZstdMembers]]
  * → each record's payload is routed by magic bytes to the matching
  * census kernel (ZIP / MP3 / ICO) → per-record census rows accumulate
  * in append mode, with the zip-bomb ratio flag surfacing on a
  * high-ratio archive in a later segment. Proves the zstd member layer
  * works under the streaming source (not just batch), and that the
  * census kernels run as stream-side row functions. */
/** Stream-side dispatch lives in a top-level object so the UDF closure
  * stays serializable (no test-class capture). */
private object ContainerCensus {
  /** Magic-byte dispatch + census: (kind, detail, ratio_ppm). */
  def census(b: Array[Byte]): (String, String, Long) = {
    if (b == null || b.length < 4) ("unknown", null, -1L)
    else if (b(0) == 'P' && b(1) == 'K') {
      val m = Zip.zipMeta(b)
      if (m == null) ("zip-corrupt", null, -1L)
      else (m.kind, s"${m.nEntries}", m.maxRatioPpm)
    } else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val m = Mp3.mp3Meta(b)
      if (m == null) ("mp3-corrupt", null, -1L)
      else ("mp3", s"${m.durationMs}", -1L)
    } else if ((b(0) & 0xff) == 0 && (b(1) & 0xff) == 0 && b(2) == 1) {
      val m = Ico.icoStats(b)
      if (m == null) ("ico-corrupt", null, -1L)
      else ("ico", s"${m.nImages}", -1L)
    } else ("unknown", null, -1L)
  }
}

class StreamingContainerCensusSpec extends AnyFunSuite with SparkSuite {

  private def record(id: Long, payload: Array[Byte]): (String, String, String, String, Array[Byte]) =
    (s"http://c.example/$id", "resource", "2026-01-01T00:00:00Z",
      "application/octet-stream", payload)

  private def writeSegment(dir: String, name: String,
      docs: Seq[(String, String, String, String, Array[Byte])]): Unit = {
    import spark.implicits._
    val stage = Files.createTempDirectory("ccseg").toString
    docs.toDF("url", "warc_type", "warc_date", "content_type", "content")
      .coalesce(1)
      .write.format("graft-warc").option("codec", "zstd").mode("append").save(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".warc.zst")).head
    Files.copy(part.toPath, Paths.get(dir, name))
  }

  test("zst WARC stream → per-record container census across segments") {
    import spark.implicits._
    val in = Files.createTempDirectory("ccin").toString
    writeSegment(in, "seg-001.warc.zst", Seq(
      record(1L, Zip.encodeZip(1L, "en")), // k=1 → epub marker
      record(2L, Mp3.encodeMp3(2L, "en", 42L)),
      record(3L, Ico.encodeIco(3L))))

    val censusUdf = udf(ContainerCensus.census _)
    val stream = spark.readStream.format("graft-warc").load(in)
      .filter(col("warc_type") === "resource")
      .select(col("url"),
        censusUdf(col("payload")).as("c"))
      .select(col("url"), col("c._1").as("kind"), col("c._2").as("detail"),
        col("c._3").as("ratio_ppm"))
    val q = stream.writeStream.format("memory").queryName("container_census")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("container_census").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(r1 == Map(
        "http://c.example/1" -> "epub",
        "http://c.example/2" -> "mp3",
        "http://c.example/3" -> "ico"))

      // segment 2: an OOXML-marked zip plus a deflate bomb-ish archive
      val bomb = {
        val bos = new java.io.ByteArrayOutputStream()
        val z = new java.util.zip.ZipOutputStream(bos)
        z.putNextEntry(new java.util.zip.ZipEntry("a.txt"))
        z.write(("x" * 200000).getBytes("UTF-8"))
        z.closeEntry(); z.close()
        bos.toByteArray
      }
      writeSegment(in, "seg-002.warc.zst", Seq(
        record(3L * 251, Zip.encodeZip(3L * 251, "en")), // k=0 → ooxml
        record(99L, bomb)))
      q.processAllAvailable()
      val rows = spark.table("container_census").collect()
      assert(rows.length == 5)
      val byUrl = rows.map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(3)))).toMap
      assert(byUrl(s"http://c.example/${3 * 251}")._1 == "ooxml")
      val (bk, bratio) = byUrl("http://c.example/99")
      assert(bk == "zip")
      assert(bratio > 100L * 1000000L,
        s"200k of 'x' must deflate >100x, got $bratio ppm")
    } finally q.stop()
  }
}
