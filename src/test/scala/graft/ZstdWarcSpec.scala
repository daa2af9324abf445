package graft

import java.nio.file.{Files, Paths}

import com.github.luben.zstd.Zstd
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZstdMembers
import graft.sources.v2.WarcRecords

/** `.warc.zst` member layer: golden fixtures are built with zstd-jni's
  * one-shot compressor (spec-independent of our writer), so the reader's
  * frame-boundary walk (RFC 8878 block headers, no decompression) and
  * the writer are each tested against the format, not against each
  * other. Covers skippable frames, mixed-codec directories, the seekable
  * point fetch, write→read round trip, streaming, and corruption. */
class ZstdWarcSpec extends AnyFunSuite with SparkSuite {

  private def record(wtype: String, url: String, block: Array[Byte],
      ctype: String = "application/http; msgtype=response"): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0\r\n")
    head.append("WARC-Type: ").append(wtype).append("\r\n")
    if (url != null) head.append("WARC-Target-URI: ").append(url).append("\r\n")
    head.append("WARC-Date: 2026-01-02T03:04:05Z\r\n")
    head.append("WARC-Record-ID: <urn:uuid:0000-").append(url).append(">\r\n")
    if (ctype != null) head.append("Content-Type: ").append(ctype).append("\r\n")
    head.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    head.toString.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def httpBlock(status: Int, mime: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $mime; charset=UTF-8\r\n\r\n$body")
      .getBytes("UTF-8")

  /** One self-contained zstd frame (level 3, no dictionary). */
  private def frame(payload: Array[Byte]): Array[Byte] =
    Zstd.compress(payload, 3)

  /** RFC 8878 §9.2 skippable frame — the warc-zstd dictionary slot. */
  private def skippable(content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x5e); out.write(0x2a); out.write(0x4d); out.write(0x18)
    val n = content.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    out.write(content)
    out.toByteArray
  }

  test("ZstdMembers walks frame boundaries without decompressing") {
    val recs = Seq("alpha", "beta", "a much longer third record " * 50)
      .map(_.getBytes("UTF-8"))
    val bytes = skippable("dict-slot".getBytes("UTF-8")) ++
      recs.map(frame).reduce(_ ++ _)
    val ms = new ZstdMembers(new java.io.ByteArrayInputStream(bytes))
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    val got = Iterator.continually(ms.nextMember()).takeWhile(_ != null)
      .map { in =>
        offsets += ms.memberOffset
        val all = in.readAllBytes(); in.close(); new String(all, "UTF-8")
      }.toSeq
    assert(got == recs.map(new String(_, "UTF-8")))
    // offsets are the compressed-stream frame starts: first record frame
    // sits right after the skippable frame, and each offset re-seeks
    assert(offsets.head == 8 + "dict-slot".length)
    offsets.zip(recs).foreach { case (off, want) =>
      val seek = new ZstdMembers(new java.io.ByteArrayInputStream(
        bytes.drop(off.toInt)))
      val in = seek.nextMember()
      assert(java.util.Arrays.equals(in.readAllBytes(), want))
    }
  }

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("warczst").toString
    val zst =
      skippable(Array.fill(16)(0.toByte)) ++
      frame(record("warcinfo", null, "software: fixture\r\n".getBytes("UTF-8"),
        ctype = "application/warc-fields")) ++
      frame(record("response", "http://z.example/a",
        httpBlock(200, "text/html", "<html>zeta</html>"))) ++
      frame(record("response", "http://z.example/b",
        httpBlock(404, "text/plain", "gone")))
    Files.write(Paths.get(dir, "seg-00001.warc.zst"), zst)
    dir
  }

  test("reads spec-shaped .warc.zst archives with HTTP split and pushdown") {
    val rows = spark.read.format("graft-warc").load(fixtureDir)
      .filter(col("warc_type") === "response")
      .select("url", "http_status", "mime_type", "payload")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8")))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("http://z.example/a", 200, "text/html", "<html>zeta</html>"),
      ("http://z.example/b", 404, "text/plain", "gone")))
  }

  test("point fetch: seek a zstd member offset, codec sniffed from magic") {
    val bytes = Files.readAllBytes(Paths.get(fixtureDir, "seg-00001.warc.zst"))
    val offs = spark.read.format("graft-warc").load(fixtureDir)
      .filter(col("warc_type") === "response")
      .select("url", "offset").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (hdrs, _) = WarcRecords.fetchRecordAt(bytes, offs("http://z.example/a"))
    assert(hdrs("warc-target-uri") == "http://z.example/a")
    assert(new String(WarcRecords.fetchPayloadAt(bytes,
      offs("http://z.example/a")), "UTF-8") == "<html>zeta</html>")
  }

  test("write codec=zstd → read round trip; mixed-codec dir reads whole") {
    val dir = Files.createTempDirectory("warczstw").toString
    import spark.implicits._
    val df = Seq(
      ("http://w.example/1", "one payload"),
      ("http://w.example/2", "two payload"))
      .toDF("url", "body")
      .select(col("url"),
        lit("response").as("warc_type"),
        lit("2026-01-02T03:04:05Z").as("warc_date"),
        lit("application/http; msgtype=response").as("content_type"),
        concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n")
          .cast("binary"), col("body").cast("binary")).as("content"))
    df.write.format("graft-warc").option("codec", "zstd").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".warc.zst"))
    assert(files.nonEmpty, "writer produced no .warc.zst files")
    val back = spark.read.format("graft-warc").load(dir)
      .filter(col("warc_type") === "response")
      .select("url", "payload").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    assert(back == Map("http://w.example/1" -> "one payload",
      "http://w.example/2" -> "two payload"))
    // a gzip archive landing in the same directory reads through the
    // same default glob
    df.limit(1).select(col("url"), col("warc_type"), col("warc_date"),
        col("content_type"), col("content"))
      .write.format("graft-warc").mode("append").save(dir)
    val all = spark.read.format("graft-warc").load(dir)
      .filter(col("warc_type") === "response").count()
    assert(all == 3)
  }

  test("micro-batch stream picks up newly arrived zst segments") {
    val dir = Files.createTempDirectory("warczsts").toString
    Files.write(Paths.get(dir, "seg-001.warc.zst"), frame(
      record("response", "http://zs.example/1", httpBlock(200, "text/html", "one"))))
    val stream = spark.readStream.format("graft-warc").load(dir).select("url")
    val q = stream.writeStream.format("memory").queryName("warc_zst_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_zst_stream").count() == 1)
      Files.write(Paths.get(dir, "seg-002.warc.zst"), frame(
        record("response", "http://zs.example/2", httpBlock(200, "text/html", "two"))))
      q.processAllAvailable()
      assert(spark.table("warc_zst_stream").collect().map(_.getString(0))
        .sorted.toSeq == Seq("http://zs.example/1", "http://zs.example/2"))
    } finally q.stop()
  }

  test("dictionary slot: trained write → dict-frame capture → decode") {
    import com.github.luben.zstd.{ZstdDictTrainer, ZstdOutputStream}
    // 1) hand-built fixture: train a dictionary, emit the 0x184D2A5D
    //    skippable frame + dict-compressed members (spec-independent of
    //    our writer)
    val bodies = (0 until 40).map(i =>
      record("response", s"http://d.example/$i",
        httpBlock(200, "text/plain", s"shared boilerplate prefix doc $i " +
          "lorem ipsum dolor sit amet " * 3)))
    val trainer = new ZstdDictTrainer(1 << 20, 4 << 10)
    bodies.foreach(trainer.addSample)
    val dict = trainer.trainSamples()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x5d, 0x2a, 0x4d, 0x18))
    out.write(dict.length & 0xff); out.write((dict.length >> 8) & 0xff)
    out.write((dict.length >> 16) & 0xff); out.write((dict.length >> 24) & 0xff)
    out.write(dict)
    bodies.foreach { b =>
      // compress each record as its own frame with the dictionary
      val bos = new java.io.ByteArrayOutputStream()
      val z = new ZstdOutputStream(bos, 3); z.setDict(dict); z.write(b); z.close()
      out.write(bos.toByteArray)
    }
    val ms = new ZstdMembers(new java.io.ByteArrayInputStream(out.toByteArray))
    var got = 0
    var in = ms.nextMember()
    while (in != null) {
      val bytes = in.readAllBytes()
      assert(new String(bytes, "UTF-8").contains(s"http://d.example/$got"))
      got += 1
      in = ms.nextMember()
    }
    assert(got == 40)
    // frames really carry the dictionary id (dictIdLen > 0 in the FHD)
    assert((out.toByteArray()(8 + dict.length + 4) & 3) != 0)

    // 2) a dict frame WITHOUT a preceding dictionary still rejects
    val headless = out.toByteArray.drop(8 + dict.length)
    val ms2 = new ZstdMembers(new java.io.ByteArrayInputStream(headless))
    assertThrows[java.io.IOException](ms2.nextMember())

    // 3) embedded-vs-frame dictionary ID mismatch rejects
    val wrongDict = out.toByteArray.clone()
    wrongDict(8 + 4) = (wrongDict(8 + 4) ^ 0x55).toByte // flip dict's own ID
    val ms3 = new ZstdMembers(new java.io.ByteArrayInputStream(wrongDict))
    assertThrows[java.io.IOException](ms3.nextMember())
  }

  test("dictionary slot: zstd-compressed dictionary content inflates") {
    import com.github.luben.zstd.{Zstd, ZstdDictTrainer, ZstdOutputStream}
    val bodies = (0 until 40).map(i =>
      record("response", s"http://z.example/$i",
        httpBlock(200, "text/plain", s"zcompressed dict case doc $i " +
          "the quick brown fox " * 4)))
    val trainer = new ZstdDictTrainer(1 << 20, 4 << 10)
    bodies.foreach(trainer.addSample)
    val dict = trainer.trainSamples()
    val zdict = Zstd.compress(dict, 3) // the slot may carry a zstd frame
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x5d, 0x2a, 0x4d, 0x18))
    out.write(zdict.length & 0xff); out.write((zdict.length >> 8) & 0xff)
    out.write((zdict.length >> 16) & 0xff); out.write((zdict.length >> 24) & 0xff)
    out.write(zdict)
    bodies.take(3).foreach { b =>
      val bos = new java.io.ByteArrayOutputStream()
      val z = new ZstdOutputStream(bos, 3); z.setDict(dict); z.write(b); z.close()
      out.write(bos.toByteArray)
    }
    val ms = new ZstdMembers(new java.io.ByteArrayInputStream(out.toByteArray))
    var got = 0
    var in = ms.nextMember()
    while (in != null) { in.readAllBytes(); got += 1; in = ms.nextMember() }
    assert(got == 3)
  }

  test("writer dictSamples: per-file dictionary round-trips through the source") {
    val dir = Files.createTempDirectory("warczstdict").toString
    val n = 60
    val df = spark.range(0, n).selectExpr(
      "concat('http://dict.example/p', id) AS url",
      "'response' AS warc_type",
      "'2026-01-02T03:04:05Z' AS warc_date",
      "'application/http; msgtype=response' AS content_type",
      """cast(concat('HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n',
         'common page chrome header footer nav ', id) AS BINARY) AS content""")
      .coalesce(1)
    df.write.format("graft-warc")
      .option("codec", "zstd").option("dictSamples", "8")
      .mode("append").save(dir)
    // the archive really carries a dictionary skippable frame
    val f = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.zst"))
    assert(f.length == 1)
    val head = Files.readAllBytes(Paths.get(f.head)).take(4)
    assert(head.toSeq == Seq[Byte](0x5d, 0x2a, 0x4d, 0x18))
    val back = spark.read.format("graft-warc").load(dir)
      .filter(col("warc_type") === "response")
      .selectExpr("url", "cast(payload AS STRING) AS p").collect()
    assert(back.length == n)
    assert(back.forall(r => r.getString(1).endsWith(
      r.getString(0).stripPrefix("http://dict.example/p"))))
  }

  test("point fetch on a dictionary archive: head slot captured and applied") {
    // the ADVICE r17 gap: fetchRecordAt built a bare ZstdInputStream, so
    // dictSamples archives (frames carrying a Dictionary_ID) threw on
    // the content-serving point path
    val dir = Files.createTempDirectory("warczstpf").toString
    val n = 60
    spark.range(0, n).selectExpr(
      "concat('http://pf.example/p', id) AS url",
      "'response' AS warc_type",
      "'2026-01-02T03:04:05Z' AS warc_date",
      "'application/http; msgtype=response' AS content_type",
      """cast(concat('HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n',
         'common page chrome header footer nav ', id) AS BINARY) AS content""")
      .coalesce(1)
      .write.format("graft-warc")
      .option("codec", "zstd").option("dictSamples", "8")
      .mode("append").save(dir)
    val f = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.zst")).head
    val bytes = Files.readAllBytes(Paths.get(f))
    // the archive head really carries the dictionary slot
    assert(graft.sources.ZstdMembers.dictAtHead(bytes) != null)
    val offs = spark.read.format("graft-warc").load(dir)
      .filter(col("warc_type") === "response")
      .select("url", "offset").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a record past the sample window decodes against the head dict
    val (hdrs, _) = WarcRecords.fetchRecordAt(bytes, offs("http://pf.example/p42"))
    assert(hdrs("warc-target-uri") == "http://pf.example/p42")
    assert(new String(WarcRecords.fetchPayloadAt(bytes,
      offs("http://pf.example/p42")), "UTF-8").endsWith("nav 42"))
    // the stream variant (the /fetch endpoint's positioned-read path)
    val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val in = hfs.open(new org.apache.hadoop.fs.Path(f))
    try {
      val dict = graft.sources.ZstdMembers.dictAtHead(in)
      assert(dict != null)
      in.seek(offs("http://pf.example/p17"))
      val (payload, mime) = WarcRecords.fetchPayload(in, dict)
      assert(mime.startsWith("text/plain"))
      assert(new String(payload, "UTF-8").endsWith("nav 17"))
    } finally in.close()
    // a gzip archive head scan is a cheap no-op (no dict slot)
    assert(graft.sources.ZstdMembers.dictAtHead(
      Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)) == null)
  }

  test("head scan steps over a large benign skippable frame before the dict slot") {
    // the ADVICE r18 gap: the dict-size budget was applied to EVERY
    // skippable frame in the head, so a big non-dict frame (legal zstd)
    // aborted the scan and silently dropped the dictionary
    def le32(n: Int): Array[Byte] =
      Array(n, n >> 8, n >> 16, n >> 24).map(_.toByte)
    val rawDict = Array.tabulate(16)(i => (i * 7).toByte)
    val big = new Array[Byte]((8 << 20) + 5) // over MaxDictBytes
    val head =
      le32(0x184d2a50) ++ le32(big.length) ++ big ++ // benign skippable
      le32(0x184d2a5d) ++ le32(rawDict.length) ++ rawDict
    assert(graft.sources.ZstdMembers.dictAtHead(head).toSeq == rawDict.toSeq)
    // positioned-stream form behaves identically
    val dir = Files.createTempDirectory("zstskip")
    val f = dir.resolve("skip.warc.zst")
    Files.write(f, head)
    val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val in = hfs.open(new org.apache.hadoop.fs.Path(f.toString))
    try assert(graft.sources.ZstdMembers.dictAtHead(in).toSeq == rawDict.toSeq)
    finally in.close()
    // the budget still rejects an oversized DICT frame itself
    val badDict =
      le32(0x184d2a5d) ++ le32(big.length) ++ big
    assert(graft.sources.ZstdMembers.dictAtHead(badDict) == null)
  }

  test("corruption: truncation and dictionary frames reject under budget") {
    val good = frame(record("response", "http://c.example/",
      httpBlock(200, "text/html", "x" * 5000)))
    // truncated frame: strict throws, ignoreCorruptFiles skips remainder
    val dir = Files.createTempDirectory("warczstc").toString
    Files.write(Paths.get(dir, "good.warc.zst"), good)
    Files.write(Paths.get(dir, "trunc.warc.zst"), good.take(good.length / 2))
    val strict = spark.read.format("graft-warc").load(dir).select("url")
    assertThrows[org.apache.spark.SparkException](strict.collect())
    val lax = spark.read.format("graft-warc")
      .option("ignoreCorruptFiles", "true").load(dir).select("url")
    assert(lax.collect().map(_.getString(0)).toSeq == Seq("http://c.example/"))
    // a dictionary-id frame is rejected (unsupported), not mis-parsed
    val dictFrame = good.clone()
    dictFrame(4) = (dictFrame(4) | 1).toByte // Dictionary_ID_flag = 1
    val ms = new ZstdMembers(new java.io.ByteArrayInputStream(dictFrame))
    assertThrows[java.io.IOException](ms.nextMember())
    // declared-size abuse: a skippable frame claiming 2 GiB hits the
    // budget instead of allocating
    val abusive = Array[Byte](0x50, 0x2a, 0x4d, 0x18,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    val ms2 = new ZstdMembers(new java.io.ByteArrayInputStream(abusive))
    assertThrows[java.io.IOException](ms2.nextMember())
    // random byte flips never hang or over-allocate (throw or parse)
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 200) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      val m = new ZstdMembers(new java.io.ByteArrayInputStream(mut))
      try {
        var in = m.nextMember()
        while (in != null) { in.readAllBytes(); in.close(); in = m.nextMember() }
      } catch { case _: java.io.IOException => () }
    }
  }
}
