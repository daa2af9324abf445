package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Hashing, RabinFingerprint}
import graft.functions.{GraftFunctions, NativeFns}

/** The codegen'd native expressions must agree exactly with the core
  * library (which is itself parity-tested against reference constants),
  * both in interpreted eval and inside generated code. */
class NativeExpressionsSpec extends AnyFunSuite with SparkSuite {

  test("native rabin/simhash/band_keys expressions match the core library") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "The quick brown fox", "ümlaut-ø")
    val df = texts.toDF("t")
      .select(
        col("t"),
        GraftFunctions.rabinFp64(col("t")).as("fp"),
        GraftFunctions.simhash64(col("t")).as("sh"),
        GraftFunctions.bandKeys(GraftFunctions.simhash64(col("t"))).as("bk"))
    val rows = df.collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == RabinFingerprint.std64.fp(t))
      assert(r.getLong(2) == Hashing.simhash64(t))
      assert(r.getAs[scala.collection.Seq[Long]](3) == Hashing.bandKeys(Hashing.simhash64(t)).toSeq)
    }
  }

  test("native shingles3 == built-in formulation on real texts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val both = docs.select(
      graft.ops.Dedupe.shingles3(col("text")).as("nat"),
      graft.ops.Dedupe.shingles3Builtin(col("text")).as("ref"))
    assert(both.filter(col("nat") =!= col("ref")).count() == 0)
    // short/degenerate inputs
    import spark.implicits._
    val edge = Seq("", "ab", "abc", "aaaa", "日本語です").toDF("t")
      .select(graft.ops.Dedupe.shingles3(col("t")).as("nat"),
        graft.ops.Dedupe.shingles3Builtin(col("t")).as("ref"))
    assert(edge.filter(col("nat") =!= col("ref")).count() == 0)
  }

  test("native doc fingerprint == built-in formulation on real and edge texts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val both = docs.select(
      graft.ops.TextAnalysis.docFingerprint(col("text")).as("nat"),
      graft.ops.TextAnalysis.docFingerprintBuiltin(col("text")).as("ref"))
    assert(both.filter(col("nat") =!= col("ref")).count() == 0)
    import spark.implicits._
    // fewer shingles than k, exactly k, duplicates-only, multi-byte
    val edge = Seq("", "ab", "abc", "abcd", "aaaa", "日本語です", "abcabcabc")
      .toDF("t")
      .select(graft.ops.TextAnalysis.docFingerprint(col("t")).as("nat"),
        graft.ops.TextAnalysis.docFingerprintBuiltin(col("t")).as("ref"))
    assert(edge.filter(col("nat") =!= col("ref")).count() == 0)
  }

  test("native shingle hashes == built-in formulation on real texts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.ops.Dedupe.shingles3(col("text")).as("sh"))
    Seq("1", "2").foreach { tag =>
      val both = docs.select(
        graft.ops.Dedupe.shingleHash40(col("sh"), tag).as("nat"),
        graft.ops.Dedupe.shingleHash40Builtin(col("sh"), tag).as("ref"))
      assert(both.filter(col("nat") =!= col("ref")).count() == 0, s"tag $tag")
    }
    // the 60-bit simhash base hashes ride the same one-pass machinery
    val both60 = docs.select(
      graft.ops.Dedupe.shingleHashes60(col("sh")).as("nat"),
      graft.ops.Dedupe.shingleHashes60Builtin(col("sh")).as("ref"))
    assert(both60.filter(col("nat") =!= col("ref")).count() == 0)
    // empty array and multi-byte shingles
    import spark.implicits._
    val edge = Seq("", "日本語です").toDF("t")
      .select(graft.ops.Dedupe.shingles3(col("t")).as("sh"))
      .select(graft.ops.Dedupe.shingleHash40(col("sh"), "1").as("nat40"),
        graft.ops.Dedupe.shingleHash40Builtin(col("sh"), "1").as("ref40"),
        graft.ops.Dedupe.shingleHashes60(col("sh")).as("nat60"),
        graft.ops.Dedupe.shingleHashes60Builtin(col("sh")).as("ref60"))
    assert(edge.filter(col("nat40") =!= col("ref40") ||
      col("nat60") =!= col("ref60")).count() == 0)
  }

  test("native marker counts == per-word filter counts on real texts") {
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val (ref, _) = TextAnalysis.langIdFromTokens(col("toks"))
    val (nat, _) = TextAnalysis.langIdFromCounts(col("cnt"))
    val both = docs
      .withColumn("cnt", TextAnalysis.langMarkerCounts(col("toks")))
      .select(
        ref.map { case (l, c) => c.cast("long").as(s"ref_$l") } ++
          nat.map { case (l, c) => c.cast("long").as(s"nat_$l") }: _*)
    TextAnalysis.LangMarkers.map(_._1).foreach { l =>
      assert(both.filter(col(s"ref_$l") =!= col(s"nat_$l")).count() == 0,
        s"marker counts diverge for $l")
    }
    // shared marker words must count into EVERY containing group ("la"
    // marks both fr and es)
    import spark.implicits._
    val la = Seq(Seq("la", "la", "x")).toDF("toks")
      .select(TextAnalysis.langMarkerCounts(col("toks")).as("cnt"))
      .select(TextAnalysis.langIdFromCounts(col("cnt"))._1.map {
        case (l, c) => c.as(l) }: _*)
      .collect().head
    assert(la.getAs[Long]("fr") == 2L && la.getAs[Long]("es") == 2L)
  }

  test("native jaccard3 and minhash signature == built-in formulations") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = graft.ops.Dedupe.docShingles(docs, "doc_id", "text").localCheckpoint(true)
    // jaccard over all close pairs of consecutive doc ids
    val a = sh.withColumnRenamed("doc_id", "ida").withColumnRenamed("sh", "sha")
    val b = sh.withColumnRenamed("doc_id", "idb").withColumnRenamed("sh", "shb")
    val pairs = a.join(b, col("idb") === col("ida") + 1)
    val jd = pairs.select(
      graft.ops.Dedupe.jaccardOf(col("sha"), col("shb")).as("nat"),
      graft.ops.Dedupe.jaccardOfBuiltin(col("sha"), col("shb")).as("ref"))
    assert(jd.filter(col("nat") =!= col("ref")).count() == 0)
    assert(jd.count() > 0)

    val h1 = graft.ops.Dedupe.shingleHash40(col("sh"), "1")
    val h2 = graft.ops.Dedupe.shingleHash40(col("sh"), "2")
    val sig = sh.select(
      graft.ops.Dedupe.bindOnce(h1)(a1 => graft.ops.Dedupe.bindOnce(h2)(a2 =>
        graft.ops.Dedupe.minhashSignature(a1, a2, 72))).as("nat"),
      graft.ops.Dedupe.bindOnce(h1)(a1 => graft.ops.Dedupe.bindOnce(h2)(a2 =>
        graft.ops.Dedupe.minhashSignatureBuiltin(a1, a2, 72))).as("ref"))
    assert(sig.filter(col("nat") =!= col("ref")).count() == 0)
  }

  test("native sequential dot product is bit-identical to the fold form") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val v = graft.ops.Similarity.vectors(vecs, "vec_id", "embedding").localCheckpoint(true)
    val a = v.withColumnRenamed("vec_id", "ida").withColumnRenamed("v", "va")
    val b = v.withColumnRenamed("vec_id", "idb").withColumnRenamed("v", "vb")
    val pairs = a.join(b, col("idb") === col("ida") + 1)
      .select(
        graft.ops.Similarity.dot(col("va"), col("vb")).as("nat"),
        graft.ops.Similarity.dotBuiltin(col("va"), col("vb")).as("ref"))
    assert(pairs.filter(col("nat") =!= col("ref")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("charset sniff: BOMs, UTF-8 validation, ASCII, latin-1 fallback") {
    import spark.implicits._
    val cases: Seq[(String, Array[Byte])] = Seq(
      "UTF-8" -> Array(0xef, 0xbb, 0xbf, 'h', 'i').map(_.toByte), // BOM
      "UTF-16LE" -> Array(0xff, 0xfe, 'h', 0).map(_.toByte),
      "UTF-16BE" -> Array(0xfe, 0xff, 0, 'h').map(_.toByte),
      "UTF-32LE" -> Array(0xff, 0xfe, 0, 0).map(_.toByte),
      "UTF-32BE" -> Array(0, 0, 0xfe, 0xff).map(_.toByte),
      "US-ASCII" -> "plain ascii".getBytes("UTF-8"),
      "UTF-8" -> "héllo wörld — ünïcode".getBytes("UTF-8"),
      "ISO-8859-1" -> "caffé".getBytes("ISO-8859-1"), // é = 0xE9, invalid UTF-8
      "ISO-8859-1" -> Array(0xc0, 0xaf).map(_.toByte), // overlong '/', rejected
      // strictness beyond the continuation mask: all invalid UTF-8; the
      // 0x80 continuation bytes sit in the C1 range cp1252 prints (€),
      // so the single-byte tier refines the old latin-1 verdict
      "WINDOWS-1252" -> Array(0xe0, 0x80, 0x80).map(_.toByte), // overlong NUL (3-byte)
      "WINDOWS-1252" -> Array(0xed, 0xa0, 0x80).map(_.toByte), // CESU-8 surrogate half
      "WINDOWS-1252" -> Array(0xf0, 0x80, 0x80, 0x80).map(_.toByte), // overlong (4-byte)
      "WINDOWS-1252" -> Array(0xf4, 0x90, 0x80, 0x80).map(_.toByte), // > U+10FFFF
      "UTF-8" -> Array(0xf4, 0x8f, 0xbf, 0xbf).map(_.toByte), // U+10FFFF itself: valid
      "US-ASCII" -> Array.empty[Byte],
      // statistical tier: BOM-less UTF-16 by positional zero bytes
      "UTF-16LE" -> "bomless utf16 text".getBytes("UTF-16LE"),
      "UTF-16BE" -> "bomless utf16 text".getBytes("UTF-16BE"),
      // statistical tier: printable C1 bytes (curly quotes) → cp1252;
      // a C1 byte cp1252 leaves unmapped (0x90) is a control char → latin-1
      "WINDOWS-1252" -> ("he said ".getBytes("UTF-8") ++
        Array(0x93, 0x68, 0x69, 0x94).map(_.toByte)),
      "ISO-8859-1" -> ("ctrl".getBytes("UTF-8") ++ Array(0x90.toByte, 0xe9.toByte)),
      // short buffers never trigger the UTF-16 heuristic (n >= 8): the
      // NULs are valid ASCII, so strict validation wins
      "US-ASCII" -> Array('h'.toByte, 0.toByte, 'i'.toByte, 0.toByte),
      // CJK/Cyrillic tier: real JVM-encoded legacy bytes round-trip to
      // their encoding name — structural SJIS leads, EUC row occupancy,
      // Cyrillic density (each with mixed-in ASCII, as real pages have)
      "SHIFT_JIS" -> "これは にほんごの 文章です。abc 123".getBytes("Shift_JIS"),
      "EUC-JP" -> "これは にほんごの ぶんしょうです abc".getBytes("EUC-JP"),
      "EUC-KR" -> "한국어 문서 처리 시스템 abc 123".getBytes("EUC-KR"),
      "GB2312" -> "中文文本处理系统字符编码检测 abc".getBytes("GB2312"),
      "WINDOWS-1251" -> "Русский текст для проверки abc".getBytes("windows-1251"),
    )
    val got = cases.map(_._2).zipWithIndex
      .map { case (b, i) => (i, b) }.toDF("i", "content")
      .select(col("i"), GraftFunctions.sniffCharset(col("content")).as("cs"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1))
    assert(got.toSeq == cases.map(_._1))
    // misuse fails at analysis time, not codegen time
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(GraftFunctions.sniffCharset(col("x"))).collect()
    }
  }

  test("charset cascade: header beats meta beats sniff; hints normalize; chunk is 2000 bytes") {
    import spark.implicits._
    val metaU8 =
      """<meta http-equiv="content-type" content="text/html; charset=utf8">"""
    val hdr1252 = "Content-Type: text/html; charset=windows-1252"
    val latin1Body = "caffé".getBytes("ISO-8859-1")
    val cases: Seq[(String, String, Array[Byte])] = Seq(
      // header tier wins over both the meta tag and the byte shape
      ("WINDOWS-1252", hdr1252, (metaU8.getBytes("UTF-8") ++ latin1Body)),
      // meta tier (alias utf8 → UTF-8) wins over the latin-1 byte shape
      ("UTF-8", null, (metaU8.getBytes("UTF-8") ++ latin1Body)),
      // unquoted http-equiv, uppercase attribute, spaced charset=
      ("ISO-8859-1", null,
        "<META HTTP-EQUIV=content-type CONTENT=\"text/html; charset= latin1\">"
          .getBytes("UTF-8")),
      // a meta tag past the 2000-byte chunk is invisible (reference
      // CHUNK_SIZE, CharsetUtils.java:179): byte sniff decides
      ("US-ASCII", null, (" " * 2000 + metaU8).getBytes("UTF-8")),
      // no hints anywhere: plain sniff verdicts pass through
      ("ISO-8859-1", null, latin1Body),
      ("US-ASCII", null, "plain".getBytes("UTF-8")),
    )
    val got = cases.zipWithIndex
      .map { case ((_, h, b), i) => (i, h, b) }.toDF("i", "headers", "content")
      .select(col("i"),
        GraftFunctions.detectCharset(col("headers"), col("content")).as("cs"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1))
    assert(got.toSeq == cases.map(_._1))
  }

  test("html text extraction: invisible subtrees, entities, whitespace") {
    import spark.implicits._
    val cases: Seq[(String, String)] = Seq(
      // script/style vanish wholesale, including bare '<' inside them
      ("<p>a</p><script>if (1 < 2) { x(\"<b>\"); }</script><p>b</p>", "a b"),
      ("<style>p { color: red; }</style>hi", "hi"),
      // comments vanish; tags are word boundaries, attributes never leak
      ("x<!-- secret <b>bold</b> -->y", "x y"),
      ("<a href=\"http://e.com/?q=1&amp;r=2\" title='t'>link</a>", "link"),
      // entity decode, &amp; last (escaped entities stay literal text)
      ("A&amp;B &lt;i&gt; &quot;q&quot; &#39;s&#39;&nbsp;end", "A&B <i> \"q\" 's' end"),
      ("&amp;lt;", "&lt;"),
      // whitespace folding across newlines/tabs; empty body
      ("<div>\n  a\t\tb\r\n</div>", "a b"),
      ("<br/><hr>", ""),
    )
    val got = cases.zipWithIndex.map { case ((h, _), i) => (i, h) }
      .toDF("i", "html")
      .select(col("i"), GraftFunctions.htmlToText(col("html")).as("t"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1))
    assert(got.toSeq == cases.map(_._2))
  }

  test("feed-link extraction: Atom attrs vs RSS element text, scope, rel default") {
    import spark.implicits._
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<link rel="self" href="http://h/atom.xml"/>
        |<link rel="alternate" href="http://h/site/"/>
        |<!-- <link rel="alternate" href="http://commented.out/"/> -->
        |<entry><link href="http://h/e1"/><title>t</title></entry>
        |<entry><link rel="enclosure" href="http://h/e2.mp3"/></entry>
        |</feed>""".stripMargin
    val rss =
      """<rss version="2.0"><channel><title>c</title>
        |<link>http://h/rsite/</link>
        |<item><link> http://h/i1 </link><guid>g</guid></item>
        |<item><description>no link</description></item>
        |</channel></rss>""".stripMargin
    val got = Seq((1L, atom), (2L, rss)).toDF("id", "xml")
      .select(col("id"), explode(GraftFunctions.extractFeedLinks(col("xml"))).as("l"))
      .select(col("id"), col("l.scope"), col("l.rel"), col("l.url"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, "channel", "self", "http://h/atom.xml"),
      (1L, "channel", "alternate", "http://h/site/"),
      (1L, "item", "alternate", "http://h/e1"), // missing rel defaults
      (1L, "item", "enclosure", "http://h/e2.mp3"),
      (2L, "channel", "alternate", "http://h/rsite/"),
      (2L, "item", "alternate", "http://h/i1"))) // text trimmed
  }

  test("sitemap extraction: urlset vs sitemapindex, optional fields, entities") {
    import spark.implicits._
    val urlset =
      """<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc> http://h/a?x=1&amp;y=2 </loc><lastmod>2026-01-02</lastmod>
        |<changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>/rel/b</loc></url>
        |<!-- <url><loc>http://commented.out/</loc></url> -->
        |<url><lastmod>2026-01-03</lastmod></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex><sitemap><loc>http://h/maps/1.xml</loc>
        |<lastmod>2026-02-03</lastmod></sitemap></sitemapindex>""".stripMargin
    val got = Seq((1L, urlset), (2L, index)).toDF("id", "xml")
      .select(col("id"), explode(GraftFunctions.extractSitemapUrls(col("xml"))).as("u"))
      .select(col("id"), col("u.scope"), col("u.url"), col("u.lastmod"),
        col("u.changefreq"), col("u.priority"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)), Option(r.getString(5))))
      .toSet
    assert(got == Set(
      // entities decoded, loc whitespace trimmed, all optionals present
      (1L, "url", "http://h/a?x=1&y=2",
        Some("2026-01-02"), Some("daily"), Some("0.8")),
      // relative loc kept verbatim (resolution is the caller's step),
      // optionals absent → null; the loc-less <url> block is dropped
      (1L, "url", "/rel/b", None, None, None),
      (2L, "index", "http://h/maps/1.xml", Some("2026-02-03"), None, None)))
  }

  test("native expressions run inside whole-stage codegen") {
    // parquet-backed input so the projection cannot constant-fold away
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs
      .select(GraftFunctions.rabinFp64(col("text")).as("fp"))
      .filter(col("fp") =!= 0L)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [rabinFp64"))
    assert(plan.contains("*(1) Filter"))
    // a Scala UDF would appear as a non-codegen "UDF" node in the plan
    assert(!plan.contains("UDF"))
    assert(df.count() > 0)
  }

  test("nibble histogram and stride checksum match naive folds on random bytes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(500)
      val b = Array.fill(n)(rnd.nextInt(256).toByte) // full byte range incl. >0x7f
      val hist = NativeFns.nibbleHist16(b)
      assert(hist.numElements() == 16)
      val naive = b.groupBy(x => (x & 0xf0) >>> 4).view.mapValues(_.length.toLong).toMap
      (0 until 16).foreach(i =>
        assert(hist.getLong(i) == naive.getOrElse(i, 0L), s"bin $i, n=$n"))
      assert((0 until 16).map(hist.getLong).sum == n)

      for (stride <- Seq(1, 3, 4, 7)) {
        val want = b.indices.collect { case i if i % stride == 0 => (b(i) & 0xff).toLong }.sum
        assert(NativeFns.strideSum(b, stride) == want, s"stride=$stride n=$n")
      }
    }
    assert(NativeFns.strideSum(Array.empty[Byte], 4) == 0L)
  }
}
