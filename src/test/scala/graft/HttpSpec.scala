package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Http

/** HTTP chunked framing: roundtrip across chunk sizes / extensions /
  * trailers, hand-pinned RFC 9112 wire bytes, malformation rejects,
  * and the truncation sweep. */
class HttpSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("chunked roundtrip: sizes, extensions, trailers, empty body") {
    for {
      len <- Seq(0, 1, 4, 5, 37, 200)
      sz <- Seq(1, 5, 16, 64)
      ext <- Seq(true, false)
      tr <- Seq(None, Some("X-T: v"))
    } {
      val body = Array.tabulate(len)(i => ((i * 31 + 7) % 251).toByte)
      val enc = Http.enchunk(body, sz, ext, tr)
      val got = Http.dechunkCounted(enc)
      assert(got != null, s"len=$len sz=$sz ext=$ext tr=$tr")
      assert(got._1.toSeq == body.toSeq)
      assert(got._2 == (len + sz - 1) / sz)
    }
  }

  test("hand-pinned wire bytes decode exactly (RFC 9112 framing)") {
    // 4-byte chunk with an extension, 3-byte chunk, terminal chunk
    // with one trailer field
    val wire = ascii("4;x=y\r\nWiki\r\n3\r\npedia\r\n".replace("pedia", "ped")) ++
      ascii("0\r\nX-Done: 1\r\n\r\n")
    val got = Http.dechunkCounted(wire)
    assert(got != null)
    assert(new String(got._1, "US-ASCII") == "Wikiped")
    assert(got._2 == 2)
  }

  test("random-body roundtrip: arbitrary bytes (incl. CR/LF) survive") {
    // bodies containing CR, LF, and CRLF sequences must pass through
    // untouched — framing is length-driven, never delimiter-driven
    for (seed <- 0 until 50) {
      val rnd = new scala.util.Random(seed)
      val body = Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)
      val sz = rnd.nextInt(40) + 1
      val got = Http.dechunkCounted(
        Http.enchunk(body, sz, rnd.nextBoolean(),
          if (rnd.nextBoolean()) Some("T: x") else None))
      assert(got != null && got._1.toSeq == body.toSeq, s"seed=$seed")
    }
    val crlfBody = ascii("a\r\nb\r\n\r\n0\r\n\r\nc")
    val got = Http.dechunkCounted(Http.enchunk(crlfBody, 3, withExt = false, None))
    assert(got != null && got._1.toSeq == crlfBody.toSeq)
  }

  test("malformation rejects: bad hex, CRLF drift, size lies, budget") {
    val good = Http.enchunk(ascii("hello world, twelve+"), 7, withExt = false,
      trailer = Some("T: 1"))
    assert(Http.dechunkCounted(good) != null)
    // non-hex size line
    assert(Http.dechunkCounted(ascii("g\r\nx\r\n0\r\n\r\n")) == null)
    // declared size overruns the buffer
    assert(Http.dechunkCounted(ascii("ff\r\nshort\r\n0\r\n\r\n")) == null)
    // missing CRLF after the chunk data
    assert(Http.dechunkCounted(ascii("3\r\nabcXX0\r\n\r\n")) == null)
    // empty size line
    assert(Http.dechunkCounted(ascii("\r\n0\r\n\r\n")) == null)
    // budget: a size past maxOut rejects before allocating
    assert(Http.dechunkCounted(ascii("fffffff\r\n"), maxOut = 1024) == null)
    // truncation sweep: every strict prefix rejects, never throws
    for (n <- 0 until good.length)
      assert(Http.dechunkCounted(java.util.Arrays.copyOf(good, n)) == null,
        s"prefix $n must reject")
    // single-byte corruption never throws
    for (pos <- good.indices; d <- Seq(1, 0x80)) {
      val c = good.clone(); c(pos) = (c(pos) ^ d).toByte
      Http.dechunkCounted(c)
    }
  }

  test("BWS around the chunk-ext delimiter (RFC 9112 §7.1.1)") {
    // chunk-ext = *( BWS ";" BWS ext-name ... ): whitespace between the
    // size and ';' is spec-legal framing, not a lie
    for (gap <- Seq(" ", "\t", "  \t ")) {
      val got = Http.dechunkCounted(ascii(s"3$gap;x=1\r\nabc\r\n0\r\n\r\n"))
      assert(got != null && got._1.toSeq == "abc".getBytes("US-ASCII").toSeq,
        s"gap=${gap.map(_.toInt)}")
    }
    // trailing BWS with no extension at all is also tolerated
    assert(Http.dechunkCounted(ascii("3 \r\nabc\r\n0\r\n\r\n")) != null)
    // but hex resuming after the gap IS a framing lie
    assert(Http.dechunkCounted(ascii("3 3\r\nabcabc\r\n0\r\n\r\n")) == null)
    // and whitespace before any digit stays malformed
    assert(Http.dechunkCounted(ascii(" 3\r\nabc\r\n0\r\n\r\n")) == null)
  }

  test("Set-Cookie parse: RFC 6265 §5.2 attribute semantics") {
    val c = Http.parseSetCookie(
      "SID=31d4d96e407aad42; Path=/; Secure; HttpOnly; SameSite=Strict")
    assert(c.name == "SID" && c.valueLen == 16 && c.path == "/")
    assert(c.secure && c.httpOnly && c.sameSite == "Strict" && c.domain == null)
    // leading dot stripped, domain case-folded, attribute names
    // case-insensitive, LAST repeated attribute wins
    val d = Http.parseSetCookie(
      "a=b; DOMAIN=.Example.COM; domain=.Other.ORG; secure")
    assert(d.domain == "other.org" && d.secure)
    // Max-Age: negative allowed; non-numeric ignored; last wins
    assert(Http.parseSetCookie("a=b; Max-Age=-1").maxAge == -1L)
    assert(Http.parseSetCookie("a=b; Max-Age=500; Max-Age=20").maxAge == 20L)
    assert(Http.parseSetCookie("a=b; Max-Age=1x5").maxAge == -1L)
    // non-root Path resets to "/" (§5.2.4); empty Path too
    assert(Http.parseSetCookie("a=b; Path=relative").path == "/")
    assert(Http.parseSetCookie("a=b; Path=").path == "/")
    // unrecognized SameSite enforcement value is ignored
    assert(Http.parseSetCookie("a=b; SameSite=weird").sameSite == null)
    assert(Http.parseSetCookie("a=b; samesite=NONE").sameSite == "None")
    // missing '=' or empty name: ignore-the-set-cookie (null)
    assert(Http.parseSetCookie("no-equals-here") == null)
    assert(Http.parseSetCookie("=value; Secure") == null)
    assert(Http.parseSetCookie(null) == null)
    // value may be empty; unknown attributes ignored
    val e = Http.parseSetCookie("k=; Version=1; Comment=x")
    assert(e.valueLen == 0 && e.maxAge == -1L && !e.secure)
  }

  test("content-encoding chain: gzip/deflate/br/identity, reverse order") {
    val body = ("the quick brown fox jumps over the lazy dog " * 20)
      .getBytes("UTF-8")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def zlib(b: Array[Byte], raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(6, raw)
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    def eq(a: Array[Byte], b: Array[Byte]) = java.util.Arrays.equals(a, b)
    assert(eq(Http.decodeContentEncoding("gzip", gz(body)), body))
    assert(eq(Http.decodeContentEncoding("x-gzip", gz(body)), body))
    assert(eq(Http.decodeContentEncoding("deflate", zlib(body, raw = false)), body))
    // the historical raw-deflate origin quirk still decodes
    assert(eq(Http.decodeContentEncoding("deflate", zlib(body, raw = true)), body))
    assert(eq(Http.decodeContentEncoding("identity", body), body))
    assert(eq(Http.decodeContentEncoding(null, body), body))
    // br via the fixture assembler (libbrotlidec-pinned elsewhere)
    val br = graft.core.BrotliFixture.encode(7L, "en")
    assert(new String(Http.decodeContentEncoding("br", br), "UTF-8") ==
      graft.core.BrotliFixture.expectedText(7L, "en"))
    // chains decode in reverse application order: sender gzip THEN br?
    // no — listed "gzip, br" means gzip applied first, br second
    assert(eq(Http.decodeContentEncoding("identity, gzip", gz(body)), body))
    assert(eq(Http.decodeContentEncoding("gzip, identity", gz(body)), body))
    assert(eq(Http.decodeContentEncoding("gzip,gzip", gz(gz(body))), body))
    // unknown codings and garbage are undecodable, never a throw
    assert(Http.decodeContentEncoding("zstd-custom", body) == null)
    assert(Http.decodeContentEncoding("gzip", body) == null)
    assert(Http.decodeContentEncoding("br", gz(body)) == null)
    assert(Http.decodeContentEncoding("gzip", null) == null)
    // bomb budget
    val big = gz(new Array[Byte](1 << 20))
    assert(Http.decodeContentEncoding("gzip", big, maxOut = 1 << 16) == null)
  }
}
