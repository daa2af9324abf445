package graft.core

/** HTTP/1.1 message-framing kernels (RFC 9112). The reference's ARC
  * reader walks HTTP envelopes inside archive records
  * (`src/org/commoncrawl/util/ArcFileReader.java`); a real crawl
  * corpus stores many bodies CHUNKED (Transfer-Encoding: chunked), and
  * nothing downstream — text extraction, dedupe, media decode — can
  * run until the framing is removed. Spec-derived; declared sizes are
  * untrusted (budget-capped), malformed input returns null, never a
  * throw (the house multimodal policy).
  */
object Http {

  /** Decoded chunked body plus its data-chunk count, or null on any
    * framing lie: non-hex size line, missing CRLF after a chunk,
    * truncation, or total size past `maxOut`. Chunk extensions
    * (`;name=value` after the size) and trailer fields after the last
    * chunk are consumed per spec. */
  def dechunkCounted(b: Array[Byte], maxOut: Int = 1 << 26): (Array[Byte], Int) = {
    try {
      val out = new java.io.ByteArrayOutputStream()
      var pos = 0
      var chunks = 0
      // reads the bytes of one CRLF-terminated line; -1 on truncation
      def lineEnd(from: Int): Int = {
        var i = from
        while (i + 1 < b.length) {
          if (b(i) == '\r' && b(i + 1) == '\n') return i
          i += 1
        }
        -1
      }
      while (true) {
        val le = lineEnd(pos)
        if (le < 0) return null
        // size line: hex digits, optionally followed by ";extensions"
        var size = 0L
        var i = pos
        var any = false
        var inExt = false
        var wsGap = false // RFC 9112 §7.1.1 allows BWS before the ';'
        while (i < le) {
          val c = b(i) & 0xff
          if (!inExt) {
            if (c == ';') inExt = true
            else if ((c == ' ' || c == '\t') && any) wsGap = true
            else if (wsGap) return null // hex after the gap: framing lie
            else {
              val d =
                if (c >= '0' && c <= '9') c - '0'
                else if (c >= 'a' && c <= 'f') c - 'a' + 10
                else if (c >= 'A' && c <= 'F') c - 'A' + 10
                else return null
              size = size * 16 + d
              any = true
              if (size > maxOut) return null
            }
          }
          i += 1
        }
        if (!any) return null
        pos = le + 2
        if (size == 0L) {
          // trailer section: zero or more field lines, then empty line
          var done = false
          while (!done) {
            val te = lineEnd(pos)
            if (te < 0) return null
            if (te == pos) { pos += 2; done = true }
            else pos = te + 2
          }
          return (out.toByteArray, chunks)
        }
        if (pos + size + 2 > b.length) return null
        if (out.size() + size > maxOut) return null
        out.write(b, pos, size.toInt)
        pos += size.toInt
        if (b(pos) != '\r' || b(pos + 1) != '\n') return null
        pos += 2
        chunks += 1
      }
      null // unreachable
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Chunk-encode a body with a fixed data-chunk size — fixture
    * synthesis for the decoder's oracle (extension and trailer
    * variants exercise the skip paths). */
  def enchunk(body: Array[Byte], chunkSize: Int,
      withExt: Boolean, trailer: Option[String]): Array[Byte] = {
    require(chunkSize > 0)
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    var pos = 0
    while (pos < body.length) {
      val n = math.min(chunkSize, body.length - pos)
      ascii(java.lang.Long.toHexString(n.toLong))
      if (withExt) ascii(";x=graft")
      ascii("\r\n")
      out.write(body, pos, n)
      ascii("\r\n")
      pos += n
    }
    ascii("0\r\n")
    trailer.foreach(t => ascii(s"$t\r\n"))
    ascii("\r\n")
    out.toByteArray
  }

  /** Decode an HTTP `Content-Encoding` chain (RFC 9110 §8.4): codings
    * are listed in the order the sender APPLIED them, so decoding runs
    * in reverse. Supported codings: identity, gzip/x-gzip
    * (RFC 1952 via the JDK), deflate (RFC 1950 zlib, with the
    * historical raw-deflate fallback some origins emit), and br
    * (RFC 7932 via [[Brotli]]). Unknown codings and every decode
    * failure return null — undecodable, never a throw; `maxOut` is the
    * decompression-bomb budget applied at each stage. */
  def decodeContentEncoding(enc: String, body: Array[Byte],
                            maxOut: Int = 1 << 26): Array[Byte] = {
    if (body == null) return null
    val tokens =
      if (enc == null) Array.empty[String]
      else enc.split(",").map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty)
    var cur = body
    var i = tokens.length - 1
    while (i >= 0 && cur != null) {
      cur = tokens(i) match {
        case "identity" => cur
        case "gzip" | "x-gzip" => gunzipBounded(cur, maxOut)
        case "deflate" => inflateZlibBounded(cur, maxOut)
        case "br" => Brotli.decode(cur, maxOut)
        case _ => null
      }
      i -= 1
    }
    cur
  }

  private def readBounded(in: java.io.InputStream, maxOut: Int): Array[Byte] =
    try {
      val out = in.readNBytes(maxOut + 1)
      if (out.length > maxOut) null else out
    } catch { case scala.util.control.NonFatal(_) => null }
    finally in.close()

  private def gunzipBounded(b: Array[Byte], maxOut: Int): Array[Byte] =
    try readBounded(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b)), maxOut)
    catch { case scala.util.control.NonFatal(_) => null }

  private def inflateZlibBounded(b: Array[Byte], maxOut: Int): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] =
      try readBounded(new java.util.zip.InflaterInputStream(
        new java.io.ByteArrayInputStream(b),
        new java.util.zip.Inflater(raw)), maxOut)
      catch { case scala.util.control.NonFatal(_) => null }
    val zlib = run(raw = false)
    if (zlib != null) zlib else run(raw = true)
  }

  /** One parsed Set-Cookie header (RFC 6265 §5.2 user-agent algorithm):
    * cookie name, value length, and the policy-relevant attributes a
    * privacy/security audit filters on. `sameSite` is the normalized
    * token or null; `maxAge` is -1 when absent or non-numeric. */
  final case class SetCookie(
      name: String, valueLen: Int, domain: String, path: String,
      maxAge: Long, secure: Boolean, httpOnly: Boolean, sameSite: String)

  /** Parse one Set-Cookie field value; null when the name-value pair is
    * missing or empty-named (§5.2 step 2–4: ignore the set-cookie).
    * Attribute names are case-insensitive; an attribute repeated takes
    * its LAST occurrence (the RFC's replace semantics); unknown
    * attributes are ignored. */
  def parseSetCookie(header: String): SetCookie = {
    if (header == null) return null
    val parts = header.split(";", -1)
    val nv = parts(0)
    val eq = nv.indexOf('=')
    if (eq <= 0) return null // no '=' or empty name
    val name = nv.substring(0, eq).trim
    val value = nv.substring(eq + 1).trim
    if (name.isEmpty) return null
    var domain: String = null; var path: String = null
    var maxAge = -1L; var secure = false; var httpOnly = false
    var sameSite: String = null
    var i = 1
    while (i < parts.length) {
      val av = parts(i)
      val e = av.indexOf('=')
      val aname = (if (e < 0) av else av.substring(0, e)).trim.toLowerCase
      val aval = if (e < 0) "" else av.substring(e + 1).trim
      aname match {
        case "domain" =>
          // §5.2.3: a leading dot is ignored; empty value ignores the av
          if (aval.nonEmpty)
            domain = (if (aval.startsWith(".")) aval.substring(1)
              else aval).toLowerCase
        case "path" =>
          path = if (aval.isEmpty || !aval.startsWith("/")) "/" else aval
        case "max-age" =>
          // §5.2.2: first char digit or '-', rest digits; else ignore
          if (aval.matches("-?[0-9]+"))
            maxAge = try aval.toLong catch { case _: Exception => -1L }
        case "secure" => secure = true
        case "httponly" => httpOnly = true
        case "samesite" =>
          aval.toLowerCase match {
            case "strict" => sameSite = "Strict"
            case "lax" => sameSite = "Lax"
            case "none" => sameSite = "None"
            case _ => () // unrecognized enforcement value ignored
          }
        case _ => () // unknown attribute
      }
      i += 1
    }
    SetCookie(name, value.length, domain, path, maxAge, secure, httpOnly,
      sameSite)
  }
}
