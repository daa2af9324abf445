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
}
