package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.util.zip.Inflater

/** Streaming reader for a concatenation of gzip members — the ARC archive
  * layout (reference: util/ArcFileReader.java:68 treats an ARC file as a
  * sequence of independently-seekable gzip members).
  *
  * Unlike `GZIPInputStream` (which splices concatenated members into one
  * opaque stream) this reader surfaces each member separately and tracks
  * its byte offset in the *compressed* stream, so a scan can build the
  * seekable content index as it goes. Unlike the `binaryFile`-based path
  * it never buffers the file: compressed bytes flow through a fixed 64 KiB
  * window, so a multi-GiB archive reads in constant memory.
  */
final class GzipMembers(in: InputStream, bufSize: Int = 1 << 16)
    extends MemberStream {
  private val buf = new Array[Byte](bufSize)
  private var bufLen = 0 // valid bytes in buf
  private var bufPos = 0 // next unconsumed byte
  private var eof = false
  private var pos = 0L // absolute compressed-stream offset of buf(bufPos)

  /** Compressed-stream offset of the most recent member's first byte. */
  var memberOffset: Long = -1L

  private def fill(): Boolean = {
    if (bufPos < bufLen) return true
    if (eof) return false
    bufLen = in.read(buf)
    bufPos = 0
    if (bufLen <= 0) { eof = true; bufLen = 0; false }
    else true
  }

  private def readByte(): Int =
    if (!fill()) -1
    else { val b = buf(bufPos) & 0xff; bufPos += 1; pos += 1; b }

  private def need(): Int = {
    val b = readByte()
    if (b < 0) throw new EOFException(s"truncated gzip header at offset $pos")
    b
  }

  /** Consume one member header (RFC 1952 §2.3: 10 fixed bytes + optional
    * FEXTRA / FNAME / FCOMMENT / FHCRC fields). False at clean EOF. */
  private def readHeader(): Boolean = {
    if (!fill()) return false
    val m1 = need(); val m2 = need()
    if (m1 != 0x1f || m2 != 0x8b)
      throw new IOException(f"bad gzip magic $m1%02x$m2%02x at offset ${pos - 2}")
    need() // CM
    val flg = need()
    var i = 0
    while (i < 6) { need(); i += 1 } // MTIME(4) XFL OS
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = need() | (need() << 8)
      var j = 0
      while (j < xlen) { need(); j += 1 }
    }
    if ((flg & 8) != 0) while (need() != 0) () // FNAME
    if ((flg & 16) != 0) while (need() != 0) () // FCOMMENT
    if ((flg & 2) != 0) { need(); need() } // FHCRC
    true
  }

  /** The inflated payload of the next member, or null at clean EOF.
    * The returned stream must be exhausted or `close`d (which drains it)
    * before `nextMember` is called again — members share the input window. */
  def nextMember(): InputStream = {
    memberOffset = pos
    if (!readHeader()) return null
    val infl = new Inflater(true)
    new InputStream {
      private var done = false
      private var fed = 0 // bytes loaned to the inflater from buf
      private val one = new Array[Byte](1)

      // Reconcile buf position with what the inflater actually consumed.
      private def settle(): Unit = {
        val consumed = fed - infl.getRemaining
        bufPos += consumed
        pos += consumed
        fed = infl.getRemaining
      }

      override def read(): Int = {
        val n = read(one, 0, 1)
        if (n < 0) -1 else one(0) & 0xff
      }

      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (len == 0) return 0
        if (done) return -1
        var n = infl.inflate(b, off, len)
        while (n == 0 && !infl.finished()) {
          if (infl.needsInput()) {
            settle() // fed bytes fully consumed here (getRemaining == 0)
            if (!fill())
              throw new EOFException(s"truncated gzip member at offset $pos")
            infl.setInput(buf, bufPos, bufLen - bufPos)
            fed = bufLen - bufPos
          }
          n = infl.inflate(b, off, len)
        }
        if (infl.finished() && !done) {
          settle()
          infl.end()
          done = true
          var i = 0 // CRC32 + ISIZE trailer
          while (i < 8) {
            if (readByte() < 0)
              throw new EOFException(s"truncated gzip trailer at offset $pos")
            i += 1
          }
        }
        if (n == 0 && done) -1 else n
      }

      /** Drain to the member boundary so the next member can start. */
      override def close(): Unit = {
        if (!done) {
          val scratch = new Array[Byte](8192)
          while (read(scratch, 0, scratch.length) >= 0) ()
        }
      }
    }
  }
}
