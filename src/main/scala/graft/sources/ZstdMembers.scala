package graft.sources

import java.io.{ByteArrayInputStream, EOFException, IOException, InputStream}

import com.github.luben.zstd.ZstdInputStream

/** Member-stream abstraction shared by the archive readers: a
  * concatenation of independently-decompressible members, each starting
  * at a recorded compressed-stream offset (the seekable-`offset`
  * contract the ARC/WARC scans expose). */
trait MemberStream {
  /** The decompressed payload of the next member, or null at clean EOF. */
  def nextMember(): InputStream
  /** Compressed-stream offset of the most recent member's first byte. */
  def memberOffset: Long
}

/** Streaming reader for a concatenation of zstd frames — the `.warc.zst`
  * layout the archive ecosystem is adopting next to `.warc.gz` (one
  * record per frame, member-seekable; IIPC warc-specifications
  * warc-zstd). Skippable frames (RFC 8878 §9.2 — the slot the warc-zstd
  * spec reserves for a shared dictionary) are passed over; dictionary
  * COMPRESSION is not supported — frames must be self-contained, which
  * is what [[graft.sources.v2.WarcDataWriter]] produces.
  *
  * Member boundaries are found by walking the frame's block headers
  * (RFC 8878 §3.1.1: each block header carries its on-wire size, so the
  * frame end is reachable WITHOUT decompressing) — the same
  * constant-window discipline as [[GzipMembers]], then each frame
  * inflates independently through zstd-jni. All length fields are
  * untrusted: per-frame compressed-size budget, reserved bits and block
  * types rejected.
  */
final class ZstdMembers(in: InputStream, bufSize: Int = 1 << 16)
    extends MemberStream {
  private val buf = new Array[Byte](bufSize)
  private var bufLen = 0
  private var bufPos = 0
  private var eof = false
  private var pos = 0L

  var memberOffset: Long = -1L

  /** Compressed bytes of one frame must fit this budget (a frame is one
    * WARC record; 1 GiB of compressed record is damage, not data). */
  private val MaxFrameBytes = 1 << 30

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

  private def need(out: java.io.ByteArrayOutputStream): Int = {
    val b = readByte()
    if (b < 0) throw new EOFException(s"truncated zstd frame at offset $pos")
    if (out != null) {
      if (out.size() >= MaxFrameBytes)
        throw new IOException(s"zstd frame exceeds $MaxFrameBytes bytes")
      out.write(b)
    }
    b
  }

  private def copyN(n: Long, out: java.io.ByteArrayOutputStream): Unit = {
    var left = n
    while (left > 0) { need(out); left -= 1 }
  }

  private def readMagic(out: java.io.ByteArrayOutputStream): Long = {
    val b0 = readByte()
    if (b0 < 0) return -1L
    if (out != null) out.write(b0)
    (b0.toLong | (need(out).toLong << 8) | (need(out).toLong << 16) |
      (need(out).toLong << 24)) & 0xffffffffL
  }

  def nextMember(): InputStream = {
    while (true) {
      memberOffset = pos
      val frame = new java.io.ByteArrayOutputStream(1 << 12)
      val magic = readMagic(frame)
      if (magic == -1L) return null
      if (magic >= 0x184d2a50L && magic <= 0x184d2a5fL) {
        // skippable frame: 4-byte LE size, then content — passed over
        val n = readMagic(null)
        if (n == -1L) throw new EOFException("truncated skippable frame")
        if (n > MaxFrameBytes)
          throw new IOException(s"skippable frame declares $n bytes")
        copyN(n, null)
      } else if (magic == 0xfd2fb528L) {
        // frame header
        val fhd = need(frame)
        if ((fhd & 0x08) != 0)
          throw new IOException("zstd frame header reserved bit set")
        val singleSegment = (fhd & 0x20) != 0
        if (!singleSegment) need(frame) // window descriptor
        val dictIdLen = (fhd & 3) match {
          case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
        }
        if (dictIdLen > 0)
          throw new IOException(
            "dictionary-compressed zstd frame (unsupported in graft-warc)")
        val fcsLen = (fhd >>> 6) match {
          case 0 => if (singleSegment) 1 else 0
          case 1 => 2; case 2 => 4; case _ => 8
        }
        copyN(fcsLen, frame)
        // blocks: 3-byte LE header carries last-bit, type, on-wire size
        var last = false
        while (!last) {
          val h = need(frame) | (need(frame) << 8) | (need(frame) << 16)
          last = (h & 1) != 0
          val btype = (h >>> 1) & 3
          val bsize = h >>> 3
          if (btype == 3) throw new IOException("reserved zstd block type")
          val wire = if (btype == 1) 1 else bsize // RLE stores one byte
          copyN(wire, frame)
        }
        if ((fhd & 0x04) != 0) copyN(4, frame) // content checksum
        return new ZstdInputStream(new ByteArrayInputStream(frame.toByteArray))
      } else
        throw new IOException(f"bad zstd magic $magic%08x at offset ${pos - 4}")
    }
    null // unreachable
  }
}
