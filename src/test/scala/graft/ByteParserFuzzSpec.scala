package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.sources.v2.WarcHttp

/** Never-throws fuzz for the byte-level header parsers: at corpus scale
  * malformed bytes are data, not errors, so `parseImageHeader`,
  * `parseAvHeader` and the HTTP envelope split must return their
  * unknown/raw fallbacks on ANY input — including inputs that start
  * with valid magic and then lie (truncated fields, absurd declared
  * sizes, negative-looking big-endian values). Fixed seed, so the
  * corpus is deterministic. */
class ByteParserFuzzSpec extends AnyFunSuite {

  /** A structurally valid 54-byte BI_RGB 24-bpp BMP header claiming the
    * given (untrusted) width/height — dimension-lie seeds for the pixel
    * decoder's bounds arithmetic. */
  private def bmpDims(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(0).putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.array()
  }

  private def corpus: Seq[Array[Byte]] = {
    val raw = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    // adversarial prefixes: valid magics spliced onto random tails, so
    // the parsers get past the cheap checks and into field arithmetic
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes("US-ASCII"),
      "GIF87a".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
      "BM".getBytes("US-ASCII"),
      // a full valid 54-byte BMP header promising pixels that are absent,
      // with fuzz deciding the (untrusted) dims/offset fields after byte 2
      "BM".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0x7f) ++ Array.fill[Byte](8)(0),
      // dims both 0x7f7f7f7f with otherwise-valid header: stride*height
      // overflows Long if compared naively (the round-8 ADVICE overflow)
      bmpDims(0x7f7f7f7f, 0x7f7f7f7f),
      bmpDims(0x7f7f7f7f, 2), bmpDims(2, 0x7f7f7f7f),
      // a valid PNG signature+IHDR with fuzz deciding the chunk stream
      // after it — the walker gets past the cheap checks into
      // length/inflate arithmetic
      Multimodal.encodePng24(1L, 4, 4).take(33),
      // a valid GIF header+screen descriptor+global table with fuzz
      // deciding the block stream — exercises the LZW decoder on junk
      Multimodal.encodeGif(1L, 4, 4).take(13 + 768 + 10),
      // a valid RIFF/WAVE/fmt prefix with fuzz deciding the chunk tail
      Multimodal.encodeWavPcm16(1L, 8).take(36),
      // a valid JPEG SOI..SOS prefix with fuzz deciding the entropy
      // scan — exercises the huffman decoder on junk codes
      Multimodal.encodeJpeg(1L, 1, 1).take(180),
      "RIFF".getBytes("US-ASCII"),
      "RIFF1234WAVE".getBytes("US-ASCII"),
      "RIFF1234WAVEfmt ".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 0) ++ "ftyp".getBytes("US-ASCII"), // size<8 box
      "HTTP".getBytes("US-ASCII"),
      "HTTP/1.1 ".getBytes("US-ASCII"),
      "HTTP/1.1 200 OK\r\nContent-Type:".getBytes("US-ASCII"))
    val prefixed = for {
      m <- Gen.oneOf(magics)
      tail <- raw
    } yield m ++ tail
    val gen = Gen.listOfN(600, Gen.frequency(1 -> raw, 2 -> prefixed))
    gen(Gen.Parameters.default, Seed(8L)).get
  }

  test("image/AV header parsers and HTTP split never throw on fuzzed bytes") {
    corpus.foreach { b =>
      val (imgFmt, w, h) = Multimodal.parseImageHeader(b)
      assert(imgFmt == "unknown" || w >= -1 && h >= -1)
      // BMP pixel decode: untrusted dims/offset must reject, not index
      val (bw, bh, _, _, _, _) = Multimodal.decodeBmp24Stats(b)
      assert(bw >= -1 && bh >= -1)
      // PNG pixel decode: chunk walk + inflate + unfilter must never
      // throw on fuzzed chunk lengths, dims, or corrupt zlib streams
      val (pw, ph, _, _, _, _) = Multimodal.decodePngStats(b)
      assert(pw >= -1 && ph >= -1)
      // GIF decode: block walk + LZW (fuzzed codes, widths, KwKwK edge)
      val (gw, gh, _, _, _, _) = Multimodal.decodeGifStats(b)
      assert(gw >= -1 && gh >= -1)
      // WAV sample decode: chunk walk + int16 fold
      val (wc, _, _, _, _) = Multimodal.decodeWavStats(b)
      assert(wc >= -1)
      // JPEG decode: marker walk + huffman scan + IDCT
      val (jw, jh, _, _, _, _) = Multimodal.decodeJpegStats(b)
      assert(jw >= -1 && jh >= -1)
      val (avFmt, ch, rate, bits, dur) = Multimodal.parseAvHeader(b)
      assert(avFmt == "unknown" || avFmt == "wav" || avFmt == "mp4")
      if (avFmt == "unknown") assert(ch == -1 && bits == -1 && dur == 0L)
      assert(rate >= -1)
      val (_, _, payload, _) = WarcHttp.split(b, needHeaders = true)
      assert(payload != null && payload.length <= b.length)
    }
  }
}
