package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{JpegProgressive, Multimodal}

/** Progressive JPEG (SOF2): analytic replay parity on the fixture
  * regimes, the JDK ImageIO encoder as an INDEPENDENT scan-script author
  * (its progressive and baseline writes of one image must decode
  * bit-identically through our two decoders), ImageIO's own decoder as
  * the pixel referee, and corruption fuzz. */
class JpegProgressiveSpec extends AnyFunSuite {

  // pinned-IDCT basis rows the fixture's four coefficient positions
  // touch (IdctK rows u/v = 0,1,2,3,5)
  private val K0 = Array.fill(8)(1448)
  private val K1 = Array(2009, 1703, 1138, 400, -400, -1138, -1703, -2009)
  private val K2 = Array(1892, 784, -784, -1892, -1892, -784, 784, 1892)
  private val K3 = Array(1703, -400, -2009, -1138, 1138, 2009, 400, -1703)
  private val K5 = Array(1138, -2009, 400, 1703, -1703, -400, 2009, -1138)

  private def pixel(k: Long, bx: Int, by: Int, x: Int, y: Int): Int = {
    // zigzag 0 → (0,0); 1 → (1,0); 8 → (1,2); 40 → (5,3)
    val s = 1448L * 1448 * (8L * Multimodal.jpegAcDc(k, bx, by)) +
      K1(x).toLong * K0(y) * (16L * Multimodal.jpegAc1(k, bx, by)) +
      K1(x).toLong * K2(y) * (16L * Multimodal.jpegAc2(k, bx, by)) +
      K5(x).toLong * K3(y) * (16L * JpegProgressive.jpegB3(k, bx, by))
    val v = ((s + (1L << 23)) >> 24).toInt + 128
    math.max(0, math.min(255, v))
  }

  test("progressive fixture decode matches the pinned-IDCT analytic replay") {
    for (nbx <- 1 to 3; nby <- 1 to 3; k <- Seq(0L, 1L, 2L, 17L, 42L, 101L, 250L)) {
      val w = 8 * nbx; val h = 8 * nby
      val got = JpegProgressive.decodeJpegProgStats(
        JpegProgressive.encodeJpegProg(k, nbx, nby))
      def px(x: Int, y: Int) = pixel(k, x / 8, y / 8, x % 8, y % 8)
      val all = for { y <- 0 until h; x <- 0 until w } yield px(x, y).toLong
      val even = for { y <- 0 until h by 2; x <- 0 until w by 2 } yield px(x, y).toLong
      assert(got == ((w, h, all.sum, all.sum, all.sum, 3 * even.sum)),
        s"nbx=$nbx nby=$nby k=$k")
    }
    // every refinement mechanism must actually occur across the sweep:
    // ±1 insertions behind a ZRL (b3 ≠ 0), correction bits (|a1| or
    // |a2| ≥ 2), EOB-run-with-correction-bits blocks (a1/a2 ∈ {-1,0,1}
    // with at least one nonzero... any b3=0 block with history), and
    // odd DCs for the DC-refinement bit
    val cover = for {
      k <- 0L until 251L; bx <- 0 to 2; by <- 0 to 2
    } yield (JpegProgressive.jpegB3(k, bx, by),
      Multimodal.jpegAc1(k, bx, by), Multimodal.jpegAc2(k, bx, by),
      Multimodal.jpegAcDc(k, bx, by))
    assert(cover.exists(_._1 != 0), "no ZRL-guarded insertion anywhere")
    assert(cover.exists(c => math.abs(c._2) >= 2), "no correction bits")
    assert(cover.exists(c => c._1 == 0 && math.abs(c._2) >= 2 && math.abs(c._3) <= 1),
      "no EOB-run member carrying correction bits")
    assert(cover.exists(c => (c._4 & 1) != 0), "no DC refinement bit set")
  }

  private def writeJpeg(img: java.awt.image.BufferedImage,
      progressive: Boolean): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.8f)
    params.setProgressiveMode(
      if (progressive) ImageWriteParam.MODE_DEFAULT
      else ImageWriteParam.MODE_DISABLED)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def hasMarker(bytes: Array[Byte], m: Int): Boolean =
    bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)

  test("JDK-encoded progressive == JDK-encoded baseline through our decoders") {
    // The JDK writer is an independent progressive-scan-script author
    // (libjpeg-style DC/AC spectral selection + successive approximation
    // with its own Al choices, optimized Huffman tables). Its progressive
    // and baseline writes of one image carry IDENTICAL coefficients, so
    // our SOF2 multi-scan assembly must reproduce our SOF0 decode
    // bit-for-bit — any scan-semantics error (EOB runs, correction-bit
    // order, point transforms, band splits) breaks the equality.
    def grayImg(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 7 + y * 13 + seed * 31 + (x * y) % 11) % 256)
      img
    }
    for ((w, h, seed) <- Seq((37, 21, 1), (16, 16, 2), (64, 48, 3), (9, 130, 4))) {
      val img = grayImg(w, h, seed)
      val prog = writeJpeg(img, progressive = true)
      val base = writeJpeg(img, progressive = false)
      assert(hasMarker(prog, 0xc2), "JDK did not emit SOF2")
      assert(hasMarker(base, 0xc0), "JDK did not emit SOF0")
      val gotProg = JpegProgressive.decodeJpegProgStats(prog)
      val gotBase = Multimodal.decodeJpegStats(base)
      assert(gotProg._1 == w && gotProg._2 == h, s"decode failed $w x $h")
      assert(gotProg == gotBase, s"$w x $h seed=$seed: prog=$gotProg base=$gotBase")
    }
    // color: interleaved DC scans + per-component non-interleaved AC
    // scans over the subsampled chroma block grids
    def colorImg(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 5 + y * 3 + seed) % 256
        val g = (x * 2 + y * 11 + seed * 7) % 256
        val b = (x * 13 + y * 2 + seed * 3) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      img
    }
    for ((w, h, seed) <- Seq((37, 21, 5), (32, 32, 6), (50, 17, 7))) {
      val img = colorImg(w, h, seed)
      val prog = writeJpeg(img, progressive = true)
      val base = writeJpeg(img, progressive = false)
      assert(hasMarker(prog, 0xc2), "JDK did not emit color SOF2")
      val gotProg = JpegProgressive.decodeJpegProgStats(prog)
      val gotBase = Multimodal.decodeJpegStats(base)
      assert(gotProg._1 == w && gotProg._2 == h, s"color decode failed $w x $h")
      assert(gotProg == gotBase, s"color $w x $h seed=$seed: prog=$gotProg base=$gotBase")
    }
  }

  test("ImageIO's own decoder referees our progressive pixels (gray, ±2)") {
    val prog = JpegProgressive.encodeJpegProg(42L, 3, 2)
    val img = ImageIO.read(new ByteArrayInputStream(prog))
    assert(img != null && img.getWidth == 24 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val got = img.getRaster.getSample(x, y, 0)
      val want = pixel(42L, x / 8, y / 8, x % 8, y % 8)
      assert(math.abs(got - want) <= 2, s"($x,$y): jdk=$got pinned=$want")
    }
  }

  test("malformed input returns the sentinel, never throws") {
    val bad = (-1, -1, -1L, -1L, -1L, -1L)
    // baseline file through the progressive decoder (SOF0 rejected)
    assert(JpegProgressive.decodeJpegProgStats(
      Multimodal.encodeJpegAc(7L, 2, 2)) == bad)
    assert(JpegProgressive.decodeJpegProgStats(Array.empty[Byte]) == bad)
    assert(JpegProgressive.decodeJpegProgStats(Array[Byte](0xff.toByte, 0xd8.toByte)) == bad)
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 300) {
      val baseBytes = JpegProgressive.encodeJpegProg(rnd.nextInt(251).toLong,
        rnd.nextInt(5) + 1, rnd.nextInt(4) + 1)
      val mut = baseBytes.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      val (mw, mh, _, _, _, _) = JpegProgressive.decodeJpegProgStats(mut)
      assert(mw >= -1 && mh >= -1)
      // truncation at a random point
      val cut = JpegProgressive.decodeJpegProgStats(
        baseBytes.take(rnd.nextInt(baseBytes.length)))
      assert(cut._1 >= -1)
    }
  }
}
