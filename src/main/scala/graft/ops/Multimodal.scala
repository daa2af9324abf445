package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch decode / feature-extract /
  * frame-sample plumbing (the LLM-pipeline extension; the reference
  * carries raw content buffers the same way — `buffer` fields in
  * database.jr:584-591 ArcFileContentItem).
  *
  * The actual codec step is a DETERMINISTIC STUB (`decodeHeaderStub`):
  * this container has no image/audio libraries, so "decode" parses our
  * synthetic GRFT container header instead. Everything around it — the
  * binary column handling, metadata schema, per-partition batching shape,
  * and partition-preserving plan — is real and is what a production
  * decoder would plug into.
  */
object Multimodal {

  /** Synthetic media container, 10-byte ASCII header then payload:
    * 'GRFT' ‖ 1 format digit (0=img,1=audio,2=video) ‖ 4-digit frame
    * count ‖ ':'. */
  val HeaderLen = 10

  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("payload_len", IntegerType, nullable = false),
  ))

  /** Build the container from a text payload — pure column expressions,
    * so media synthesis stays in the scan projection. */
  def packMedia(payloadText: Column, formatDigit: Column, nFrames: Column): Column =
    concat(
      lit("GRFT"),
      formatDigit.cast("string"),
      lpad(nFrames.cast("string"), 4, "0"),
      lit(":"),
      payloadText).cast("binary")

  private val formats = Map('0' -> "img", '1' -> "audio", '2' -> "video")

  /** The decode stub: parse the GRFT header out of the binary column in
    * per-partition batches. Runs as `mapPartitions` over (id, media)
    * rows — the exact seam where a real decoder (libjpeg/ffmpeg/…) would
    * process each batch. Output: (id, format, n_frames, payload_len). */
  def decodeHeaderStub(df: DataFrame, id: String, media: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: MetaSchema.fields.toSeq)
    val rdd = df.select(col(id).cast("long"), col(media)).rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val header = new String(bytes, 0, HeaderLen, "UTF-8")
        require(header.startsWith("GRFT") && header.endsWith(":"),
          "not a GRFT container")
        val fmt = formats.getOrElse(header.charAt(4), "unknown")
        val frames = header.substring(5, 9).toInt
        Row(r.getLong(0), fmt, frames, bytes.length - HeaderLen)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Feature extraction: a 16-bin histogram over the payload bytes' high
    * nibbles, L1-normalized — ONE pass over the raw bytes via the
    * codegen'd `nibble_hist16` native expression (true byte counts, no
    * string decode), with the normalization kept in column land so the
    * doubles are single exact divisions of exact counts. */
  def byteHistogram16(media: Column): Column = {
    val payload = substring(media, HeaderLen + 1, Int.MaxValue)
    val counts = graft.functions.NativeExpressions.nibbleHist16(payload)
    val total = greatest(length(payload), lit(1)).cast("double")
    array((0 until 16).map(i =>
      element_at(counts, i + 1).cast("double") / total): _*)
  }

  /** "Resize" stub: stride-k nearest-neighbor downsample of the payload
    * bytes — the 1-D analog of image resizing, as pure column expressions
    * (a real resampler would replace the kernel inside the same
    * batch-per-partition seam as `decodeHeaderStub`). Returns
    * (out_len, checksum) of the resampled payload: the checksum is an
    * exact integer fold over the sampled bytes, so a downstream oracle
    * can verify which bytes were kept without shipping the payload. */
  def resizeStride(media: Column, stride: Int): (Column, Column) = {
    val payload = substring(media, HeaderLen + 1, Int.MaxValue)
    // kept positions are 1, 1+stride, 1+2*stride … ≤ len, so the output
    // length is pure arithmetic — no index array to materialize — and the
    // checksum is one codegen'd pass over the raw bytes (stride_sum)
    val len = length(payload)
    // ceil(len/stride) via double division then truncation — exact for
    // any realistic payload length (double holds integers to 2^53)
    val out = ((len + lit(stride - 1)) / lit(stride)).cast("long")
    val checksum = graft.functions.NativeExpressions.strideSum(payload, stride)
    (out, checksum)
  }

  /** Frame sampling for "video" media: every k-th frame index, capped —
    * the list-generation shape (deterministic, no decode needed). */
  def sampleFrameIndexes(nFrames: Column, every: Int, cap: Int): Column =
    slice(
      filter(
        sequence(lit(0), greatest(nFrames.cast("int") - 1, lit(0))),
        i => i % every === 0),
      1, cap)
}
