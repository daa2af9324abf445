package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSuite {

  test("pack → batch decode stub round-trips metadata over binary media") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val frames = (col("n_chars") % 50 + 1).cast("int")
    val packed = docs.select(
      col("doc_id"),
      Multimodal.packMedia(col("text"), col("doc_id") % 3, frames).as("media"),
      frames.as("frames"),
      length(col("text")).as("n_text_chars"))

    val decoded = Multimodal.decodeHeaderStub(packed, "doc_id", "media")
    assert(decoded.schema.fieldNames.toSeq == Seq("id", "format", "n_frames", "payload_len"))

    val want = packed.select(col("doc_id"), col("frames"), col("n_text_chars")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val got = decoded.collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (frames0, _) = want(r.getLong(0))
      assert(r.getInt(2) == frames0)
      val fmt = r.getLong(0) % 3 match {
        case 0 => "img"; case 1 => "audio"; case _ => "video"
      }
      assert(r.getString(1) == fmt)
      assert(r.getInt(3) > 0) // utf-8 payload: bytes ≥ chars, positive
    }
  }

  test("byte histogram feature vector: 16 bins, L1-normalized") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "zzzz")).toDF("id", "text")
      .select(col("id"),
        Multimodal.packMedia(col("text"), lit(0), lit(1)).as("media"))
      .select(col("id"), Multimodal.byteHistogram16(col("media")).as("hist"))
    val rows = df.orderBy("id").collect()
    rows.foreach { r =>
      val h = r.getAs[scala.collection.Seq[Double]]("hist")
      assert(h.length == 16)
      assert(math.abs(h.sum - 1.0) < 1e-9)
    }
    // 'abc' = 0x61 0x62 0x63 → all in bin 6
    assert(rows(0).getAs[scala.collection.Seq[Double]]("hist")(6) == 1.0)
  }

  test("frame sampling: every k-th index, capped") {
    import spark.implicits._
    val df = Seq(10, 1, 100).toDF("n")
      .select(col("n"), Multimodal.sampleFrameIndexes(col("n"), every = 3, cap = 5).as("idx"))
    val got = df.collect().map(r => r.getInt(0) -> r.getAs[scala.collection.Seq[Int]]("idx")).toMap
    assert(got(10) == Seq(0, 3, 6, 9))
    assert(got(1) == Seq(0))
    assert(got(100) == Seq(0, 3, 6, 9, 12))
  }
}
