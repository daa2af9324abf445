package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ParquetFooter

/** Raw-bytes parquet footer walk refereed field-by-field by parquet-mr
  * reading the SAME files: row counts, row groups, column paths, types,
  * codecs, value counts, chunk byte sizes, created_by. Plus
  * malformation fuzz (never throws). */
class ParquetFooterSpec extends AnyFunSuite with SparkSuite {

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  private def check(dir: String): Unit = {
    val conf = new Configuration()
    partFiles(dir).foreach { f =>
      val bytes = Files.readAllBytes(f.toPath)
      val got = ParquetFooter.parse(bytes)
      assert(got != null, f.getName)
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf))
      try {
        val ref = rdr.getFooter
        assert(got.numRows == ref.getBlocks.asScala.map(_.getRowCount).sum)
        assert(got.createdBy == ref.getFileMetaData.getCreatedBy)
        val refLeaves = ref.getFileMetaData.getSchema.getColumns.asScala
          .map(_.getPath.mkString("."))
        assert(got.rowGroups.size == ref.getBlocks.size)
        got.rowGroups.zip(ref.getBlocks.asScala).foreach { case (g, b) =>
          assert(g.numRows == b.getRowCount)
          assert(g.totalByteSize == b.getTotalByteSize)
          val refCols = b.getColumns.asScala
          assert(g.columns.size == refCols.size)
          g.columns.zip(refCols).foreach { case (c, rc) =>
            assert(c.path == rc.getPath.toDotString)
            assert(ParquetFooter.TypeNames(c.typeId) ==
              rc.getPrimitiveType.getPrimitiveTypeName.name.toLowerCase
                .replace("binary", "byte_array"))
            assert(ParquetFooter.CodecNames(c.codecId) ==
              rc.getCodec.name.toLowerCase)
            assert(c.numValues == rc.getValueCount)
            assert(c.compressedBytes == rc.getTotalSize)
            assert(c.uncompressedBytes == rc.getTotalUncompressedSize)
          }
        }
        // schema leaves from the walk cover the reader's leaf NAMES
        assert(got.schemaLeafNames == refLeaves.map(_.split("\\.").last).toSeq)
      } finally rdr.close()
    }
  }

  test("walk == parquet-mr on a snappy table of mixed types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqfoot1").toString + "/t"
    (0 until 1000)
      .map(i => (i.toLong, s"name-$i", i * 0.5, i % 2 == 0))
      .toDF("id", "name", "score", "flag")
      .coalesce(1)
      .write.option("compression", "snappy").parquet(dir)
    check(dir)
  }

  test("walk == parquet-mr across codecs, partitions, nested schema") {
    import spark.implicits._
    for (codec <- Seq("gzip", "zstd", "uncompressed")) {
      val dir = Files.createTempDirectory(s"pqfoot-$codec").toString + "/t"
      (0 until 500)
        .map(i => (i.toLong, (s"k$i", i), Seq(i, i + 1)))
        .toDF("id", "pair", "arr")
        .repartition(3)
        .write.option("compression", codec).parquet(dir)
      check(dir)
    }
  }

  test("malformation: truncation and fuzz — null, never throws") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqfoot3").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1).write.parquet(dir)
    val bytes = Files.readAllBytes(partFiles(dir).head.toPath)
    assert(ParquetFooter.parse(null) == null)
    assert(ParquetFooter.parse(Array.empty[Byte]) == null)
    assert(ParquetFooter.parse("PAR1".getBytes("ISO-8859-1")) == null)
    // declared footer length lying past the file start
    val lie = bytes.clone()
    lie(bytes.length - 8) = 0xff.toByte
    lie(bytes.length - 7) = 0xff.toByte
    lie(bytes.length - 6) = 0xff.toByte
    lie(bytes.length - 5) = 0x7f.toByte
    assert(ParquetFooter.parse(lie) == null)
    val rnd = new scala.util.Random(40)
    for (_ <- 0 until 300) {
      ParquetFooter.parse(bytes.take(rnd.nextInt(bytes.length)))
      val mut = bytes.clone()
      // flip inside the footer region specifically
      val at = bytes.length - 9 - rnd.nextInt(200)
      mut(at) = rnd.nextInt(256).toByte
      ParquetFooter.parse(mut) // parse or null; never throws
    }
  }
}
