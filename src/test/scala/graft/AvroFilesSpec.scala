package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.AvroFiles

/** The Avro OCF bridge's contract: a real, foreign-readable Avro
  * container (schema in the header, deflate codec), lossless round
  * trip, and sane behavior on empty input and job re-run. */
class AvroFilesSpec extends AnyFunSuite with SparkSuite {

  // the Hadoop committer requires the job output dir to NOT pre-exist
  private def stage(): String =
    java.nio.file.Files.createTempDirectory("graft-avrospec-").toString + "/out"

  test("round trip preserves every (key, rec) pair") {
    import spark.implicits._
    val dir = stage()
    val in = (1L to 500L).map(i => (i, s"rec-$i-${"x" * (i % 37).toInt}"))
      .toDF("key", "rec")
    AvroFiles.write(in, dir)
    val back = AvroFiles.read(spark, dir).as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq == (1L to 500L).map(i => (i, s"rec-$i-${"x" * (i % 37).toInt}")))
  }

  test("shards are genuine Avro OCFs: header schema + deflate codec via the plain reader") {
    import spark.implicits._
    val dir = stage()
    AvroFiles.write(Seq((7L, "seven")).toDF("key", "rec").coalesce(1), dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val (name, codec, firstKey) = AvroFiles.describeShard(shard.getPath)
    assert(name == "graft.GraftRec")
    assert(codec == "deflate")
    assert(firstKey == 7L)
  }

  test("empty input writes a readable container that scans back empty") {
    import spark.implicits._
    val dir = stage()
    AvroFiles.write(Seq.empty[(Long, String)].toDF("key", "rec").repartition(2), dir)
    assert(AvroFiles.read(spark, dir).count() == 0L)
  }

  test("a job re-run into a fresh dir replaces the previous output cleanly") {
    import spark.implicits._
    // the committer protocol means a SUCCESSFUL write never mixes
    // attempts; the dir-per-run discipline (stage() in every query)
    // means re-runs never collide — assert the two runs are independent
    val d1 = stage(); val d2 = stage()
    AvroFiles.write(Seq((1L, "a")).toDF("key", "rec"), d1)
    AvroFiles.write(Seq((2L, "b")).toDF("key", "rec"), d2)
    assert(AvroFiles.read(spark, d1).select(sum("key")).head.getLong(0) == 1L)
    assert(AvroFiles.read(spark, d2).select(sum("key")).head.getLong(0) == 2L)
  }
}
