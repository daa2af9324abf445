package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CrawlDb

/** §2.13 incremental semantics, streaming form: the reference re-merges
  * each new segment batch against the previous merged DB
  * (CrawlDBMergeJob.java:290-295 feeds `latestFinalMergeTS` back as
  * input). The Spark-native equivalent is a file stream of link segments
  * driven through `foreachBatch`, each batch folded with `CrawlDb.merge`
  * and combined into the running state with `CrawlDb.combineMerged` —
  * whose semigroup property (see combineMerged's proof note) is exactly
  * what makes the incremental result equal the one-shot batch merge,
  * independent of how the stream is chopped into micro-batches. */
class StreamingMergeSpec extends AnyFunSuite with SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamed segment-by-segment merge == one-shot batch merge") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val status = (1L to 40L).map { k =>
      (k, Seq("O", "F", "P")(rnd.nextInt(3)), s"${rnd.nextInt(5)}-PRI",
        ts(f"2020-01-${rnd.nextInt(28) + 1}%02d 00:00:00"))
    }.toDF("key", "status", "priority", "attempt_ts")
    // qty as whole doubles: combineMerged adds across batches and float
    // addition must not drift vs the one-shot sum
    val links = (1 to 600).map { i =>
      (rnd.nextInt(40).toLong + 1L, Seq("A", "B", "C")(rnd.nextInt(3)),
        Seq("x", "y")(rnd.nextInt(2)),
        ts(f"2020-02-${rnd.nextInt(28) + 1}%02d 00:00:00"),
        rnd.nextInt(12).toLong, rnd.nextBoolean(), rnd.nextInt(10).toDouble)
    }.toDF("key", "link_type", "link_rel", "link_date", "link_src", "internal", "qty")

    val dir = java.nio.file.Files.createTempDirectory("linkseg").toString
    links.repartition(5).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val emptyLinks = links.limit(0)
    val emptyStatus = status.limit(0)
    // initial state: the previous merged DB (statuses merged, no links yet)
    var state: DataFrame = CrawlDb.merge(status, emptyLinks, maxSrcSamples = 5)
      .localCheckpoint(eager = true)

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // force several micro-batches
      .parquet(dir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val segMerged = CrawlDb.merge(emptyStatus, batch, maxSrcSamples = 5)
        // localCheckpoint bounds lineage growth across batches — the
        // production analog of writing each merge generation out
        state = CrawlDb.combineMerged(state, segMerged, maxSrcSamples = 5)
          .localCheckpoint(eager = true)
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()

    def canon(df: DataFrame) =
      df.orderBy("url_key").collect().toSeq.map(_.toString)
    val oneShot = CrawlDb.merge(status, links, maxSrcSamples = 5)
    assert(canon(state).nonEmpty)
    assert(canon(state) == canon(oneShot))
  }
}
