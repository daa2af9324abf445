package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import scala.util.Random

import graft.ops.CrawlDb

/** Model-based merge tests in the style of the reference's
  * CrawlDBMergingReducerTests (randomized typed inputs, semantic equality
  * with an in-memory model, shuffled-input order-insensitivity). */
class CrawlDbSpec extends AnyFunSuite with SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def statusDf(rows: Seq[(Long, String, String, Timestamp)]): DataFrame = {
    import spark.implicits._
    rows.toDF("key", "status", "priority", "attempt_ts")
  }

  private def linksDf(rows: Seq[(Long, String, String, Timestamp, Long, Boolean, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("key", "link_type", "link_rel", "link_date", "link_src", "internal", "qty")
  }

  private val status = Seq(
    (1L, "O", "1-URGENT", ts("2020-01-01 00:00:00")),
    (2L, "F", "5-LOW", ts("2020-06-01 00:00:00")),
    (3L, "P", "2-HIGH", ts("2020-03-01 00:00:00")), // key 3 has no links
  )
  private val links = Seq(
    (1L, "A", "x", ts("2020-02-01 00:00:00"), 10L, true, 1.0),
    (1L, "B", "y", ts("2020-02-02 00:00:00"), 11L, false, 2.0),
    (1L, "B", "y", ts("2020-02-02 00:00:00"), 12L, false, 3.0), // tie date: src breaks it
    (1L, "C", "z", ts("2020-01-15 00:00:00"), 13L, true, 4.0),
    (1L, "D", "w", ts("2020-01-10 00:00:00"), 14L, false, 5.0), // 5 distinct srcs > cap 3
    (2L, "A", "x", ts("2020-05-01 00:00:00"), 20L, true, 6.0),
  )

  private def collectMerged(s: DataFrame, l: DataFrame): Seq[Row] =
    CrawlDb.withLatestLink(CrawlDb.merge(s, l, maxSrcSamples = 3))
      .orderBy("url_key").collect().toSeq

  test("merged record fold: counts, dates, latest-by-ts, capped samples") {
    val out = collectMerged(statusDf(status), linksDf(links))
    assert(out.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    val r1 = out(0)
    assert(r1.getAs[Long]("attempt_count") == 1L)
    assert(r1.getAs[Long]("link_count") == 5L)
    assert(r1.getAs[Long]("int_src_count") == 2L)
    assert(r1.getAs[Long]("ext_src_count") == 3L)
    assert(r1.getAs[Timestamp]("earliest_link_date") == ts("2020-01-10 00:00:00"))
    assert(r1.getAs[Timestamp]("latest_link_date") == ts("2020-02-02 00:00:00"))
    // tie on latest date between two B/y links → identical value selected
    assert(r1.getAs[String]("latest_link") == "B/y")
    assert(r1.getAs[scala.collection.Seq[String]]("type_and_rels") == Seq("A/x", "B/y", "C/z", "D/w"))
    // sorted distinct srcs capped at 3, truncation flagged
    assert(r1.getAs[scala.collection.Seq[Long]]("src_samples") == Seq(10L, 11L, 12L))
    assert(r1.getAs[Boolean]("src_truncated"))
    assert(r1.getAs[Double]("sum_qty") == 15.0)
    // key 3: status only — zero link stats, empty samples, no truncation
    val r3 = out(2)
    assert(r3.getAs[Long]("link_count") == 0L)
    assert(r3.getAs[String]("latest_link") == null)
    assert(r3.getAs[scala.collection.Seq[String]]("type_and_rels") == Seq())
    assert(!r3.getAs[Boolean]("src_truncated"))
  }

  test("fold is order-insensitive: shuffled + repartitioned inputs agree") {
    val base = collectMerged(statusDf(status), linksDf(links))
    val rnd = new Random(7)
    for (_ <- 1 to 3) {
      val s = statusDf(rnd.shuffle(status)).repartition(5)
      val l = linksDf(rnd.shuffle(links)).repartition(3)
      assert(collectMerged(s, l) == base)
    }
  }

  test("incremental combine == one-shot merge under any split") {
    val all = collectMerged(statusDf(status), linksDf(links))
    // split the raw streams three different ways; combine must be exact
    val splits = Seq[((Long, String, String, Timestamp)) => Boolean](
      _._1 == 1L, _._4.getTime % 2 == 0, _ => false)
    val lsplits = Seq[((Long, String, String, Timestamp, Long, Boolean, Double)) => Boolean](
      _._1 == 1L, _._4.getTime % 2 == 0, _ => true)
    splits.zip(lsplits).foreach { case (sp, lp) =>
      val oldDb = CrawlDb.merge(
        statusDf(status.filter(sp)), linksDf(links.filter(lp)), maxSrcSamples = 3)
      val delta = CrawlDb.merge(
        statusDf(status.filterNot(sp)), linksDf(links.filterNot(lp)), maxSrcSamples = 3)
      val combined = CrawlDb.withLatestLink(
        CrawlDb.combineMerged(oldDb, delta, maxSrcSamples = 3))
        .orderBy("url_key").collect().toSeq
      assert(combined == all)
    }
  }

  test("fold over testdata matches itself under input re-partitioning") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def run(shuffle: Boolean) = {
      val o = if (shuffle) orders.repartition(7) else orders
      val l = if (shuffle) li.repartition(9) else li
      CrawlDb.merge(
        o.select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"), col("o_orderdate").as("attempt_ts")),
        l.select(col("l_orderkey").as("key"), col("l_returnflag").as("link_type"),
          col("l_linestatus").as("link_rel"), col("l_shipdate").as("link_date"),
          col("l_partkey").as("link_src"), (col("l_returnflag") === "N").as("internal"),
          col("l_quantity").as("qty")),
        maxSrcSamples = 3,
      ).orderBy("url_key").collect().toSeq
    }
    assert(run(shuffle = true) == run(shuffle = false))
  }
}
