package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FirstSeen
import graft.streaming.FirstSeen.KeyedEvent

/** Streaming frontier dedupe on the u6 CANONICAL key: the composition a
  * live crawl runs — tracking-param variants of one page collapse to
  * one canonical URL, and FirstSeen admits only the first sighting per
  * canon within the TTL. Pins the u6 canonicalizer as a streaming-safe
  * expression (pure column ops, no state of its own) and its parity
  * with the batch dedupe rollup. */
class StreamingCanonDedupeSpec extends AnyFunSuite with SparkSuite {

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("tracking-param variants collapse to one canonical admission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val events = in.toDS().toDF("url", "ts")
      .select(
        graft.queries.UrlQueries.canonicalizeTracking(col("url")).as("key"),
        col("ts"),
        col("url").as("payload"))
      .withWatermark("ts", "0 seconds")
      .as[KeyedEvent]
    val q = FirstSeen.firstSeenWithinTtl(events, ttlMs = 60 * 60000L)
      .writeStream.format("memory").queryName("canon_seen")
      .outputMode("append").start()
    try {
      in.addData(
        ("http://ex.com/p?utm_source=a&id=1", ts(600)),
        ("http://ex.com/p?id=1&utm_campaign=b", ts(605)), // same canon
        ("http://ex.com/p?gclid=g&id=2", ts(601)))        // different canon
      q.processAllAvailable()
      in.addData(
        ("http://ex.com/p?id=1#frag", ts(620)),           // same canon again
        ("http://ex.com/p?utm_source=z", ts(621)))        // query fully stripped
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("canon_seen").as[FirstSeen.FirstHit].collect()
      .map(h => (h.key, h.payload)).toSet
    assert(got == Set(
      ("http://ex.com/p?id=1", "http://ex.com/p?utm_source=a&id=1"),
      ("http://ex.com/p?id=2", "http://ex.com/p?gclid=g&id=2"),
      // all-tracking query canonicalizes to the bare path, no '?'
      ("http://ex.com/p", "http://ex.com/p?utm_source=z")))
    // batch parity: the same canonicalizer + groupBy admits the same set
    val batch = Seq(
        "http://ex.com/p?utm_source=a&id=1",
        "http://ex.com/p?id=1&utm_campaign=b",
        "http://ex.com/p?gclid=g&id=2",
        "http://ex.com/p?id=1#frag",
        "http://ex.com/p?utm_source=z").toDF("url")
      .select(graft.queries.UrlQueries.canonicalizeTracking(col("url"))
        .as("key"))
      .distinct().as[String].collect().toSet
    assert(batch == got.map(_._1))
  }
}
