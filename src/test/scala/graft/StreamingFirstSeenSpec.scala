package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FirstSeen
import graft.streaming.FirstSeen.KeyedEvent

/** Custom keyed state via flatMapGroupsWithState (streaming/FirstSeen):
  * first-seen admission with event-time TTL expiry — the crawl-frontier
  * recrawl gate, and the bounded-state form of streaming dedupe. The
  * MemoryStream harness drives the watermark batch by batch, so
  * suppression-while-live and re-admission-after-expiry are both pinned
  * deterministically. */
class StreamingFirstSeenSpec extends AnyFunSuite with SparkSuite {

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("admits first sighting, suppresses repeats, re-admits after TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val events = in.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent]
    val q = FirstSeen.firstSeenWithinTtl(events, ttlMs = 60 * 60000L) // 1 h TTL
      .writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      // batch 1: two sightings of u1 (later one suppressed in-batch), one u2
      in.addData(
        KeyedEvent("u1", ts(600), "a"), KeyedEvent("u1", ts(605), "b"),
        KeyedEvent("u2", ts(600), "c"))
      q.processAllAvailable()
      // batch 2: u1 again, 30 min later — state live, suppressed
      in.addData(KeyedEvent("u1", ts(630), "d"))
      q.processAllAvailable()
      // batch 3: unrelated key far in the future — advances the watermark
      // past u1's TTL horizon (600 + 60 = 660)
      in.addData(KeyedEvent("u3", ts(750), "e"))
      q.processAllAvailable()
      // batch 4: u1 re-arrives after expiry → re-admitted
      in.addData(KeyedEvent("u1", ts(760), "f"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("first_seen").as[FirstSeen.FirstHit].collect()
      .map(h => (h.key, h.ts.getTime / 60000L, h.payload)).toSet
    assert(got == Set(
      ("u1", 600L, "a"), // first sighting wins the in-batch tie by time
      ("u2", 600L, "c"),
      ("u3", 750L, "e"),
      ("u1", 760L, "f"))) // re-admitted: watermark passed 660 before batch 4
  }

  test("state for silent keys is evicted by the event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val events = in.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent]
    val q = FirstSeen.firstSeenWithinTtl(events, ttlMs = 10 * 60000L) // 10 min
      .writeStream.format("memory").queryName("first_seen_evict")
      .outputMode("append").start()
    try {
      in.addData(KeyedEvent("u1", ts(100), "a"))
      q.processAllAvailable()
      // advance the watermark far past u1's horizon with other keys; the
      // timeout callback removes u1's state even though u1 never returns
      in.addData(KeyedEvent("u2", ts(200), "b"))
      q.processAllAvailable()
      in.addData(KeyedEvent("u9", ts(300), "x"))
      q.processAllAvailable()
      // u1 reappears — admitted again because its state is GONE
      in.addData(KeyedEvent("u1", ts(301), "c"))
      q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress != null)
    } finally q.stop()
    import spark.implicits._
    val u1Rows = spark.table("first_seen_evict")
      .filter($"key" === "u1").count()
    assert(u1Rows == 2L)
  }
}
