package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionWindows
import graft.streaming.SessionWindows.{ClosedSession, SessionEvent}

/** Custom keyed state #2 (streaming/SessionWindows): capped session
  * windows — gap-merge like the built-in session_window, plus the
  * maxEvents close the built-in cannot express (the anti-hot-key bound:
  * per-key state is three longs no matter how many events fold in).
  * MemoryStream drives the watermark so gap closes, cap closes, and
  * in-batch splits are each pinned deterministically. */
class StreamingSessionSpec extends AnyFunSuite with SparkSuite {

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def run(gapMin: Int, cap: Long, lateMin: Int = 0)(
      feed: (MemoryStream[SessionEvent], org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[(String, Long, Long, Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val events = in.toDS()
      .withWatermark("ts", s"$lateMin minutes").as[SessionEvent]
    val name = s"sessions_${gapMin}_${cap}_$lateMin"
    val q = SessionWindows.sessionize(events, gapMs = gapMin * 60000L, maxEvents = cap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try feed(in, q) finally q.stop()
    spark.table(name).as[ClosedSession].collect()
      .map(s => (s.key, s.session_start.getTime / 60000L,
        s.session_end.getTime / 60000L, s.n_events, s.closed_by))
      .toSeq.sorted
  }

  test("gap close: the watermark passing last+gap emits the session") {
    val got = run(gapMin = 30, cap = 100) { (in, q) =>
      in.addData(SessionEvent("u1", ts(600)), SessionEvent("u1", ts(610)))
      q.processAllAvailable()
      // u2 far ahead advances the watermark past 610+30 → u1's session
      // closes by timeout; u2's own session stays open (no emission)
      in.addData(SessionEvent("u2", ts(700)))
      q.processAllAvailable()
      in.addData(SessionEvent("u3", ts(800)))
      q.processAllAvailable()
    }
    assert(got == Seq(
      ("u1", 600L, 610L, 2L, "gap"),
      ("u2", 700L, 700L, 1L, "gap")))
  }

  test("in-batch gap splits one batch into two sessions immediately") {
    val got = run(gapMin = 30, cap = 100) { (in, q) =>
      // one batch, one key: 600,610 then a 40-min hole then 650 — the
      // first session closes on the DATA path, no timeout needed
      in.addData(SessionEvent("u1", ts(600)), SessionEvent("u1", ts(610)),
        SessionEvent("u1", ts(650)))
      q.processAllAvailable()
    }
    assert(got == Seq(("u1", 600L, 610L, 2L, "gap")))
  }

  test("cap close: event maxEvents ends the session on the data path") {
    val got = run(gapMin = 30, cap = 3) { (in, q) =>
      in.addData(SessionEvent("bot", ts(600)), SessionEvent("bot", ts(601)),
        SessionEvent("bot", ts(602)), SessionEvent("bot", ts(603)),
        SessionEvent("bot", ts(604)))
      q.processAllAvailable()
      // the 2-event remainder (603, 604) is still open; close it by gap
      in.addData(SessionEvent("w", ts(700)))
      q.processAllAvailable()
      in.addData(SessionEvent("w2", ts(800)))
      q.processAllAvailable()
    }
    assert(got == Seq(
      ("bot", 600L, 602L, 3L, "cap"),
      ("bot", 603L, 604L, 2L, "gap"),
      ("w", 700L, 700L, 1L, "gap")))
  }

  test("a session spanning batches folds without buffering events") {
    val got = run(gapMin = 30, cap = 1000) { (in, q) =>
      in.addData(SessionEvent("u1", ts(600)))
      q.processAllAvailable()
      in.addData(SessionEvent("u1", ts(620)))
      q.processAllAvailable()
      in.addData(SessionEvent("u1", ts(645)))
      q.processAllAvailable()
      // silence + a watermark push past 645+30
      in.addData(SessionEvent("z", ts(700)))
      q.processAllAvailable()
      in.addData(SessionEvent("z2", ts(800)))
      q.processAllAvailable()
    }
    assert(got == Seq(
      ("u1", 600L, 645L, 3L, "gap"),
      ("z", 700L, 700L, 1L, "gap")))
  }

  test("maxEvents = 1 closes every session by cap on the data path") {
    val got = run(gapMin = 30, cap = 1) { (in, q) =>
      in.addData(SessionEvent("u1", ts(600)), SessionEvent("u1", ts(610)))
      q.processAllAvailable()
    }
    // no timeout churn, no 'gap' label: each event is its own capped
    // session the moment it arrives
    assert(got == Seq(
      ("u1", 600L, 600L, 1L, "cap"),
      ("u1", 610L, 610L, 1L, "cap")))
  }

  test("a late event before the open session's start extends it backwards") {
    val got = run(gapMin = 30, cap = 100, lateMin = 120) { (in, q) =>
      in.addData(SessionEvent("u1", ts(600)))
      q.processAllAvailable()
      // 590 is watermark-valid (120-min allowance) and within gap of the
      // session's START — session_start must move back, not stay at 600
      in.addData(SessionEvent("u1", ts(590)))
      q.processAllAvailable()
      in.addData(SessionEvent("z", ts(800)))
      q.processAllAvailable()
      in.addData(SessionEvent("z2", ts(1000)))
      q.processAllAvailable()
    }
    assert(got.contains(("u1", 590L, 600L, 2L, "gap")),
      s"late merge lost/mislabeled: $got")
  }

  test("a late event a full gap before the open session forms its own session") {
    val got = run(gapMin = 30, cap = 100, lateMin = 120) { (in, q) =>
      in.addData(SessionEvent("u2", ts(600)))
      q.processAllAvailable()
      // 500 is watermark-valid but 500+30 < 600: a separate EARLIER
      // session — it must close immediately, not fold into 600's
      in.addData(SessionEvent("u2", ts(500)))
      q.processAllAvailable()
      in.addData(SessionEvent("z", ts(800)))
      q.processAllAvailable()
      in.addData(SessionEvent("z2", ts(1000)))
      q.processAllAvailable()
    }
    assert(got.contains(("u2", 500L, 500L, 1L, "gap")), s"earlier session lost: $got")
    assert(got.contains(("u2", 600L, 600L, 1L, "gap")), s"open session corrupted: $got")
  }

  test("a bridging late event merges a held island instead of fragmenting") {
    val got = run(gapMin = 30, cap = 100, lateMin = 120) { (in, q) =>
      in.addData(SessionEvent("u3", ts(600)))
      q.processAllAvailable()
      // 500 forms a held earlier island (an eager emit here could never
      // be joined by a later bridge — the fragmentation regression)
      in.addData(SessionEvent("u3", ts(500)))
      q.processAllAvailable()
      // 520 is watermark-valid and within gap of 500: ONE session
      // [500, 520] must come out, not two singleton fragments
      in.addData(SessionEvent("u3", ts(520)))
      q.processAllAvailable()
      in.addData(SessionEvent("z", ts(900)))
      q.processAllAvailable()
      in.addData(SessionEvent("z2", ts(1100)))
      q.processAllAvailable()
    }
    assert(got.contains(("u3", 500L, 520L, 2L, "gap")),
      s"late island fragmented: $got")
    assert(!got.exists(r => r._1 == "u3" && r._4 == 1L && r._2 == 500L),
      s"singleton fragment emitted: $got")
  }

  test("over-MaxOpenIntervals keys evict the oldest island, state stays bounded") {
    // 10 disjoint islands, newest-first arrival so every one is held
    // (nothing watermark-sealed): the two oldest must be evicted on the
    // data path, the rest emitted once the watermark seals them
    val got = run(gapMin = 1, cap = 100, lateMin = 10000) { (in, q) =>
      for (i <- 9 to 0 by -1) {
        in.addData(SessionEvent("k", ts(1000 + 10 * i)))
        q.processAllAvailable()
      }
      in.addData(SessionEvent("z", ts(30000)))
      q.processAllAvailable()
      in.addData(SessionEvent("z2", ts(60000)))
      q.processAllAvailable()
    }
    val k = got.filter(_._1 == "k")
    assert(k.length == 10, s"every island must eventually emit once: $k")
    assert(k.map(_._2).distinct.length == 10, s"duplicate emissions: $k")
  }
}
