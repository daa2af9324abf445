package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state #2: CAPPED SESSION WINDOWS.
  *
  * Structured Streaming's built-in `session_window` handles the plain
  * gap-merge case; the production sessionizer needs one more rule the
  * built-in cannot express: a session also CLOSES AT `maxEvents` — the
  * anti-hot-key bound. A bot user (or a misconfigured client) emitting
  * continuously within the gap keeps a built-in session open — and its
  * state growing — forever; capping closes and emits it, so per-key
  * state stays O(1) regardless of traffic shape. The same zipf-guard
  * instinct as ops.TopK, applied to streaming state.
  *
  * State per key is THREE LONGS (start, last, count) — events are folded
  * in, never buffered: a session of 10^6 events costs the same state as
  * a session of 2. Closure is deterministic: gap closes fire as the
  * watermark passes last + gap (event-time timeout, replay-exact); cap
  * closes fire on the data path the moment event `maxEvents` folds in.
  * Same state-store scale notes as [[FirstSeen]]: keys hash-partition
  * across the shuffle-partition state stores, RocksDB-backed on a real
  * cluster.
  */
object SessionWindows {

  final case class SessionEvent(key: String, ts: Timestamp)

  /** One closed session. `closed_by` is "gap" (watermark passed
    * last + gap) or "cap" (maxEvents folded in). */
  final case class ClosedSession(key: String, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, closed_by: String)

  /** Per-key open session: O(1) regardless of event count. */
  final case class SessState(startMs: Long, lastMs: Long, n: Long)

  /** `ds` MUST carry a watermark on `ts`. Emits closed sessions in
    * Append mode; an open session at stream end stays in state (emitted
    * once its gap timeout fires). */
  def sessionize(ds: Dataset[SessionEvent], gapMs: Long,
      maxEvents: Long): Dataset[ClosedSession] = {
    require(gapMs > 0 && maxEvents >= 1)
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val strEnc = Encoders.STRING
    def close(key: String, s: SessState, why: String) = ClosedSession(
      key, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, why)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, events: Iterator[SessionEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no live rows: the open
            // session is complete — emit and drop
            val s = state.get
            state.remove()
            Iterator.single(close(key, s, "gap"))
          } else {
            // INTERVAL MERGE over (sorted batch events + the open-state
            // interval), not a left fold over arrival order: a late but
            // watermark-valid event can precede the open session's START
            // (extend it backwards, or — past the gap — form its own
            // earlier session), which a lastMs-only gap test silently
            // swallows. Sorting by interval start makes the gap test
            // one-directional and handles both.
            val items =
              (events.map(e => SessState(e.ts.getTime, e.ts.getTime, 1)).toVector ++
                (if (state.exists) Vector(state.get) else Vector.empty))
                .sortBy(iv => (iv.startMs, iv.lastMs))
            val closed = Vector.newBuilder[ClosedSession]
            var open: Option[SessState] = None
            items.foreach { iv =>
              open match {
                case Some(s) if iv.startMs - s.lastMs > gapMs =>
                  // in-batch gap: the previous session closed before this
                  // item — emit it now rather than waiting for a timeout
                  closed += close(key, s, "gap")
                  if (iv.n >= maxEvents) closed += close(key, iv, "cap")
                  else open = Some(iv)
                case Some(s) =>
                  val grown = SessState(math.min(s.startMs, iv.startMs),
                    math.max(s.lastMs, iv.lastMs), s.n + iv.n)
                  if (grown.n >= maxEvents) {
                    closed += close(key, grown, "cap")
                    open = None
                  } else open = Some(grown)
                case None =>
                  // cap-on-open: maxEvents = 1 must close on the data
                  // path like any other cap, not idle until the gap
                  if (iv.n >= maxEvents) closed += close(key, iv, "cap")
                  else open = Some(iv)
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                // event-time timeouts must sit strictly above the watermark
                state.setTimeoutTimestamp(
                  math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
              case None =>
                if (state.exists) state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
