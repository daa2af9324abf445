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
  * State per key is a BOUNDED LIST (≤ [[MaxOpenIntervals]]) of
  * (start, last, count) interval summaries — events are folded in,
  * never buffered: a session of 10⁶ events costs the same state as a
  * session of 2. Holding a short list instead of one interval is what
  * makes LATE data correct in Append mode: an event that arrives a
  * batch later than both its neighbors (valid under the watermark
  * allowance) merges into the held interval — or bridges two held
  * intervals into one — instead of fragmenting the session into
  * unretractable early emissions.
  *
  * Closure is deterministic and watermark-disciplined: gap closes fire
  * as the watermark passes last + gap (event-time timeout — nothing
  * admissible can extend the interval once the watermark is past it,
  * so the emission is replay-exact); cap closes fire on the data path
  * the moment the bound is crossed. When intervals merge in bulk (a
  * late burst joining a held interval) a cap close can carry
  * n_events > maxEvents — the bound is a close TRIGGER, not a count
  * clamp. If a hostile key somehow accumulates more than
  * [[MaxOpenIntervals]] disjoint open intervals, the oldest is emitted
  * early ("gap") — bounded state wins over completeness on the
  * adversarial path, exactly like the cap rule itself.
  *
  * Same state-store scale notes as [[FirstSeen]]: keys hash-partition
  * across the shuffle-partition state stores, RocksDB-backed on a real
  * cluster.
  */
object SessionWindows {

  final case class SessionEvent(key: String, ts: Timestamp)

  /** One closed session. `closed_by` is "gap" (watermark passed
    * last + gap, or an over-[[MaxOpenIntervals]] eviction) or "cap"
    * (the maxEvents bound was crossed). */
  final case class ClosedSession(key: String, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, closed_by: String)

  /** One open interval: O(1) regardless of event count. */
  final case class SessState(startMs: Long, lastMs: Long, n: Long)

  /** Per-key open intervals, ascending by start, pairwise gaps > gap. */
  final case class SessStates(ivs: List[SessState])

  /** Bound on simultaneously-open intervals per key. Two suffice for
    * the realistic late-data shapes (one current + one straggler
    * island); 8 leaves margin without unbounding the state. */
  val MaxOpenIntervals = 8

  /** `ds` MUST carry a watermark on `ts`. Emits closed sessions in
    * Append mode; open sessions at stream end stay in state (emitted
    * once their gap timeout fires). */
  def sessionize(ds: Dataset[SessionEvent], gapMs: Long,
      maxEvents: Long): Dataset[ClosedSession] = {
    require(gapMs > 0 && maxEvents >= 1)
    implicit val stateEnc = Encoders.product[SessStates]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val strEnc = Encoders.STRING
    def close(key: String, s: SessState, why: String) = ClosedSession(
      key, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, why)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SessStates, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, events: Iterator[SessionEvent], state: GroupState[SessStates]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            // emit every interval the watermark has sealed; keep the rest
            val (done, still) = state.get.ivs.partition(_.lastMs + gapMs <= wm)
            if (still.isEmpty) state.remove()
            else {
              state.update(SessStates(still))
              state.setTimeoutTimestamp(
                math.max(still.map(_.lastMs).min + gapMs, wm + 1))
            }
            done.map(close(key, _, "gap")).iterator
          } else {
            // INTERVAL MERGE over (sorted batch events + held intervals):
            // sorting by start makes the gap test one-directional, so a
            // late event extends an interval backwards, bridges two held
            // intervals, or forms its own island — never a silent
            // mis-merge through a lastMs-only test
            val items =
              (events.map(e => SessState(e.ts.getTime, e.ts.getTime, 1)).toVector ++
                (if (state.exists) state.get.ivs.toVector else Vector.empty))
                .sortBy(iv => (iv.startMs, iv.lastMs))
            val closed = Vector.newBuilder[ClosedSession]
            var held = Vector.empty[SessState]
            var open: Option[SessState] = None
            def admit(iv: SessState): Unit =
              // cap-on-open: maxEvents = 1 (or a bulk interval at the
              // bound) closes on the data path like any other cap
              if (iv.n >= maxEvents) closed += close(key, iv, "cap")
              else open = Some(iv)
            items.foreach { iv =>
              open match {
                case Some(s) if iv.startMs - s.lastMs > gapMs =>
                  // a gap follows s — but only the WATERMARK can prove
                  // no admissible future event bridges it: hold s
                  held :+= s
                  admit(iv)
                case Some(s) =>
                  val grown = SessState(math.min(s.startMs, iv.startMs),
                    math.max(s.lastMs, iv.lastMs), s.n + iv.n)
                  open = None
                  admit(grown)
                case None =>
                  admit(iv)
              }
            }
            open.foreach(held :+= _)
            // emit what the watermark has already sealed…
            val (done, stillOpen) = held.partition(_.lastMs + gapMs <= wm)
            done.foreach(s => closed += close(key, s, "gap"))
            // …and bound the residue: evict oldest beyond the cap
            val over = stillOpen.length - MaxOpenIntervals
            val (evicted, kept) =
              if (over > 0) stillOpen.splitAt(over) else (Vector.empty[SessState], stillOpen)
            evicted.foreach(s => closed += close(key, s, "gap"))
            if (kept.nonEmpty) {
              state.update(SessStates(kept.toList))
              // event-time timeouts must sit strictly above the watermark
              state.setTimeoutTimestamp(
                math.max(kept.map(_.lastMs).min + gapMs, wm + 1))
            } else if (state.exists) state.remove()
            closed.result().iterator
          }
      }
  }
}
