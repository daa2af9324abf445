package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the
  * extension point for semantics Structured Streaming's built-ins can't
  * express (SURVEY §2.13).
  *
  * The operator: FIRST-SEEN WITH EXPIRY. Emit the first record per key;
  * suppress repeats while the key's state lives; a key arriving again
  * after `ttlMs` of EVENT time has passed the watermark is emitted again.
  * This is the crawl-frontier recrawl gate (the reference's CrawlDB keeps
  * a last-fetch time per URL fingerprint and refetches once the recrawl
  * interval elapses) and equally the production form of streaming dedupe:
  * `dropDuplicates` without a watermarked key column keeps state FOREVER
  * — at 100 TB/day of URLs that is an unbounded state store. Here state
  * is one timestamp per LIVE key, and the event-time timeout hands
  * eviction to the state store itself: memory is bounded by keys seen
  * within one TTL horizon, regardless of stream length.
  *
  * State-store scale notes: keys are hash-partitioned across
  * `spark.sql.shuffle.partitions` state stores (RocksDB-backed on a real
  * cluster via `spark.sql.streaming.stateStore.providerClass`), so state
  * is distributed exactly like any keyed aggregation; timeouts fire only
  * as the watermark advances, so eviction is deterministic on replay —
  * exactly-once across restarts like every stateful operator.
  */
object FirstSeen {

  /** (key, event time, payload) input; `payload` carries whatever the
    * caller packs (URL, digest, fetch metadata — serialize to one column). */
  final case class KeyedEvent(key: String, ts: Timestamp, payload: String)

  /** First (or first-after-expiry) sighting of a key. */
  final case class FirstHit(key: String, ts: Timestamp, payload: String)

  /** Per-key state: when the key was last admitted. */
  final case class SeenState(admittedTsMs: Long)

  /** `ds` MUST carry a watermark on `ts` (the event-time timeout clock is
    * the watermark). Emits in Append mode. */
  def firstSeenWithinTtl(ds: Dataset[KeyedEvent], ttlMs: Long): Dataset[FirstHit] = {
    implicit val stateEnc = Encoders.product[SeenState]
    implicit val outEnc = Encoders.product[FirstHit]
    implicit val strEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, FirstHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, events: Iterator[KeyedEvent], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            // watermark passed admittedTs + ttl with no live batch rows:
            // drop the state — the next arrival re-admits
            state.remove()
            Iterator.empty
          } else {
            // deterministic within-batch order (micro-batch iterator order
            // is not guaranteed): earliest event wins, ties by payload
            val evs = events.toVector.sortBy(e => (e.ts.getTime, e.payload))
            val wm = state.getCurrentWatermarkMs()
            // a key arriving WITH data after its TTL horizon must re-admit
            // even though the timeout callback never fired for it (groups
            // with live rows are invoked on the data path, not the timeout
            // path) — expiry is checked against the watermark, so the
            // decision is replay-deterministic
            val expired = state.exists && state.get.admittedTsMs + ttlMs <= wm
            val out =
              if (state.exists && !expired) {
                // live state: suppress; a repeat does NOT extend the TTL
                // (recrawl is due ttl after ADMISSION, not after the last
                // duplicate sighting)
                Iterator.empty
              } else {
                val first = evs.head
                state.update(SeenState(first.ts.getTime))
                Iterator.single(FirstHit(first.key, first.ts, first.payload))
              }
            // event-time timeouts must sit strictly above the watermark
            state.setTimeoutTimestamp(math.max(state.get.admittedTsMs + ttlMs, wm + 1))
            out
          }
      }
  }
}
