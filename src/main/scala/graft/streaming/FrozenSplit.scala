package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING frozen-split admission — the online twin of batch cu24
  * (`queries/CurationQueries.scala`): as document batches arrive, the
  * FIRST sighting of a near-dup cluster decides its train/heldout split
  * (the cu17/cu24 salted-md5 hash of the cluster representative) and
  * freezes that decision in keyed state; every later arrival in the
  * cluster inherits the frozen split — even when a cluster re-root has
  * changed the representative so a fresh hash WOULD assign differently
  * (`flipped` marks exactly those, the contamination the freeze
  * prevents: an eval doc silently migrating into train).
  *
  * This is a keyed-state problem with NO TTL: split assignments are
  * permanent for the life of the corpus, so state is one short string
  * per cluster ever admitted — O(clusters), the same cardinality the
  * batch path persists as its frozen table, distributed across the
  * state stores like any keyed aggregation and carried across restarts
  * by the checkpoint (exactly-once on replay). The upstream contract
  * matches cu24's anchor discipline: the caller keys arrivals by the
  * cluster's stable anchor, exactly as cu24's probe join resolves an
  * anchor before consulting the frozen table.
  */
object FrozenSplit {

  /** One arriving document: `cluster` is the stable anchor key, `rep`
    * the CURRENT cluster representative (what a fresh split would
    * hash — re-roots change it; the anchor does not). */
  final case class DocArrival(
      cluster: String, rep: String, docId: Long, ts: Timestamp)

  /** `frozen` = the split was inherited from earlier state rather than
    * decided by this row; `flipped` = a fresh hash of the CURRENT rep
    * would disagree with the frozen assignment. */
  final case class SplitDecision(
      docId: Long, cluster: String, split: String,
      frozen: Boolean, flipped: Boolean)

  /** Per-cluster state: the frozen assignment (public for the encoder's
    * generated code, like every state class in streaming/). */
  final case class SplitState(assigned: String)

  /** The cu17/cu24 split rule, byte-for-byte: first two hex chars of
    * md5("lsplit:" + rep) below "cc" → train (same salt, same
    * threshold as the batch bucketOf). */
  def splitOf(rep: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(("lsplit:" + rep).getBytes("UTF-8"))
    val b2 = f"${d(0) & 0xff}%02x".take(2)
    if (b2 < "cc") "train" else "heldout"
  }

  /** Append-mode admissions. Within a micro-batch the earliest event
    * (ties by doc_id) decides a never-seen cluster — deterministic on
    * replay, like every ordering decision in streaming/. */
  def admissions(ds: Dataset[DocArrival]): Dataset[SplitDecision] = {
    implicit val stateEnc = Encoders.product[SplitState]
    implicit val outEnc = Encoders.product[SplitDecision]
    implicit val strEnc = Encoders.STRING
    ds.groupByKey(_.cluster)
      .flatMapGroupsWithState[SplitState, SplitDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[DocArrival],
            state: GroupState[SplitState]) =>
          val evs = rows.toVector.sortBy(e => (e.ts.getTime, e.docId))
          val preExisting = state.exists
          val split =
            if (preExisting) state.get.assigned
            else {
              val s = splitOf(evs.head.rep)
              state.update(SplitState(s))
              s
            }
          evs.iterator.zipWithIndex.map { case (e, i) =>
            SplitDecision(e.docId, key, split,
              frozen = preExisting || i > 0,
              flipped = split != splitOf(e.rep))
          }
      }
  }
}
