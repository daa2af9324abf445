package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE CUSUM drift alarms over a live hourly-count feed — the truly
  * incremental variant of st16 (SURVEY §2.13). The batch query (and its
  * serving-view streaming twin) recomputes Page's recursion over the
  * whole O(hours/type) state table per refresh, re-estimating μ from
  * the full series; production monitoring instead FREEZES calibration
  * on a reference window (μ, the drift allowance κ and the decision
  * band h become constants) and pushes each newly closed hour through
  * the recursion as it arrives. That makes the statistic a genuine
  * stream fold: two longs of state per event_type, carried by
  * `flatMapGroupsWithState` across micro-batches and restarts — no
  * growing table, no recompute, alarms emitted the micro-batch the
  * band is crossed.
  *
  * Same integer fixed-point as st16 so the two agree exactly under the
  * same calibration: s ← max(0, s + 4·nRef·x − 5·totalRef) (κ = μ/4),
  * alarm when s > 12·totalRef (h = 3μ).
  *
  * Scale shape: state is O(event types) — hash-partitioned across the
  * state stores like any keyed aggregation, trivially bounded. The
  * upstream feed is the watermark-closed hourly aggregate (one row per
  * (type, hour), append mode), so input volume is time-bounded too.
  */
object DriftAlarm {

  /** Frozen calibration from a reference window: its hour count and
    * total events (μ = totalRef / nRef, kept rational — never divided). */
  final case class Calibration(nRef: Long, totalRef: Long)

  /** One closed hour from the upstream hourly aggregate. */
  final case class HourCount(event_type: String, h_idx: Long, n: Long)

  /** The scanned statistic for one (type, hour). */
  final case class DriftStep(event_type: String, h_idx: Long, n: Long,
      cusum: Long, alarm: Boolean)

  /** Per-type fold state: the running statistic and the last hour
    * folded (late or duplicate hours are dropped — the upstream hourly
    * aggregate emits each hour exactly once, watermark-closed). */
  final case class DriftState(s: Long, lastH: Long)

  /** Fold a (streaming or batch) hourly feed through the frozen-
    * calibration CUSUM. Types absent from `calib` pass through with a
    * zero band (totalRef = 0) — every nonzero hour alarms, the fail-
    * loud choice for an unconfigured series. Emits in Append mode. */
  def online(ds: Dataset[HourCount],
      calib: Map[String, Calibration]): Dataset[DriftStep] = {
    implicit val stateEnc = Encoders.product[DriftState]
    implicit val outEnc = Encoders.product[DriftStep]
    implicit val strEnc = Encoders.STRING
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, DriftStep](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[HourCount], state: GroupState[DriftState]) =>
          val c = calib.getOrElse(key, Calibration(1L, 0L))
          var st = state.getOption.getOrElse(DriftState(0L, Long.MinValue))
          // micro-batch iterator order is not guaranteed: sort by hour
          // (bounded: hours per micro-batch, time-bounded upstream)
          val out = rows.toVector.sortBy(_.h_idx).flatMap { r =>
            if (r.h_idx <= st.lastH) None // duplicate/late closed hour
            else {
              val s2 = math.max(0L,
                st.s + 4L * c.nRef * r.n - 5L * c.totalRef)
              st = DriftState(s2, r.h_idx)
              Some(DriftStep(key, r.h_idx, r.n, s2, s2 > 12L * c.totalRef))
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
