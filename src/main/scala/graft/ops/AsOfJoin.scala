package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every probe row, attach the build-side value
  * row with the greatest build `ts <= probe.ts` for the same key — the
  * time-series point-in-time lookup (probe a measurement against the most
  * recent state at that moment). The reference's time-series append log
  * (SURVEY §1.6; `crawlstats.jr` segment logs keyed by timestamp) is
  * exactly the build side of this join; Spark has no built-in as-of
  * operator, so it is composed from a tagged union + an ordered
  * carry-forward — no per-probe seek, no range predicate in a join
  * condition (which Catalyst would execute as a broadcast-nested-loop).
  *
  * Cost model: ONE shuffle of `probe ∪ build` on the key (plus a
  * per-partition sort) regardless of how many probes land between two
  * state changes. The windowed variant partitions by key only, so a
  * single key's whole history sorts in one task — fine when keys are
  * plentiful (users, hosts). For corpora where ONE key's history exceeds
  * a task (a hot domain's multi-year log), [[backwardBucketed]] splits
  * the timeline into fixed-width buckets: the big window runs per
  * (key, bucket), and only the per-bucket LAST states (one row per
  * key×bucket — O(active buckets), not O(rows)) go through the per-key
  * carry window. That is the repo's two-phase-rank discipline (local
  * work bounded by a chosen width + a small global fix-up) applied to
  * time instead of rank.
  *
  * Preconditions: the build side has at most one row per (key, ts) —
  * dedupe upstream (e.g. groupBy(key, ts).agg(max(...))) or the carried
  * value is ambiguous. Ties probe.ts == build.ts take the build row
  * (inclusive `<=`), matching pandas `merge_asof` and DuckDB `ASOF JOIN`.
  */
object AsOfJoin {

  private val SeqCol = "_asof_seq"
  private val BucketCol = "_asof_bucket"

  /** Tagged union: build rows (seq 0) sort before probe rows (seq 1) at
    * equal ts, making the carry-forward inclusive. Columns absent on one
    * side are null-padded with the other side's exact type. */
  private def taggedUnion(probe: DataFrame, build: DataFrame,
      key: String, ts: String): (DataFrame, Seq[String], Seq[String]) = {
    val pCols = probe.columns.toSeq.filterNot(c => c == key || c == ts)
    val vCols = build.columns.toSeq.filterNot(c => c == key || c == ts)
    val overlap = pCols.intersect(vCols)
    require(overlap.isEmpty, s"probe/build column collision: $overlap")
    def pad(df: DataFrame, own: Seq[String], other: DataFrame,
        missing: Seq[String], seq: Int): DataFrame =
      df.select(
        col(key) +: col(ts) +: lit(seq).as(SeqCol) +:
          (own.map(col) ++
            missing.map(c => lit(null).cast(other.schema(c).dataType).as(c))): _*)
    val u = pad(build, vCols, probe, pCols, 0)
      .unionByName(pad(probe, pCols, build, vCols, 1))
    (u, pCols, vCols)
  }

  /** One-shuffle as-of join; window partitioned by key alone. Output =
    * probe columns + build value columns (null when no state precedes). */
  def backward(probe: DataFrame, build: DataFrame,
      key: String, ts: String): DataFrame = {
    val (u, pCols, vCols) = taggedUnion(probe, build, key, ts)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(SeqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = vCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(SeqCol) === 1).drop(SeqCol)
      .select((key +: ts +: (pCols ++ vCols)).map(col): _*)
  }

  /** Scale variant: the heavy window runs per (key, bucket) — bucket =
    * floor(epoch-seconds / bucketWidthSec) — so no task ever sorts more
    * than one key's single bucket. Cross-bucket state is restored from a
    * per-bucket summary table (the LAST build state in each bucket,
    * carried forward across buckets per key), which is O(keys × active
    * buckets) rows, shuffled and windowed separately, then joined back on
    * (key, bucket). Exactly equal to [[backward]] on any input
    * (AsOfJoinSpec pins the equivalence). */
  def backwardBucketed(probe: DataFrame, build: DataFrame,
      key: String, ts: String, bucketWidthSec: Long): DataFrame = {
    val (u0, pCols, vCols) = taggedUnion(probe, build, key, ts)
    val u = u0.withColumn(BucketCol,
      floor(unix_timestamp(col(ts)) / lit(bucketWidthSec)))

    // Phase 1: carry-forward within (key, bucket) — bounded partitions.
    // The fill lands in SHADOW columns (originals stay for phase 2).
    val wLocal = Window.partitionBy(col(key), col(BucketCol))
      .orderBy(col(ts), col(SeqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = vCols.foldLeft(u) { (df, c) =>
      df.withColumn("_f_" + c, last(col(c), ignoreNulls = true).over(wLocal))
    }

    // Phase 2: per-bucket LAST build state. struct(ts, values…) under max()
    // picks the lexicographically-largest, i.e. the latest ts (build rows
    // are unique per (key, ts) by precondition); probe rows contribute
    // null which max() ignores.
    //
    // Cost model (deliberate): Catalyst plans this branch as a second
    // column-pruned, filter-pushed scan of the inputs with a MAP-SIDE
    // partial max — the only thing it shuffles is one partial struct per
    // (key, bucket), O(keys × active buckets). The O(rows) sort+shuffle
    // of the union happens exactly once, in phase 1. (Forcing this
    // branch through the phase-1 window output would dodge the rescan
    // but re-SORT the whole union per consumer above the reused
    // exchange — a worse trade at scale than a pruned scan.)
    val lastInBucket = local
      .groupBy(col(key), col(BucketCol))
      .agg(max(when(col(SeqCol) === 0,
        struct(col(ts) +: vCols.map(col): _*))).as("_last"))
    // Carry the last state across buckets per key: window over the SUMMARY
    // table only (rows = key × active buckets), excluding the current
    // bucket — a probe in bucket b with no in-bucket predecessor needs the
    // state from buckets < b.
    val wCarry = Window.partitionBy(col(key)).orderBy(col(BucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = lastInBucket
      .withColumn("_carry", last(col("_last"), ignoreNulls = true).over(wCarry))
      .select(col(key), col(BucketCol), col("_carry"))

    // Phase 3: probes missing an in-bucket state take the carried one.
    val joined = local.filter(col(SeqCol) === 1)
      .join(carry, Seq(key, BucketCol), "left")
    joined.select(col(key) +: col(ts) +: (pCols.map(col) ++
      vCols.map(c =>
        coalesce(col("_f_" + c), col("_carry").getField(c)).as(c))): _*)
  }

  /** The carry for incremental/streaming as-of: only the LAST build row
    * per key can influence any future probe, so a micro-batched ingest
    * keeps O(keys) state, not the log. Per time-ordered micro-batch i:
    * `out_i = backward(probe_i, carry ∪ build_i)` and
    * `carry' = lastStatePerKey(carry ∪ build_i)` — the union of `out_i`
    * equals the one-shot backward join over the whole log (AsOfJoinSpec
    * pins the equivalence). Same schema as `build`; struct-max picks the
    * greatest ts per key (build unique per (key, ts) by precondition). */
  def lastStatePerKey(build: DataFrame, key: String, ts: String): DataFrame = {
    val vCols = build.columns.toSeq.filterNot(c => c == key || c == ts)
    build.groupBy(col(key))
      .agg(max(struct(col(ts) +: vCols.map(col): _*)).as("_s"))
      .select(col(key) +:
        col("_s").getField(ts).as(ts) +:
        vCols.map(c => col("_s").getField(c).as(c)): _*)
  }

  /** Forward as-of join (earliest build `ts >= probe.ts`): the mirrored
    * carry, for "next state after" probes. */
  def forward(probe: DataFrame, build: DataFrame,
      key: String, ts: String): DataFrame = {
    val (u, pCols, vCols) = taggedUnion(probe, build, key, ts)
    val w = Window.partitionBy(col(key)).orderBy(col(ts).desc, col(SeqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = vCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(SeqCol) === 1).drop(SeqCol)
      .select((key +: ts +: (pCols ++ vCols)).map(col): _*)
  }
}
