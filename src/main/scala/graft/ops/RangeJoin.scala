package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-lookup join: probe points against [lo, hi] ranges (IP →
  * CIDR-block metadata, offset → archive member, timestamp → validity
  * window). Spark executes a raw `p BETWEEN lo AND hi` join condition as
  * BroadcastNestedLoopJoin — O(probes × ranges) comparisons, and a plain
  * nested loop when the range side outgrows the broadcast threshold. The
  * reference sidesteps the problem with sharded sorted files + binary
  * search (`DatabaseIndexV2.queryLinkDataByFP`'s seek+scan); the
  * Spark-native equivalent is bucket expansion:
  *
  *   - each range explodes into the fixed-width buckets it covers
  *     (`sequence(lo >> bits, hi >> bits)`), one row per (bucket, range);
  *   - each probe computes its single bucket (`p >> bits`);
  *   - an EQUI-join on the bucket key (hash shuffle or broadcast — the
  *     planner's choice, both codegen'd) + a residual `BETWEEN` filter.
  *
  * Cost: O(probes + Σ range_width/2^bits) join rows instead of the
  * nested-loop product. `bucketBits` trades expansion fan-out against
  * bucket selectivity: 2^bits ≈ median range width keeps the fan-out
  * near 1 row per range per bucket while a bucket rarely holds more
  * than a few ranges. Overlapping ranges are fine (a probe matches each
  * containing range once — the bucket equi-join gives one candidate per
  * (probe, covering range) pair, never duplicates). Negative points work:
  * `>>` is an arithmetic shift, i.e. floor division by 2^bits.
  */
object RangeJoin {

  private val ProbeBucket = "_rj_pb"
  private val RangeBucket = "_rj_rb"

  /** Inner interval join. `probe(pointCol)` and `ranges(loCol, hiCol)`
    * must be integral (cast upstream); output = probe columns + range
    * columns for every containing range. */
  def lookup(probe: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketBits: Int): DataFrame = {
    require(bucketBits >= 0 && bucketBits < 63, s"bad bucketBits $bucketBits")
    val expanded = ranges.withColumn(RangeBucket,
      explode(sequence(shiftright(col(loCol).cast("long"), bucketBits),
        shiftright(col(hiCol).cast("long"), bucketBits))))
    val p = probe.withColumn(ProbeBucket,
      shiftright(col(pointCol).cast("long"), bucketBits))
    p.join(expanded,
        col(ProbeBucket) === col(RangeBucket) &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(ProbeBucket, RangeBucket)
  }
}
