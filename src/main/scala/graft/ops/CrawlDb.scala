package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CrawlDB typed-union merge join + merged-record fold (SURVEY §2.3 J4,
  * §2.4 A1) — the reference's center of gravity: per URL key, fold a
  * heterogeneous stream of CRAWL_STATUS and LINK records into one merged
  * summary record.
  *
  * Reference semantics (CrawlDBMergingReducer.java:215-318):
  *   - records of different types arrive under one key (the composite
  *     CrawlDBKey) and are folded into a summary with per-type treatment;
  *   - counts (attempt_count, int/ext source counts), min/max dates
  *     (safeSetMinLongValue), latest-record-by-timestamp selection,
  *     bounded deduped sample lists (MAX_TYPE_SAMPLES=5,
  *     MAX_EXTERNALLY_REFERENCED_URLS=100, Bloom-deduped);
  *   - the reducer doubles as combiner, so the fold MUST be commutative /
  *     order-insensitive (JobBuilder.java:165-172).
  *
  * Spark-first design: instead of a sorted-reduce over a composite key, the
  * two typed streams are tag-unioned into one row shape and folded by a
  * single `groupBy(key)` of conditional aggregates — `count(when)`,
  * `min/max`, `max_by` (latest-by-timestamp), and
  * `slice(array_sort(collect_set))` for the bounded deduped samples. One
  * shuffle total, map-side partial aggregation for free, whole-stage
  * codegen throughout; no custom Aggregator object churn on the hot path.
  * Order-insensitivity is structural (every aggregate is commutative) and
  * proven by CrawlDbSpec with shuffled inputs, mirroring the reference's
  * model-based tests (CrawlDBMergingReducerTests.java:181-655).
  */
object CrawlDb {

  /** Max distinct type/rel samples kept per merged record
    * (reference MAX_TYPE_SAMPLES, CrawlDBMergingReducer.java:88). */
  val MaxTypeSamples = 5

  /** Max externally-referencing source samples kept per merged record
    * (reference MAX_EXTERNALLY_REFERENCED_URLS=100,
    * CrawlDBMergingReducer.java:95 — configurable here so the cap is
    * exercisable on small test data). */
  val MaxSrcSamples = 100

  /** Tag-union the status stream and the link stream into one row shape.
    *
    * `status` columns: key, status, priority, attempt_ts.
    * `links` columns: key, link_type, link_rel, link_date, link_src,
    * internal (same-root link?), qty.
    */
  def taggedUnion(status: DataFrame, links: DataFrame): DataFrame = {
    val nullS = lit(null).cast("string")
    val nullTs = lit(null).cast("timestamp")
    val nullL = lit(null).cast("long")
    val nullB = lit(null).cast("boolean")
    val nullD = lit(null).cast("double")
    val s = status.select(
      col("key"), lit("status").as("tag"),
      col("status"), col("priority"), col("attempt_ts"),
      nullS.as("link_type"), nullS.as("link_rel"), nullTs.as("link_date"),
      nullL.as("link_src"), nullB.as("internal"), nullD.as("qty"))
    val l = links.select(
      col("key"), lit("link").as("tag"),
      nullS.as("status"), nullS.as("priority"), nullTs.as("attempt_ts"),
      col("link_type"), col("link_rel"), col("link_date"),
      col("link_src"), col("internal"), col("qty"))
    s.unionByName(l)
  }

  /** The merged-record fold: one groupBy(key) over the tagged union.
    *
    * Latest-by-timestamp selection uses `max_by` over a CONTENT-DERIVED
    * ordinal string (zero-padded millis ‖ type/rel ‖ source) — input rows
    * are not uniquely numbered, so any residual tie in the ordinal implies
    * the selected value is identical too, making the result deterministic
    * under any input order. Sample lists are deduped, sorted, and capped,
    * with an explicit truncation flag (reference logs truncation at
    * DatabaseIndexV2.java:811-814).
    */
  def merge(status: DataFrame, links: DataFrame,
      maxTypeSamples: Int = MaxTypeSamples,
      maxSrcSamples: Int = MaxSrcSamples): DataFrame = {
    val u = taggedUnion(status, links)
    val isS = col("tag") === "status"
    val isL = col("tag") === "link"
    val typeAndRel = when(isL, concat(col("link_type"), lit("/"), col("link_rel")))
    // deterministic latest-link ordinal: equal ordinals ⇒ equal values
    val ord = coalesce(
      concat(
        lpad(unix_millis(col("link_date")).cast("string"), 15, "0"),
        lit("|"), typeAndRel,
        lit("|"), lpad(col("link_src").cast("string"), 12, "0")),
      lit(""))
    u.groupBy(col("key").as("url_key"))
      .agg(
        sum(when(isS, 1L).otherwise(0L)).as("attempt_count"),
        max(when(isS, col("status"))).as("status"),
        max(when(isS, col("priority"))).as("priority"),
        min(when(isS, col("attempt_ts"))).as("first_attempt"),
        max(when(isS, col("attempt_ts"))).as("latest_attempt"),
        sum(when(isL, 1L).otherwise(0L)).as("link_count"),
        sum(when(isL && col("internal"), 1L).otherwise(0L)).as("int_src_count"),
        sum(when(isL && !col("internal"), 1L).otherwise(0L)).as("ext_src_count"),
        min(when(isL, col("link_date"))).as("earliest_link_date"),
        max(when(isL, col("link_date"))).as("latest_link_date"),
        max_by(typeAndRel, ord).as("latest_link"),
        slice(array_sort(collect_set(typeAndRel)), 1, maxTypeSamples)
          .as("type_and_rels"),
        slice(array_sort(collect_set(when(isL, col("link_src")))), 1, maxSrcSamples)
          .as("src_samples"),
        (count_distinct(when(isL, col("link_src"))) > maxSrcSamples)
          .as("src_truncated"),
        sum(when(isL, col("qty")).otherwise(0.0)).as("sum_qty"),
      )
  }
}
