package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Deterministic weighted Bernoulli (Poisson) sampling: row kept iff
  * U60 < floor(2^60 · weight / denom), where U60 is the first 60 bits of
  * md5(salt:key) — inclusion probability min(1, weight/denom), expected
  * sample mass Σw/denom.
  *
  * Why this shape for a 100 TB corpus subsample (vs A-ES order
  * sampling, `key = u^(1/w)` + global top-k):
  *   - ZERO coordination: the keep decision reads one row — no global
  *     sort, no top-k state, no shuffle. The sample of a union is the
  *     union of samples; re-partitioning, re-runs, and incremental
  *     appends cannot change any row's fate (the reproducibility
  *     discipline of the repo's md5Bucket splits, extended to weights).
  *   - INTEGER-exact: the threshold is computed with the split-division
  *     identity floor(2^60·w/d) = (2^60 div d)·w + ((2^60 mod d)·w) div d
  *     (every intermediate < 2^63 when w·d < 2^63 — same trick as the
  *     PageRank damping arithmetic), then compared as fixed-width hex
  *     strings. No float pow/log whose last-ulp could flip a boundary
  *     row between engines — which is what makes the cu14 oracle an
  *     exact hash match, not a statistical one.
  *
  * Preconditions: weight ≥ 0 and weight·denom < 2^63 (longs);
  * weight ≥ denom ⇒ always kept (probability clamps at 1).
  */
object Sampling {

  val U60: Long = 1152921504606846976L // 2^60

  /** Adds boolean `outCol`: the deterministic keep decision.
    * `keyCol`/`weightCol`/`denomCol` name integral columns of `df`
    * (`denomCol` is typically a broadcast-joined corpus constant). */
  def weightedKeep(df: DataFrame, salt: String, keyCol: String,
      weightCol: String, denomCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, expr(s"""
      lpad(substring(md5(concat('$salt:', cast($keyCol as string))), 1, 15), 16, '0') <
      lpad(lower(hex(least(
        ($U60 div $denomCol) * $weightCol
          + (($U60 % $denomCol) * $weightCol) div $denomCol,
        $U60))), 16, '0')
    """.stripMargin))
}
