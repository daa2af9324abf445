package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory frequency sketches. The reference meets "what are the
  * hot domains / who dominates the crawl" questions with full
  * sort-and-count MapReduce passes (rank steps, stats rollups); at 100 TB
  * a full `groupBy(key).count()` shuffles one row per DISTINCT key — for
  * URL-ish keys that is the corpus itself. A mergeable heavy-hitters
  * summary caps the state at `capacity` counters per partial aggregate:
  * each mapper ships ≤capacity (key, count) pairs into the shuffle
  * regardless of input size, the same cost model as [[TopK]]'s bounded
  * heap but for FREQUENCIES over an unbounded key space.
  *
  * Algorithm: Misra–Gries (the SpaceSaving/"frequent" family), with the
  * summary-merge from Agarwal et al., "Mergeable Summaries" (PODS'12):
  * pointwise-add the two counter maps, then subtract the (capacity+1)-th
  * largest count from every counter and drop the non-positive ones.
  * Guarantees after any merge tree: every key with true frequency
  * > n/(capacity+1) is present, and each reported count is an
  * UNDER-estimate by at most n/(capacity+1). When `capacity` ≥ the number
  * of distinct keys actually seen, no counter is ever evicted and the
  * counts are exact — which is what makes the a11 oracle a plain
  * GROUP BY: the sketch is exercised end-to-end (partial aggregation,
  * shuffle of summaries, final merge) on a path where its answer is
  * provably the exact one. The error-bound regime (capacity ≪ distinct)
  * is pinned by SketchesSpec on adversarially skewed data.
  */
object Sketches {

  /** One reported heavy hitter; `count` is exact when capacity covered
    * the distinct keys, otherwise an under-estimate within n/(cap+1). */
  final case class Hitter(key: String, count: Long)

  private final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[Hitter]] {
    require(capacity > 0, s"bad capacity $capacity")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], k: String): Map[String, Long] =
      m.get(k) match {
        case Some(c) => m.updated(k, c + 1)
        case None if m.size < capacity => m.updated(k, 1L)
        case None =>
          // classic MG step: a full map + an unseen key decrements every
          // counter (the unseen key's +1 and one unit of each counter
          // cancel); zeros vacate their slots
          m.collect { case (k2, c2) if c2 > 1 => k2 -> (c2 - 1) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val s = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (s.size <= capacity) s
      else {
        // subtract the (capacity+1)-th largest count from everyone —
        // the mergeable-summaries rule; ≤capacity survivors by
        // construction, error grows by ≤ that count
        val cut = s.valuesIterator.toArray.sortBy(-_).apply(capacity)
        s.collect { case (k, c) if c > cut => k -> (c - cut) }
      }
    }

    /** (count desc, key asc) — a deterministic report regardless of map
      * iteration order or merge tree shape. */
    override def finish(m: Map[String, Long]): Seq[Hitter] =
      m.toSeq.map { case (k, c) => Hitter(k, c) }
        .sortBy(h => (-h.count, h.key))

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[Hitter]] =
      ExpressionEncoder[Seq[Hitter]]()
  }

  /** Untyped aggregate column: `frequentItems(cap)(keyCol)` →
    * array<struct<key,count>> in (count desc, key asc) order. Runs as
    * ObjectHashAggregate with map-side partials — ≤cap counters per
    * partial cross the shuffle, never one row per distinct key. */
  def frequentItems(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(capacity))
}
