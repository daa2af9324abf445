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

  /** KLL-style quantile buffer: level i holds items of weight 2^i; a
    * level past `capacity` items sorts, keeps alternate items (the
    * offset flips per compaction — the deterministic stand-in for KLL's
    * coin flip), and promotes them one level up. Memory is
    * O(capacity · log(n/capacity)) however large n grows; while
    * n ≤ capacity nothing ever compacts and the buffer IS the sorted
    * sample, so answers are exact — the regime the a12 oracle pins with
    * a plain `quantile_disc`. The compaction regime's rank error is
    * spec-bounded empirically (SketchesSpec). */
  final case class QBuf(levels: Seq[Seq[Double]], parities: Seq[Boolean], n: Long)

  private final class KllQuantiles(capacity: Int, probs: Seq[Double])
      extends Aggregator[Double, QBuf, Seq[Double]] {
    require(capacity > 1, s"bad capacity $capacity")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), s"bad probs $probs")

    override def zero: QBuf = QBuf(Vector(Vector.empty), Vector(false), 0L)

    private def compact(b: QBuf): QBuf = {
      var levels = b.levels.map(_.toVector).toVector
      var par = b.parities.toVector
      var i = 0
      while (i < levels.size) {
        if (levels(i).size > capacity) {
          val sorted = levels(i).sorted
          val offset = if (par(i)) 1 else 0
          par = par.updated(i, !par(i))
          val kept = sorted.zipWithIndex
            .collect { case (v, j) if j % 2 == offset => v }
          if (i + 1 >= levels.size) { levels = levels :+ Vector.empty; par = par :+ false }
          levels = levels.updated(i, Vector.empty[Double])
            .updated(i + 1, levels(i + 1) ++ kept)
          // don't advance: the promotion may have overflowed level i+1,
          // and re-checking the now-empty level i is free
        } else i += 1
      }
      QBuf(levels, par, b.n)
    }

    override def reduce(b: QBuf, x: Double): QBuf =
      compact(QBuf(b.levels.updated(0, b.levels(0) :+ x), b.parities, b.n + 1))

    override def merge(a: QBuf, b: QBuf): QBuf = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val h = math.max(a.levels.size, b.levels.size)
      def lv(q: QBuf, i: Int): Seq[Double] =
        if (i < q.levels.size) q.levels(i) else Vector.empty
      def pr(q: QBuf, i: Int): Boolean =
        i < q.parities.size && q.parities(i)
      val levels = (0 until h).map(i => (lv(a, i) ++ lv(b, i)).toVector).toVector
      val par = (0 until h).map(i => pr(a, i) ^ pr(b, i)).toVector
      compact(QBuf(levels, par, a.n + b.n))
    }

    /** Value whose cumulative weight first reaches max(1, ceil(q·n)) over
      * the value-sorted weighted items — the SQL `quantile_disc`
      * convention (smallest value v with rank(v)/n ≥ q), exactly its
      * 0-based index ceil(q·n)−1 when all weights are 1. */
    override def finish(b: QBuf): Seq[Double] = {
      if (b.n == 0) return probs.map(_ => Double.NaN)
      val items = b.levels.zipWithIndex
        .flatMap { case (lvl, i) => lvl.map(v => (v, 1L << i)) }
        .sortBy(_._1)
      probs.map { q =>
        val target = math.max(1L, math.ceil(q * b.n).toLong)
        var cum = 0L
        var ans = items.last._1
        val it = items.iterator
        var found = false
        while (it.hasNext && !found) {
          val (v, w) = it.next()
          cum += w
          if (cum >= target) { ans = v; found = true }
        }
        ans
      }
    }

    override def bufferEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Untyped aggregate column: `quantiles(cap, probs)(valueCol)` →
    * array<double>, one entry per requested fraction. Same partial-
    * aggregation cost model as [[frequentItems]]: a bounded summary, not
    * the data, crosses the shuffle. */
  def quantiles(capacity: Int, probs: Seq[Double]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KllQuantiles(capacity, probs))
}
