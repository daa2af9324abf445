package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory frequency/quantile sketches. The reference meets "what
  * are the hot domains / who dominates the crawl" questions with full
  * sort-and-count MapReduce passes (rank steps, stats rollups); at 100 TB
  * a full `groupBy(key).count()` shuffles one row per DISTINCT key — for
  * URL-ish keys that is the corpus itself. A mergeable summary caps the
  * state at O(capacity) per partial aggregate: each mapper ships a
  * bounded sketch into the shuffle regardless of input size, the same
  * cost model as [[TopK]]'s bounded heap but for FREQUENCIES and RANKS
  * over an unbounded key space.
  *
  * Both aggregators keep MUTABLE buffers (hash map / flat double arrays)
  * mutated in place per row: the reduce path is the per-row hot loop of
  * a full-corpus scan, and an immutable-collection buffer measurably GC-
  * storms at a few million rows (observed: a11 at 3.7→12.6 s run-to-run
  * variance on 6M rows before this). Buffers cross the shuffle through
  * the kryo encoder — only at partial/final boundaries, O(capacity)
  * entries each.
  */
object Sketches {

  /** One reported heavy hitter; `count` is exact when capacity covered
    * the distinct keys, otherwise an under-estimate within n/(cap+1). */
  final case class Hitter(key: String, count: Long)

  /** The PODS'12 cut: subtract the (capacity+1)-th largest count from
    * every counter and drop the non-positive ones — ≤capacity survivors
    * by construction, error grows by ≤ the subtracted count. */
  private def mgPrune(a: scala.collection.mutable.HashMap[String, Long],
      capacity: Int): Unit =
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = List.newBuilder[String]
      a.foreachEntry { (k, c) =>
        if (c > cut) a.update(k, c - cut) else dead += k
      }
      dead.result().foreach(a.remove)
    }

  /** Misra–Gries (the SpaceSaving/"frequent" family), with the
    * summary-merge from Agarwal et al., "Mergeable Summaries" (PODS'12):
    * pointwise-add the two counter maps, then subtract the
    * (capacity+1)-th largest count from every counter and drop the
    * non-positive ones. Guarantees after any merge tree: every key with
    * true frequency > n/(capacity+1) is present, and each reported count
    * is an UNDER-estimate by at most n/(capacity+1). When `capacity` ≥
    * the number of distinct keys actually seen, no counter is ever
    * evicted and the counts are exact — which is what makes the a11
    * oracle a plain GROUP BY: the sketch is exercised end-to-end
    * (partial aggregation, shuffle of summaries, final merge) on a path
    * where its answer is provably the exact one. The error-bound regime
    * (capacity ≪ distinct) is pinned by SketchesSpec on skewed data. */
  private final class MisraGries(capacity: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Seq[Hitter]] {
    require(capacity > 0, s"bad capacity $capacity")
    private type Buf = scala.collection.mutable.HashMap[String, Long]

    override def zero: Buf = new Buf

    override def reduce(m: Buf, k: String): Buf = {
      if (k == null) return m // SQL aggregate convention: nulls don't count
      val cur = m.getOrElse(k, -1L)
      if (cur >= 0) m.update(k, cur + 1)
      else if (m.size < capacity) m.update(k, 1L)
      else {
        // classic MG step: a full map + an unseen key decrements every
        // counter (the unseen key's +1 and one unit of each counter
        // cancel); zeros vacate their slots. Amortized: each decrement
        // pass cancels capacity+1 increments.
        val dead = List.newBuilder[String]
        m.foreachEntry { (k2, c2) =>
          if (c2 > 1) m.update(k2, c2 - 1) else dead += k2
        }
        dead.result().foreach(m.remove)
      }
      m
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (b.isEmpty) return a
      if (a.isEmpty) return b
      b.foreachEntry { (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      Sketches.mgPrune(a, capacity)
      a
    }

    /** (count desc, key asc) — a deterministic report regardless of map
      * iteration order or merge tree shape. */
    override def finish(m: Buf): Seq[Hitter] =
      m.toSeq.map { case (k, c) => Hitter(k, c) }
        .sortBy(h => (-h.count, h.key))

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Hitter]] =
      ExpressionEncoder[Seq[Hitter]]()
  }

  /** Untyped aggregate column: `frequentItems(cap)(keyCol)` →
    * array<struct<key,count>> in (count desc, key asc) order. Runs as
    * ObjectHashAggregate with map-side partials — ≤cap counters per
    * partial cross the shuffle, never one row per distinct key. */
  def frequentItems(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(capacity))

  /** Re-aggregate PERSISTED sketch reports: input rows are (key, count)
    * hitters from earlier `frequentItems` runs (per day, per shard, per
    * micro-batch), output is the merged summary under the same PODS'12
    * rule — the daily→monthly rollup path, so heavy-hitter state can be
    * stored as plain rows and re-merged later without rescanning the
    * corpus. Exact when every input summary was exact and capacity
    * covers the union of keys; otherwise the merged error is the sum of
    * the parts' bounds (mergeability is what the PODS construction
    * buys). */
  private final class MisraGriesMerge(capacity: Int)
      extends Aggregator[Hitter, scala.collection.mutable.HashMap[String, Long], Seq[Hitter]] {
    require(capacity > 0, s"bad capacity $capacity")
    private type Buf = scala.collection.mutable.HashMap[String, Long]
    private val inner = new MisraGries(capacity)

    override def zero: Buf = new Buf
    // single-key inline of the PODS merge rule — the per-row hot loop of
    // a rollup over millions of persisted summary rows must not allocate
    // a map per row
    override def reduce(m: Buf, h: Hitter): Buf = {
      if (h == null || h.key == null) return m // null summaries don't count
      m.update(h.key, m.getOrElse(h.key, 0L) + h.count)
      Sketches.mgPrune(m, capacity)
      m
    }
    override def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
    override def finish(m: Buf): Seq[Hitter] = inner.finish(m)
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Hitter]] =
      ExpressionEncoder[Seq[Hitter]]()
  }

  /** Untyped aggregate column over struct<key:string,count:long> rows:
    * `mergeFrequent(cap)(hitterStruct)` → merged array<struct<key,count>>. */
  def mergeFrequent(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGriesMerge(capacity))

  /** KLL-style quantile state: level i holds items of weight 2^i in a
    * flat pre-sized double array (no per-row boxing). Public fields +
    * no-arg constructor for kryo. */
  final class QState(
      var levels: Array[Array[Double]],
      var sizes: Array[Int],
      var parities: Array[Boolean],
      var n: Long) {
    def this() = this(Array.empty, Array.empty, Array.empty, 0L)
  }

  /** KLL-style quantile sketch: a level past `capacity` items sorts,
    * keeps alternate items (the offset flips per compaction — the
    * deterministic stand-in for KLL's coin flip), and promotes them one
    * level up with doubled weight. Memory is O(capacity · log(n/capacity))
    * however large n grows; while n ≤ capacity nothing ever compacts and
    * the buffer IS the sorted sample, so answers are exact — the regime
    * the a12 oracle pins with a plain `quantile_disc`. The compaction
    * regime's rank error is spec-bounded empirically (SketchesSpec). */
  /** The KLL mechanics, shared by the direct aggregator and the
    * persisted-state merge aggregator. */
  private object Kll {
    def zero(capacity: Int): QState = {
      val s = new QState()
      s.levels = Array(new Array[Double](capacity + 1))
      s.sizes = Array(0)
      s.parities = Array(false)
      s
    }

    def ensureLevel(s: QState, capacity: Int, i: Int): Unit =
      if (i >= s.levels.length) {
        s.levels = s.levels :+ new Array[Double](capacity + 1)
        s.sizes = s.sizes :+ 0
        s.parities = s.parities :+ false
      }

    /** Append x to level i's array, growing past capacity+1 only
      * transiently during merges. */
    def push(s: QState, capacity: Int, i: Int, x: Double): Unit = {
      ensureLevel(s, capacity, i)
      if (s.sizes(i) >= s.levels(i).length)
        // reconstructed persisted states carry exact-size (possibly
        // empty) level arrays — doubling alone can't grow from 0
        s.levels(i) = java.util.Arrays.copyOf(
          s.levels(i), math.max(16, s.levels(i).length * 2))
      s.levels(i)(s.sizes(i)) = x
      s.sizes(i) += 1
    }

    def compactFrom(s: QState, capacity: Int, start: Int): Unit = {
      var i = start
      while (i < s.levels.length) {
        if (s.sizes(i) > capacity) {
          java.util.Arrays.sort(s.levels(i), 0, s.sizes(i))
          val offset = if (s.parities(i)) 1 else 0
          s.parities(i) = !s.parities(i)
          val sz = s.sizes(i)
          s.sizes(i) = 0
          var j = offset
          while (j < sz) { push(s, capacity, i + 1, s.levels(i)(j)); j += 2 }
          // level i is now empty; fall through to check i+1 next
        }
        i += 1
      }
    }

    def merge(a: QState, b: QState, capacity: Int): QState = {
      if (b.n == 0) return a
      if (a.n == 0) return b
      var i = 0
      while (i < b.levels.length) {
        var j = 0
        while (j < b.sizes(i)) { push(a, capacity, i, b.levels(i)(j)); j += 1 }
        ensureLevel(a, capacity, i)
        a.parities(i) = a.parities(i) ^ b.parities(i)
        i += 1
      }
      a.n += b.n
      compactFrom(a, capacity, 0)
      a
    }

    /** Value whose cumulative weight first reaches max(1, ceil(q·n)) over
      * the value-sorted weighted items — the SQL `quantile_disc`
      * convention (smallest value v with rank(v)/n ≥ q), exactly its
      * 0-based index ceil(q·n)−1 when all weights are 1. */
    def query(s: QState, probs: Seq[Double]): Seq[Double] = {
      if (s.n == 0) return probs.map(_ => Double.NaN)
      val total = s.sizes.sum
      val vals = new Array[Double](total)
      val wts = new Array[Long](total)
      var idx = 0
      var i = 0
      while (i < s.levels.length) {
        var j = 0
        while (j < s.sizes(i)) { vals(idx) = s.levels(i)(j); wts(idx) = 1L << i; idx += 1; j += 1 }
        i += 1
      }
      val order = (0 until total).sortBy(i => vals(i))
      probs.map { q =>
        val target = math.max(1L, math.ceil(q * s.n).toLong)
        var cum = 0L
        var ans = vals(order.last)
        var k = 0
        var found = false
        while (k < total && !found) {
          val o = order(k)
          cum += wts(o)
          if (cum >= target) { ans = vals(o); found = true }
          k += 1
        }
        ans
      }
    }
  }

  private final class KllQuantiles(capacity: Int, probs: Seq[Double])
      extends Aggregator[Option[Double], QState, Seq[Double]] {
    require(capacity > 1, s"bad capacity $capacity")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), s"bad probs $probs")
    override def zero: QState = Kll.zero(capacity)
    // Option input so a NULL arrives as None and is SKIPPED (the SQL
    // aggregate convention) — with a bare Double input type the encoder
    // silently deserializes NULL to 0.0, which would corrupt every
    // low quantile of a nullable column
    override def reduce(s: QState, x: Option[Double]): QState = {
      if (x.isEmpty) return s
      Kll.push(s, capacity, 0, x.get)
      s.n += 1
      if (s.sizes(0) > capacity) Kll.compactFrom(s, capacity, 0)
      s
    }
    override def merge(a: QState, b: QState): QState = Kll.merge(a, b, capacity)
    override def finish(s: QState): Seq[Double] = Kll.query(s, probs)
    override def bufferEncoder: Encoder[QState] = Encoders.kryo[QState]
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Untyped aggregate column: `quantiles(cap, probs)(valueCol)` →
    * array<double>, one entry per requested fraction. Same partial-
    * aggregation cost model as [[frequentItems]]: a bounded summary, not
    * the data, crosses the shuffle. */
  def quantiles(capacity: Int, probs: Seq[Double]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KllQuantiles(capacity, probs))

  /** Persisted quantile-sketch state: the weighted level buffers as
    * plain nested arrays (level i items carry weight 2^i; sizes are the
    * array lengths), storable per slice and re-mergeable later via
    * [[mergeQuantiles]]. */
  final case class QuantState(levels: Seq[Seq[Double]], parities: Seq[Boolean], n: Long)

  private final class KllState(capacity: Int)
      extends Aggregator[Option[Double], QState, QuantState] {
    require(capacity > 1, s"bad capacity $capacity")
    override def zero: QState = Kll.zero(capacity)
    override def reduce(s: QState, x: Option[Double]): QState = {
      if (x.isEmpty) return s
      Kll.push(s, capacity, 0, x.get)
      s.n += 1
      if (s.sizes(0) > capacity) Kll.compactFrom(s, capacity, 0)
      s
    }
    override def merge(a: QState, b: QState): QState = Kll.merge(a, b, capacity)
    override def finish(s: QState): QuantState =
      QuantState(
        (0 until s.levels.length).map(i => s.levels(i).take(s.sizes(i)).toSeq),
        s.parities.toSeq, s.n)
    override def bufferEncoder: Encoder[QState] = Encoders.kryo[QState]
    override def outputEncoder: Encoder[QuantState] =
      ExpressionEncoder[QuantState]()
  }

  private final class KllMergeQ(capacity: Int, probs: Seq[Double])
      extends Aggregator[QuantState, QState, Seq[Double]] {
    require(capacity > 1, s"bad capacity $capacity")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), s"bad probs $probs")
    override def zero: QState = Kll.zero(capacity)
    override def reduce(s: QState, st: QuantState): QState = {
      if (st == null || st.levels == null) return s // null states don't count
      val b = new QState(
        st.levels.map(_.toArray).toArray,
        st.levels.map(_.length).toArray,
        st.parities.toArray, st.n)
      Kll.merge(s, b, capacity)
    }
    override def merge(a: QState, b: QState): QState = Kll.merge(a, b, capacity)
    override def finish(s: QState): Seq[Double] = Kll.query(s, probs)
    override def bufferEncoder: Encoder[QState] = Encoders.kryo[QState]
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** `quantileState(cap)(valueCol)` → the persistable sketch state
    * (struct<levels:array<array<double>>,parities:array<boolean>,n:long>)
    * for later [[mergeQuantiles]] rollup. */
  def quantileState(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KllState(capacity))

  /** `mergeQuantiles(cap, probs)(levelsCol, paritiesCol, nCol)` over
    * persisted states → merged array<double> quantiles. Exact while no
    * slice compacted and the merged total stays ≤ capacity; otherwise
    * the usual KLL rank-error regime. */
  def mergeQuantiles(capacity: Int, probs: Seq[Double]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KllMergeQ(capacity, probs))

  // --------------------------------------------------------------------
  // KMV (k-minimum-values) distinct-count sketch — Beyer et al.,
  // "On Synopses for Distinct-Value Estimation Under Multiset
  // Operations" (SIGMOD'07). COUNT(DISTINCT url) at 100 TB is a shuffle
  // of one row per distinct key; the KMV summary caps shuffled state at
  // k hashes per partial regardless of input size. Two regimes:
  //  - k ≥ distinct keys seen: no hash is ever discarded, the set size
  //    IS the exact distinct count (modulo 64-bit collisions, absent at
  //    oracle scale) — the regime a14 pins against COUNT(DISTINCT).
  //  - overflow: the (k−1)/R estimator over the k-th smallest normalized
  //    hash R, relative error ~1/√(k−2), spec-bounded empirically.
  // Unlike MG/KLL, the KMV merge is EXACT in both regimes: the k
  // smallest hashes of a union are computable from the parts' k
  // smallest, so any merge tree yields bit-identical state to a
  // one-shot scan — pinned by SketchesSpec.

  /** Sorted flat array of the ≤k smallest SIGN-FLIPPED key hashes
    * (h ^ Long.MinValue, so signed order == unsigned hash order); `full`
    * is sticky once any distinct hash has been discarded (the moment
    * exactness is lost). Public fields + no-arg constructor for kryo. */
  final class KmvBuf(var hashes: Array[Long], var size: Int, var full: Boolean) {
    def this() = this(new Array[Long](16), 0, false)
  }

  /** Persisted sketch state: plain rows a user can store per day/shard
    * and re-merge later via [[mergeDistinct]] without rescanning. */
  final case class DistinctState(hashes: Seq[Long], full: Boolean)

  private object Kmv {
    def insert(s: KmvBuf, k: Int, h: Long): Unit = {
      val idx = java.util.Arrays.binarySearch(s.hashes, 0, s.size, h)
      if (idx >= 0) return // already present — distinctness is the point
      val ins = -idx - 1
      if (s.size < k) {
        if (s.size == s.hashes.length)
          s.hashes = java.util.Arrays.copyOf(s.hashes, math.min(k, s.hashes.length * 2))
        System.arraycopy(s.hashes, ins, s.hashes, ins + 1, s.size - ins)
        s.hashes(ins) = h
        s.size += 1
      } else {
        // a new distinct hash with the sketch at capacity: something is
        // discarded either way — exactness ends here
        s.full = true
        if (ins < k) {
          System.arraycopy(s.hashes, ins, s.hashes, ins + 1, k - ins - 1)
          s.hashes(ins) = h
        }
      }
    }

    def merge(a: KmvBuf, b: KmvBuf, k: Int): KmvBuf = {
      if (b.size == 0 && !b.full) return a
      if (a.size == 0 && !a.full) return b
      a.full ||= b.full
      var i = 0
      while (i < b.size) { insert(a, k, b.hashes(i)); i += 1 }
      a
    }

    /** Exact size below capacity; the SIGMOD'07 unbiased (k−1)/R
      * estimator past it, R = k-th smallest hash as a fraction of the
      * unsigned 64-bit space. */
    def estimate(s: KmvBuf, k: Int): Long =
      if (!s.full) s.size.toLong
      else {
        val raw = s.hashes(s.size - 1) ^ Long.MinValue // back to unsigned bits
        val frac = ((raw >>> 1).toDouble * 2.0 + (raw & 1L).toDouble) / 1.8446744073709552e19
        math.round((k - 1).toDouble / frac)
      }
  }

  private final class KmvDistinct(k: Int) extends Aggregator[String, KmvBuf, Long] {
    require(k > 1, s"bad k $k")
    override def zero: KmvBuf = new KmvBuf()
    override def reduce(s: KmvBuf, key: String): KmvBuf = {
      if (key == null) return s // COUNT(DISTINCT) ignores nulls
      Kmv.insert(s, k, graft.core.Murmur2.hash64(key) ^ Long.MinValue)
      s
    }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = Kmv.merge(a, b, k)
    override def finish(s: KmvBuf): Long = Kmv.estimate(s, k)
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private final class KmvState(k: Int) extends Aggregator[String, KmvBuf, DistinctState] {
    require(k > 1, s"bad k $k")
    override def zero: KmvBuf = new KmvBuf()
    override def reduce(s: KmvBuf, key: String): KmvBuf = {
      if (key == null) return s // COUNT(DISTINCT) ignores nulls
      Kmv.insert(s, k, graft.core.Murmur2.hash64(key) ^ Long.MinValue)
      s
    }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = Kmv.merge(a, b, k)
    override def finish(s: KmvBuf): DistinctState =
      DistinctState(s.hashes.take(s.size).toSeq, s.full)
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[DistinctState] =
      ExpressionEncoder[DistinctState]()
  }

  private final class KmvMerge(k: Int) extends Aggregator[DistinctState, KmvBuf, Long] {
    require(k > 1, s"bad k $k")
    override def zero: KmvBuf = new KmvBuf()
    override def reduce(s: KmvBuf, st: DistinctState): KmvBuf = {
      if (st == null || st.hashes == null) return s // null states don't count
      s.full ||= st.full
      st.hashes.foreach(h => Kmv.insert(s, k, h))
      s
    }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = Kmv.merge(a, b, k)
    override def finish(s: KmvBuf): Long = Kmv.estimate(s, k)
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Untyped aggregate column: `distinctCount(k)(keyCol)` → long
    * (approximate) distinct count; exact while k covers the distinct
    * keys. Bounded partials, never one shuffle row per distinct key. */
  def distinctCount(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvDistinct(k))

  /** `distinctState(k)(keyCol)` → struct<hashes:array<long>,full:boolean>
    * — the persistable sketch state for later [[mergeDistinct]] rollup. */
  def distinctState(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvState(k))

  /** `mergeDistinct(k)(hashesCol, fullCol)` over persisted states →
    * merged distinct-count long; bit-identical to a one-shot
    * [[distinctCount]] over the union (KMV merge is exact). */
  def mergeDistinct(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvMerge(k))

  /** |A ∩ B| from two persisted KMV states ALONE — the multiset
    * operation the SIGMOD'07 construction exists for: the overlap of two
    * corpus-scale key sets from two k-row summaries, no corpus join.
    * K = the k smallest hashes of K(A) ∪ K(B) is a valid KMV sketch of
    * A ∪ B; the fraction of K present in both input sketches estimates
    * the Jaccard similarity, and intersect ≈ jaccard · D̂(A∪B). Exact
    * while neither input overflowed and |A ∪ B| ≤ k — the regime the
    * a15 oracle pins. Scalar udf, cold path by construction: it runs on
    * summary PAIRS (a handful of rows), never per corpus row. */
  def intersectDistinct(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf {
      (ha: Seq[Long], fa: Boolean, hb: Seq[Long], fb: Boolean) =>
        val sa = ha.toArray
        val sb = hb.toArray // sorted ascending by construction
        // k smallest of the union (merge of two sorted runs), dedup'd
        val union = new Array[Long](math.min(k, sa.length + sb.length))
        var i = 0; var j = 0; var u = 0
        while (u < union.length && (i < sa.length || j < sb.length)) {
          val takeA = j >= sb.length || (i < sa.length && sa(i) <= sb(j))
          val h = if (takeA) sa(i) else sb(j)
          if (takeA) i += 1 else j += 1
          if (u == 0 || union(u - 1) != h) { union(u) = h; u += 1 }
        }
        val overflowed = fa || fb || i < sa.length || j < sb.length
        if (!overflowed) {
          // exact regime: the union list IS A ∪ B's hash set
          var both = 0; var t = 0
          while (t < u) {
            val h = union(t)
            if (java.util.Arrays.binarySearch(sa, h) >= 0 &&
                java.util.Arrays.binarySearch(sb, h) >= 0) both += 1
            t += 1
          }
          both.toLong
        } else {
          val raw = union(u - 1) ^ Long.MinValue
          val frac = ((raw >>> 1).toDouble * 2.0 + (raw & 1L).toDouble) / 1.8446744073709552e19
          val dUnion = (k - 1).toDouble / frac
          var both = 0; var t = 0
          while (t < u) {
            val h = union(t)
            if (java.util.Arrays.binarySearch(sa, h) >= 0 &&
                java.util.Arrays.binarySearch(sb, h) >= 0) both += 1
            t += 1
          }
          math.round(both.toDouble / u * dUnion)
        }
    }

  // --- exactly-replayable Bloom membership gate (a17) ----------------
  // The reference gates crawldb dedup work behind a 2^26-entry Bloom
  // over URL fingerprints (util/URLFPBloomFilter.java:46,68-96, applied
  // at CrawlDBMergingReducer.java:160-162,296 and
  // rank/GenDomainRankStep.java:65). The Spark-native state is the SET
  // OF SET BITS as rows — bounded by m regardless of corpus size,
  // mergeable by plain union (bitwise OR), and derived from md5 so the
  // filter — INCLUDING its false positives — replays bit-identically in
  // any engine. Probing is a bounded broadcast-able join, not an opaque
  // binary blob.

  /** The k md5-derived bit positions of a key (7 hex digits = 28 bits;
    * m must divide 2^28 for an exactly uniform modulo). */
  def bloomPositions(key: org.apache.spark.sql.Column, m: Int, k: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(m > 0 && (1 << 28) % m == 0, s"m=$m must divide 2^28")
    array((0 until k).map(i =>
      (conv(substring(md5(concat(lit(s"b$i:"), key).cast("binary")), 1, 7),
        16, 10).cast("long") % m)): _*)
  }

  /** Build the filter: distinct set-bit rows (≤ m, whatever the corpus
    * size). Slices built separately OR-merge by `union.distinct`. */
  def bloomBits(df: org.apache.spark.sql.DataFrame, key: String, m: Int, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(explode(bloomPositions(col(key), m, k)).as("bit")).distinct()
  }

  /** Probe candidates against the filter: a candidate is `in_bloom` iff
    * all k of its positions are set (no false negatives by
    * construction; false positives are the deterministic md5 ones). */
  def bloomProbe(bits: org.apache.spark.sql.DataFrame,
      cands: org.apache.spark.sql.DataFrame, key: String, m: Int, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // probe DISTINCT keys: duplicate candidate rows would pool 2k+
    // exploded positions under one key and break `count === k`
    val verdict = cands.select(col(key)).distinct()
      .select(col(key), explode(bloomPositions(col(key), m, k)).as("bit"))
      .join(bits.withColumn("hit", lit(1)), Seq("bit"), "left")
      .groupBy(col(key))
      .agg((count(col("hit")) === k).as("in_bloom"))
    cands.join(verdict, key)
  }

}
