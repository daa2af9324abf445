package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite with SparkSuite {

  /** Zipf-ish stream: key i appears ~N/i times — a few giants, a long
    * tail far wider than the sketch capacity. */
  private def skewed(n: Int, keys: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      val k = math.min(keys - 1, (1.0 / math.max(u, 1e-9) - 1).toInt)
      s"k$k"
    }
  }

  /** The a20 Count-Min lattice: cell = md5-derived column per row salt
    * (the query's exact hash), state = groupBy(r, c) counts. */
  private def cmCells(df: org.apache.spark.sql.DataFrame, d: Int, w: Int) =
    df.select(explode(array((0 until d).map(lit): _*)).as("r"), col("k"))
      .select(col("r"),
        (conv(substring(md5(concat(col("r").cast("string"), lit(":"), col("k"))),
          1, 7), 16, 10).cast("long") % w).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cell_cnt"))

  test("count-min: est >= exact for EVERY key; state partition-invariant") {
    import spark.implicits._
    val data = skewed(20000, 500, 13)
    val df = data.toDF("k")
    val cells = cmCells(df, 3, 64).as[(Int, Long, Long)].collect()
      .map { case (r, c, n) => (r, c) -> n }.toMap
    // merge/partitioning invariance: the state is one commutative SUM
    val cells7 = cmCells(df.repartition(7), 3, 64).as[(Int, Long, Long)]
      .collect().map { case (r, c, n) => (r, c) -> n }.toMap
    assert(cells == cells7)
    // the one-sided CM guarantee, checked exhaustively (not just probes)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def cellOf(r: Int, k: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$k".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    var over = 0
    truth.foreach { case (k, exact) =>
      val est = (0 until 3).map(r => cells((r, cellOf(r, k)))).min
      assert(est >= exact, s"CM underestimated $k: $est < $exact")
      if (est > exact) over += 1
    }
    // 500 keys over 192 cells: collisions must actually occur
    assert(over > 0, "overestimate regime vacuous — no collisions at all")
  }

  test("exact when capacity covers the distinct keys, any partitioning") {
    import spark.implicits._
    val data = skewed(20000, 50, 42)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 7)) {
      val got = data.toDF("k").repartition(parts)
        .agg(Sketches.frequentItems(64)(col("k")).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key"), col("h.count"))
        .as[(String, Long)].collect().toMap
      assert(got == truth, s"parts=$parts")
    }
  }

  test("eviction regime: guarantees hold with capacity << distinct") {
    import spark.implicits._
    val n = 60000
    val cap = 16
    val data = skewed(n, 5000, 7)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bound = n.toLong / (cap + 1)

    val got = data.toDF("k").repartition(8)
      .agg(Sketches.frequentItems(cap)(col("k")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"))
      .as[(String, Long)].collect().toMap

    assert(got.size <= cap)
    // every key with true frequency > n/(cap+1) survives every merge
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(got.contains(k), s"heavy key $k evicted")
    }
    // counts under-estimate by at most n/(cap+1)
    got.foreach { case (k, c) =>
      val t = truth(k)
      assert(c <= t, s"$k over-counted: $c > $t")
      assert(t - c <= bound, s"$k error ${t - c} exceeds bound $bound")
    }
  }

  test("report order is deterministic: (count desc, key asc)") {
    import spark.implicits._
    val data = Seq("b", "a", "a", "c", "b", "d").toDF("k")
    val out = data.agg(Sketches.frequentItems(8)(col("k")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count")).as[(String, Long)].collect().toSeq
    assert(out == Seq("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("rollup: merged per-slice summaries == one-shot sketch (exact regime)") {
    import spark.implicits._
    val data = skewed(30000, 40, 13).zipWithIndex
      .map { case (k, i) => (i % 6, k) } // 6 "days"
    val df = data.toDF("day", "k")
    val oneShot = df.agg(Sketches.frequentItems(64)($"k").as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.key", $"h.count").as[(String, Long)].collect().toMap
    val rolled = df.groupBy($"day")
      .agg(Sketches.frequentItems(64)($"k").as("hh"))
      .select(explode($"hh").as("h"))
      .agg(Sketches.mergeFrequent(64)($"h.key", $"h.count").as("m"))
      .select(explode($"m").as("h"))
      .select($"h.key", $"h.count").as[(String, Long)].collect().toMap
    assert(rolled == oneShot)
  }

  test("rollup: lossy per-slice summaries still meet the merged bound") {
    import spark.implicits._
    val n = 60000
    val cap = 16
    val data = skewed(n, 5000, 21).zipWithIndex.map { case (k, i) => (i % 4, k) }
    val truth = data.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    // error composes: each of the 4 slice sketches under-counts by at most
    // n_slice/(cap+1), the merge adds its own cut — total ≤ n/(cap+1)·2
    val bound = 2L * n / (cap + 1)
    val rolled = data.toDF("day", "k").groupBy($"day")
      .agg(Sketches.frequentItems(cap)($"k").as("hh"))
      .select(explode($"hh").as("h"))
      .agg(Sketches.mergeFrequent(cap)($"h.key", $"h.count").as("m"))
      .select(explode($"m").as("h"))
      .select($"h.key", $"h.count").as[(String, Long)].collect().toMap
    assert(rolled.size <= cap)
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(rolled.contains(k), s"heavy key $k lost in rollup")
    }
    rolled.foreach { case (k, c) =>
      assert(c <= truth(k), s"$k over-counted after rollup")
      assert(truth(k) - c <= bound, s"$k rollup error exceeds $bound")
    }
  }

  test("quantile rollup: merged per-slice states == one-shot (exact regime), bounded when compacting") {
    import spark.implicits._
    // exact: 3000 values in 6 slices through cap 4096 — no compaction
    // anywhere, so the rollup must equal the one-shot sketch exactly
    val rnd = new scala.util.Random(23)
    val vals = (1 to 3000).map(_ => rnd.nextDouble() * 1e6)
    val sliced = vals.zipWithIndex.map { case (v, i) => (i % 6, v) }
    val probs = Seq(0.1, 0.5, 0.9)
    val oneShot = vals.toDF("x")
      .agg(Sketches.quantiles(4096, probs)(col("x")).as("q"))
      .as[Seq[Double]].collect().head
    val rolled = sliced.toDF("day", "x").groupBy(col("day"))
      .agg(Sketches.quantileState(4096)(col("x")).as("qs"))
      .agg(Sketches.mergeQuantiles(4096, probs)(
        col("qs.levels"), col("qs.parities"), col("qs.n")).as("q"))
      .as[Seq[Double]].collect().head
    assert(rolled == oneShot)

    // compaction regime: 80k values, cap 128, 8 slices — the rolled-up
    // answer must stay within a small rank error of the true quantile
    val big = (1 to 80000).map(_ => rnd.nextDouble())
    val bigSliced = big.zipWithIndex.map { case (v, i) => (i % 8, v) }
    val sorted = big.sorted
    val got = bigSliced.toDF("day", "x").repartition(8).groupBy(col("day"))
      .agg(Sketches.quantileState(128)(col("x")).as("qs"))
      .agg(Sketches.mergeQuantiles(128, probs)(
        col("qs.levels"), col("qs.parities"), col("qs.n")).as("q"))
      .as[Seq[Double]].collect().head
    probs.zip(got).foreach { case (q, v) =>
      val rank = sorted.count(_ <= v).toDouble / big.size
      assert(math.abs(rank - q) < 0.06,
        s"rolled q=$q reported value at rank $rank")
    }
  }

  test("quantiles: exact (quantile_disc lower rank) while n <= capacity") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = (1 to 3000).map(_ => rnd.nextInt(100000).toDouble)
    val sorted = data.sorted
    val probs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    // SQL quantile_disc rank: smallest value with rank/n >= q
    val want = probs.map(q =>
      sorted(math.max(1, math.ceil(q * data.size).toInt) - 1))
    for (parts <- Seq(1, 8)) {
      val got = data.toDF("x").repartition(parts)
        .agg(Sketches.quantiles(4096, probs)(col("x")).as("qs"))
        .as[Seq[Double]].collect().head
      assert(got == want, s"parts=$parts")
    }
  }

  test("quantiles: compaction regime stays within a small rank error") {
    import spark.implicits._
    val n = 100000
    val cap = 256
    val rnd = new scala.util.Random(5)
    val data = (1 to n).map(_ => rnd.nextDouble())
    val sorted = data.sorted.toArray
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = data.toDF("x").repartition(16)
      .agg(Sketches.quantiles(cap, probs)(col("x")).as("qs"))
      .as[Seq[Double]].collect().head
    probs.zip(got).foreach { case (q, v) =>
      // true rank of the reported value vs requested rank, as a fraction
      val rank = sorted.count(_ <= v).toDouble / n
      assert(math.abs(rank - q) < 0.05,
        s"q=$q reported value at rank $rank (err ${math.abs(rank - q)})")
    }
  }

  test("quantiles: bounded buffer — state stays O(cap log n), not O(n)") {
    import spark.implicits._
    // 200k rows through a cap-128 sketch in one partition: if the buffer
    // accumulated O(n) this would blow far past 128*levels
    val got = (1 to 200000).map(_.toDouble).toDF("x").coalesce(1)
      .agg(Sketches.quantiles(128, Seq(0.5))(col("x")).as("qs"))
      .as[Seq[Double]].collect().head
    assert(math.abs(got.head / 200000.0 - 0.5) < 0.05)
  }

  test("runs as ObjectHashAggregate with partial merge, no sort-based fallback") {
    import spark.implicits._
    val plan = skewed(2000, 100, 3).toDF("k").repartition(4)
      .agg(Sketches.frequentItems(64)(col("k")).as("hh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("kmv: exact == COUNT(DISTINCT) while k covers the keys, any partitioning") {
    import spark.implicits._
    val data = skewed(20000, 300, 5)
    val truth = data.distinct.size.toLong
    for (parts <- Seq(1, 9)) {
      val got = data.toDF("k").repartition(parts)
        .agg(Sketches.distinctCount(512)(col("k")).as("d"))
        .as[Long].collect().head
      assert(got == truth, s"parts=$parts: $got != $truth")
    }
  }

  test("kmv: overflow estimate within the ~1/sqrt(k-2) error envelope") {
    import spark.implicits._
    // ~39k distinct keys through a k=256 sketch: expected relative
    // standard error 1/sqrt(254) ~ 6.3%; assert a generous 4-sigma band
    val n = 60000
    val data = (0 until n).map(i => s"u${i % 39000}")
    val truth = data.distinct.size.toDouble
    val got = data.toDF("k").repartition(8)
      .agg(Sketches.distinctCount(256)(col("k")).as("d"))
      .as[Long].collect().head
    val relErr = math.abs(got - truth) / truth
    assert(relErr < 0.25, s"relative error $relErr (got $got, truth $truth)")
  }

  test("kmv: persisted-state rollup is bit-identical to a one-shot scan") {
    import spark.implicits._
    // the KMV merge is exact in BOTH regimes: the k smallest hashes of a
    // union are computable from the parts' k smallest — so per-slice
    // states re-merged later must equal the one-shot estimate exactly,
    // even deep in overflow (k=64 over ~20k distinct)
    val data = skewed(50000, 40000, 17).zipWithIndex
      .map { case (k, i) => (i % 5, k) }
    val oneShot = data.toDF("day", "k")
      .agg(Sketches.distinctCount(64)(col("k")).as("d"))
      .as[Long].collect().head
    val rolled = data.toDF("day", "k").groupBy(col("day"))
      .agg(Sketches.distinctState(64)(col("k")).as("st"))
      .agg(Sketches.mergeDistinct(64)(col("st.hashes"), col("st.full")).as("d"))
      .as[Long].collect().head
    assert(rolled == oneShot)
  }

  test("null inputs are skipped, the SQL aggregate convention — never counted, never 0.0") {
    import spark.implicits._
    val ks = Seq(Some("a"), None, Some("b"), Some("a"), None).toDF("k")
    val mg = ks.agg(Sketches.frequentItems(8)(col("k")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count")).as[(String, Long)].collect().toMap
    assert(mg == Map("a" -> 2L, "b" -> 1L))
    val d = ks.agg(Sketches.distinctCount(8)(col("k")).as("d")).as[Long].collect().head
    assert(d == 2L)
    // a bare-Double input encoder would deserialize NULL to 0.0 and
    // poison the minimum; the Option input must skip it instead
    val qs = Seq(Some(1.0), None, Some(3.0), None, Some(2.0)).toDF("x")
      .agg(Sketches.quantiles(8, Seq(0.0, 0.5, 1.0))(col("x")).as("q"))
      .as[Seq[Double]].collect().head
    assert(qs == Seq(1.0, 2.0, 3.0), s"got $qs")
  }

  test("kmv: pairwise overlap from states alone — exact small, estimated large") {
    import spark.implicits._
    // exact regime: two 300-key sets overlapping in 120, k covers the union
    val aKeys = (0 until 300).map(i => ("A", s"k$i"))
    val bKeys = (180 until 480).map(i => ("B", s"k$i"))
    val exact = (aKeys ++ bKeys).toDF("s", "k").groupBy(col("s"))
      .agg(Sketches.distinctState(1024)(col("k")).as("st"))
    val pair = exact.filter(col("s") === "A").crossJoin(
      exact.filter(col("s") === "B").select(col("st").as("st2")))
      .select(Sketches.intersectDistinct(1024)(
        col("st.hashes"), col("st.full"), col("st2.hashes"), col("st2.full")).as("o"))
      .as[Long].collect().head
    assert(pair == 120L)

    // lossy regime: 30k vs 30k with 15k overlap through k=512 — the
    // Jaccard·D(union) estimator should land within ~4σ of truth
    val bigA = (0 until 30000).map(i => ("A", s"k$i"))
    val bigB = (15000 until 45000).map(i => ("B", s"k$i"))
    val lossy = (bigA ++ bigB).toDF("s", "k").repartition(8).groupBy(col("s"))
      .agg(Sketches.distinctState(512)(col("k")).as("st"))
    val est = lossy.filter(col("s") === "A").crossJoin(
      lossy.filter(col("s") === "B").select(col("st").as("st2")))
      .select(Sketches.intersectDistinct(512)(
        col("st.hashes"), col("st.full"), col("st2.hashes"), col("st2.full")).as("o"))
      .as[Long].collect().head
    val relErr = math.abs(est - 15000.0) / 15000.0
    assert(relErr < 0.3, s"overlap estimate $est off by $relErr")
  }

  test("kmv: duplicates never advance the sketch (multiset-insensitive)") {
    import spark.implicits._
    val once = (0 until 100).map(i => s"k$i")
    val repeated = once ++ once ++ once
    val a = once.toDF("k").agg(Sketches.distinctCount(32)(col("k"))).as[Long].collect().head
    val b = repeated.toDF("k").repartition(7)
      .agg(Sketches.distinctCount(32)(col("k"))).as[Long].collect().head
    assert(a == b)
  }

  test("bloom gate: no false negatives, slice blooms OR-merge exactly") {
    import spark.implicits._
    val m = 1 << 14
    val k = 3
    val corpus = (0 until 2000).map(i => s"key-$i").toDF("f")
    val bits = Sketches.bloomBits(corpus, "f", m, k)
    // membership of every corpus key — a Bloom never misses
    val present = corpus.withColumn("id", lit(0L))
    val verdicts = Sketches.bloomProbe(bits, present, "f", m, k)
    assert(verdicts.filter(!col("in_bloom")).count() == 0)
    // per-slice filters OR-merged (union of set bits) == the whole filter
    val sliceA = Sketches.bloomBits(corpus.limit(900), "f", m, k)
    val sliceB = Sketches.bloomBits(corpus.exceptAll(corpus.limit(900)), "f", m, k)
    val merged = sliceA.union(sliceB).distinct()
    assert(merged.exceptAll(bits).count() == 0 && bits.exceptAll(merged).count() == 0)
    // absent keys: the deterministic FP fraction stays near theory
    // ((1-e^{-kn/m})^k ≈ 3.5% here), not near 0.5 or 1
    val absent = (0 until 2000).map(i => s"nope-$i").toDF("f").withColumn("id", lit(0L))
    val fp = Sketches.bloomProbe(bits, absent, "f", m, k)
      .filter(col("in_bloom")).count()
    assert(fp < 2000 * 0.15, s"FP count $fp far above theory")
    // duplicate candidate keys (two docs, identical text) must each get
    // the per-key verdict — pooling 2k exploded positions under one key
    // used to break `count === k` into a false negative
    val dup = corpus.limit(5).union(corpus.limit(5)).withColumn("id", lit(0L))
    val dupVerdicts = Sketches.bloomProbe(bits, dup, "f", m, k)
    assert(dupVerdicts.count() == 10)
    assert(dupVerdicts.filter(!col("in_bloom")).count() == 0)
  }
}
