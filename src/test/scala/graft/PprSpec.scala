package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ppr

/** Personalized PageRank: restart mass localizes at the seed set — the
  * property that distinguishes it from uniform-teleport PageRank — and
  * the fixed-point arithmetic is exact, so expectations are integers,
  * not tolerances. */
class PprSpec extends AnyFunSuite with SparkSuite {

  test("rank localizes at seeds; unreachable components stay at zero") {
    import spark.implicits._
    // chain 1→2→3 plus a disconnected pair 4→5; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L))
      .toDF("src_domain", "dst_domain")
    val seeds = Seq(1L).toDF("domain")
    val got = Ppr.run(edges, seeds, iters = 2)
      .orderBy("domain")
      .as[(Long, Long, Long)].collect().toSeq
    // r0: 1 → Scale, rest 0.
    // iter 1: acc(2)=Scale, acc(3)=0, acc(5)=0
    //   r1 = (1: 150e9, 2: 850e9, 3: 0, 4: 0, 5: 0)
    // iter 2: acc(2)=r1(1)=150e9 → 127.5e9; acc(3)=r1(2)=850e9 → 722.5e9
    assert(got == Seq(
      (1L, 1L, 150000000000L),
      (2L, 0L, 127500000000L),
      (3L, 0L, 722500000000L),
      (4L, 0L, 0L),
      (5L, 0L, 0L),
    ))
  }

  test("restart mass re-injects at every seed each iteration") {
    import spark.implicits._
    // two seeds feeding one sink: contributions SUM at the sink while
    // each seed keeps its 0.15 floor
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src_domain", "dst_domain")
    val seeds = Seq(1L, 2L).toDF("domain")
    val got = Ppr.run(edges, seeds, iters = 1)
      .orderBy("domain")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 150000000000L),
      (2L, 1L, 150000000000L),
      (3L, 0L, 1700000000000L), // 0.85·(Scale + Scale)
    ))
  }
}
