package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Components

/** g27 k-core bulk peel: exact membership on hand-built graphs,
  * including the cascade case (removing a degree-deficient node pushes a
  * neighbor below k on a LATER round — the behavior a single-pass degree
  * filter gets wrong). */
class KCoreSpec extends AnyFunSuite with SparkSuite {

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    Components.kCore(edges.toDF("sa", "sb"), "sa", "sb", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle plus pendant: 2-core drops the pendant only") {
    // 1-2-3 triangle, 4 hangs off 3
    val got = core(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)), 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("cascade: a chain into a clique peels over multiple rounds") {
    // K4 on {1,2,3,4}; chain 4-5-6-7. Peeling at k=2: 7 goes (deg 1),
    // then 6, then 5 — three rounds — leaving exactly the clique.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = core(k4 ++ chain, 2)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 3L))
    // at k=4 nothing survives (K4 max degree inside is 3)
    assert(core(k4 ++ chain, 4) == Map.empty)
  }

  test("core degree is the degree INSIDE the core, not the input degree") {
    // K3 {1,2,3} with two pendants on node 1: input deg(1)=4, core deg 2
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 10L), (1L, 11L))
    val got = core(g, 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peel depth on the co-citation substrate stays within the oracle unrolls") {
    // The g15 oracle unrolls 8 peel rounds (k=18) and g27's unrolls 20
    // (k=3); rounds past the fixpoint are no-ops, so the unrolled replay
    // equals the fixpoint ONLY while the substrate's true peeling depth
    // stays under the unroll. Pin that here at both gate SFs so a deeper
    // future substrate fails this spec, not the gate-time compare.
    def peelRounds(pairs: org.apache.spark.sql.DataFrame, k: Int): Int = {
      import org.apache.spark.sql.functions._
      var alive = graft.ops.Iterative.materialize(
        pairs.select(col("sa").as("src"), col("sb").as("dst"))
          .unionByName(pairs.select(col("sb").as("src"), col("sa").as("dst"))))
      var rounds = 0
      var done = false
      while (!done && rounds <= 64) {
        val bad = graft.ops.Iterative.materialize(
          alive.groupBy("src").agg(count(lit(1)).as("deg"))
            .filter(col("deg") < k).select(col("src").as("n")))
        if (bad.isEmpty) done = true
        else {
          alive = graft.ops.Iterative.materialize(
            alive.join(bad.select(col("n").as("src")), Seq("src"), "left_anti")
              .join(bad.select(col("n").as("dst")), Seq("dst"), "left_anti"))
          rounds += 1
        }
      }
      assert(done, s"peel did not converge within 64 rounds (k=$k)")
      rounds
    }
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val pairs = graft.queries.GraphQueries.cocitationTopEdges(spark, dir)
      val r18 = peelRounds(pairs, 18)
      val r3 = peelRounds(pairs, 3)
      assert(r18 <= 8, s"$dir: g15 peel depth $r18 exceeds the 8-round unroll")
      assert(r3 <= 20, s"$dir: g27 peel depth $r3 exceeds the 20-round unroll")
    }
  }

  test("label propagation: two cliques with a bridge settle into two communities") {
    import spark.implicits._
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    val bridge = Seq((4L, 10L))
    val got = Components.labelPropagation(
        (k4a ++ k4b ++ bridge).toDF("sa", "sb"), "sa", "sb", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced synchronous rounds with min-label ties: the left
    // clique converges to label 1, the right to label 10; the bridge
    // does not merge them
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }
}
