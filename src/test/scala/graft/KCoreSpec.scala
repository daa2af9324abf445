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
