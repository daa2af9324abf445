package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{GraphQueries, Registry}

/** g15 honesty pins: the oracle replays a FIXED 8-round unroll of the
  * peel, which equals the fixpoint only if peeling actually converges
  * within 8 rounds at the oracle's scale factors. These tests simulate
  * the exact peel driver-side from the same substrate and pin (a) the
  * convergence depth at both gate SFs, and (b) that the Spark query's
  * surviving node set equals the simulated fixpoint. */
class KCoreSpec extends AnyFunSuite with SparkSuite {

  private val K = 18

  private def peel(edges: Seq[(Long, Long)]): (Set[Long], Int) = {
    var cur = edges
    var rounds = 0
    var stable = false
    while (!stable && rounds < 40) {
      val deg = cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= K).keySet
      val next = cur.filter(e => keep(e._1) && keep(e._2))
      stable = next.size == cur.size
      cur = next
      rounds += 1
    }
    assert(stable, "simulation did not converge")
    (cur.flatMap(e => Seq(e._1, e._2)).toSet, rounds)
  }

  test("peeling converges within the oracle's 8-round unroll at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val edges = GraphQueries.cocitationTopEdges(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (_, rounds) = peel(edges)
      assert(rounds <= 8, s"$dir needs $rounds peel rounds > oracle unroll depth 8")
    }
  }

  test("the fixpoint query returns exactly the simulated core (cascade non-vacuous)") {
    val edges = GraphQueries.cocitationTopEdges(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (core, rounds) = peel(edges)
    // a one-shot degree filter is NOT a k-core: the cascade must matter
    assert(rounds >= 3, s"peel depth $rounds — substrate degenerated to a one-shot filter")
    val got = Registry.queries("g15_kcore")(spark, "/root/testdata/sf0.01")
      .collect().map(_.getLong(0)).toSet
    assert(got == core)
  }
}
