package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{GraphQueries, Registry}

/** g16 honesty pins: the query and its oracle both run a FIXED 3-round
  * level-synchronous BFS. These tests simulate exact min-distance BFS
  * driver-side from the same substrate and pin (a) that 3 rounds reach
  * the true hop-≤3 labelling (deeper nodes would silently vanish from
  * the output — the fixed depth must cover the graph's actual reach),
  * and (b) the distance distribution is multi-level, so the frontier
  * expansion is doing real work rather than one-shot neighbor lookup. */
class SeedDistanceSpec extends AnyFunSuite with SparkSuite {

  test("3-round BFS equals the unbounded min-distance fixpoint at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val edges = GraphQueries.prEdges(spark, dir)
      .select("src_domain", "dst_domain")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val seeds = Registry.table(spark, dir, "customer")
      .filter(org.apache.spark.sql.functions.col("c_nationkey") === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet

    // unbounded BFS to the true fixpoint
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var level = 0L
    while (frontier.nonEmpty) {
      level += 1
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> level)
    }
    assert(level - 1 <= 3,
      s"graph reach ${level - 1} exceeds the fixed unroll depth 3 — deep nodes would vanish")

    val got = Registry.queries("g16_seed_distance")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist)
    assert(dist.values.toSet.size >= 3,
      "distance distribution degenerated — frontier expansion is vacuous")
  }
}
