package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Components

/** g17 honesty pins: star contraction must (a) label components
  * EXACTLY like a driver-side union-find on the same edges, and
  * (b) converge in logarithmic rounds on the diameter-99 chain
  * substrate — the whole point of preferring it over hash-min label
  * propagation, which needs one round per hop. */
class StarContractSpec extends AnyFunSuite with SparkSuite {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain substrate: equals union-find, converges in O(log n) rounds") {
    import spark.implicits._
    val edges = (0L until 1500L).filter(_ % 100 != 99).map(k => (k, k + 1))
      .filter(_._2 < 1500L)
    val (df, rounds) = Components.starContractWithRounds(
      edges.toDF("a", "b"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges))
    // diameter is 99: hash-min would need 99 rounds; star contraction
    // must stay logarithmic or the algorithm degenerated
    assert(rounds <= 12, s"star contraction took $rounds rounds on the chain")
    assert(got.values.toSet.size == 15)
  }

  test("adversarial shapes: shuffled input, stars, cliques, crossing chains") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val chain = (0L until 200L).map(k => (k, k + 1))
    val star = (1000L until 1050L).map(k => (2000L, k))
    val clique = for (i <- 3000L until 3010L; j <- i + 1 until 3010L) yield (i, j)
    val edges = rnd.shuffle(chain ++ star ++ clique)
      .map { case (x, y) => if (rnd.nextBoolean()) (y, x) else (x, y) }
    val (df, _) = Components.starContractWithRounds(edges.toDF("a", "b"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges))
  }
}
