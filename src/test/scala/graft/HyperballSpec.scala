package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** HyperBall at radius t=4 gated against an exact-BFS register replay:
  * the registry queries (g21–g24) run t=3 under DuckDB oracles; this
  * spec proves the radius is a PARAMETER — the same loop at t=4 must
  * equal exact radius-4 ball membership pushed through the identical
  * md5/ρ register math and α₁₆ integer estimate, per node. */
class HyperballSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The g21 register map for one ball: bucket = first md5 hex digit,
    * value = next ten hex digits (40 bits), ρ = 41 − bitlength. */
  private def registers(ball: Iterable[Long]): Array[Int] = {
    val reg = new Array[Int](16)
    ball.foreach { u =>
      val h = md5hex(u.toString)
      val bucket = Integer.parseInt(h.substring(0, 1), 16)
      val v = java.lang.Long.parseLong(h.substring(1, 11), 16)
      val rho = if (v == 0L) 41 else 41 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      if (rho > reg(bucket)) reg(bucket) = rho
    }
    reg
  }

  private def estimate(reg: Array[Int]): Long = {
    val s = reg.map(r => 1L << (41 - r)).sum
    (562949953421312L / s) * 673L / 1000L
  }

  test("t=4 registers and estimates equal the exact-BFS replay per node") {
    val t = 4
    // exact radius-4 balls over the same (doubled) edge set the build uses
    val edges = GraphQueries.prEdges(spark, dir)
      .select("src_domain", "dst_domain").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val balls: Map[Long, scala.collection.mutable.Set[Long]] =
      nodes.map(v => v -> scala.collection.mutable.Set(v)).toMap
    val estsByRound = scala.collection.mutable.ArrayBuffer[Map[Long, Long]]()
    estsByRound += nodes.map(v => v -> estimate(registers(balls(v)))).toMap
    for (_ <- 1 to t) {
      nodes.foreach { v =>
        val b = balls(v)
        val add = b.toSeq.flatMap(u => adj.getOrElse(u, Array.empty[Long]))
        b ++= add
      }
      estsByRound += nodes.map(v => v -> estimate(registers(balls(v)))).toMap
    }

    val (state, dist, ests) = GraphQueries.hyperball(spark, dir, t)
    // final registers, node by node
    val got = state.collect().map { r =>
      r.getLong(0) -> (1 to 16).map(r.getInt).toArray
    }.toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(got(v).sameElements(registers(balls(v))), s"registers of node $v")
    }
    // per-node estimate snapshots for every round 0..4
    val estRows = ests.collect().map { r =>
      r.getLong(r.fieldIndex("node")) ->
        (0 to t).map(i => r.getLong(r.fieldIndex(s"est$i")))
    }.toMap
    nodes.foreach { v =>
      (0 to t).foreach { i =>
        assert(estRows(v)(i) == estsByRound(i)(v), s"est$i of node $v")
      }
    }
    // distribution readout: one row per radius, summed estimates
    val distRows = dist.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(distRows.keySet == (0 to t).map(_.toLong).toSet)
    (0 to t).foreach { i =>
      assert(distRows(i.toLong) ==
        ((nodes.length.toLong, estsByRound(i).values.sum)), s"round $i")
    }
  }
}
