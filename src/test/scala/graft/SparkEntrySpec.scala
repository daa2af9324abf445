package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: the flagship smoke query returns rows, every
  * registered query ANALYZES against the test tables (resolution errors —
  * a renamed column, a bad oracle alias pairing — surface here instead of
  * in the round gate), and the oracle map stays keyed by real queries. */
class SparkEntrySpec extends AnyFunSuite with SparkSuite {

  test("flagship entry returns rows at the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query analyzes at sf0.001") {
    // schema forces full analysis (resolution + type checking) without
    // executing the plan; queries that materialize at build time (index
    // writes, staging round-trips) run on the tiny smoke tables
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).schema; None }
        catch { case e: Exception => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle entry belongs to a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }
}
