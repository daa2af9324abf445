package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Registry, ResultCache}

class ResultCacheSpec extends AnyFunSuite with SparkSuite {

  test("canonical id is stable under parameter reordering, distinct otherwise") {
    val a = ResultCache.canonicalId("domain_list", Map("re" -> "x$", "page" -> "2"))
    val b = ResultCache.canonicalId("domain_list", Map("page" -> "2", "re" -> "x$"))
    val c = ResultCache.canonicalId("domain_list", Map("page" -> "3", "re" -> "x$"))
    assert(a == b)
    assert(a != c)
  }

  test("second identical query serves the cached result without recompute") {
    val dir = Files.createTempDirectory("result_cache").toString
    var computes = 0
    def run() = ResultCache.getOrCompute(spark, dir, "topk",
      Map("seg" -> "BUILDING", "k" -> "3")) {
      computes += 1
      Registry.table(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(3)
    }
    val first = run().collect().map(_.getLong(0)).toSet
    val second = run().collect().map(_.getLong(0)).toSet
    assert(computes == 1) // second call never evaluated the thunk
    assert(first == second && first.size == 3)
  }
}
