package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: verify the PageRank loop's contribs join reads the cached,
  * pre-partitioned edge table without a new ENSURE_REQUIREMENTS exchange. */
object CkptScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val superRoots = graft.queries.Registry.table(spark, dir, "nation")
      .filter(col("n_nationkey") < 5)
      .select(col("n_nationkey").cast("long").as("root"))
    val ranks = graft.ops.PageRank.run(
      graft.queries.GraphQueries.prEdges(spark, dir), superRoots, iters = 1)
    val lines = ranks.queryExecution.executedPlan.toString.split("\n")
    // walk the plan: find the inner-join SMJ on src_domain and print the
    // subtree heads directly beneath it
    lines.zipWithIndex
      .filter { case (l, _) => l.contains("SortMergeJoin") }
      .foreach { case (_, i) =>
        lines.slice(i, i + 6).foreach(l => println("[g5] " + l.trim.take(150)))
        println("[g5] ----")
      }
    spark.stop()
  }
}
