package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = sys.env.getOrElse("Q", "c2_crawldb_incremental")
    val p = graft.queries.Registry.queries(name)(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    println("[scratch] exchanges=" + "Exchange hashpartitioning".r.findAllIn(p).size)
    p.split("\n").filter(l => l.contains("Exchange") || l.contains("SortMergeJoin"))
      .foreach(l => println("[scratch] " + l.trim.take(160)))
    spark.stop()
  }
}
