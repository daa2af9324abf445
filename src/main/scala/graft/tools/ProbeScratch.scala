package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("probe-scratch").toString
    graft.ops.Dedupe.writeBandedIndex(
      docs.filter(col("source") =!= "src0"), "doc_id", "text", "ps_idx", path)
    val probe = graft.ops.Dedupe.probeBandedIndex(
      spark, "ps_idx", docs.filter(col("source") === "src0"), "doc_id", "text", 0.8)
    val p = probe.queryExecution.executedPlan.toString
    println("[scratch] exchanges=" + "Exchange hashpartitioning".r.findAllIn(p).size)
    p.split("\n").filter(l => l.contains("Exchange") || l.contains("SortMergeJoin") || l.contains("Scan parquet"))
      .foreach(l => println("[scratch] " + l.trim.take(150)))
    spark.stop()
  }
}
