package graft.tools

import org.apache.spark.sql.functions._

/** Scratch (r20): time PageRank.run end-to-end at sf0.1 across
  * checkpoint intervals — every-round materialization was pinned in r14
  * against FULL pipelining (13.0 vs 18.9 s), but the intermediate
  * points were never measured. Results are value-identical at any
  * interval (checkpoint placement is physical only). */
object PrIntervalScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val superRoots = graft.queries.Registry.table(spark, dir, "nation")
      .filter(col("n_nationkey") < 5)
      .select(col("n_nationkey").cast("long").as("root"))
    def run(tag: String, interval: Int): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      graft.ops.PageRank.run(
          graft.queries.GraphQueries.prEdges(spark, dir), superRoots, 5,
          checkpointInterval = interval)
        .orderBy("domain")
        .write.format("noop").mode("overwrite").save()
      println(f"[printerval] $tag interval=$interval ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    run("warmup", 1)
    Seq(1, 2, 5, 1, 2, 5, 1, 2, 5).foreach(i => run("timed", i))
    spark.stop()
  }
}
