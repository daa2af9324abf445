package graft.tools

/** Scratch: execute one registered query at a given SF under the Bench
  * session shape (GraftSession.local — AQE on, bloom joins, extensions)
  * and print the FINAL
  * adaptive plan's exchange/join skeleton — `executedPlan` before an
  * action only shows the static plan, so runtime re-planning (AQE
  * coalescing, join strategy swaps) is invisible to ExplainScratch. */
object AqeScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // the deployed session shape (GraftSession: AQE+skew, bloom joins,
    // 256m scan partitions, native extensions) — profiles taken here
    // match what Bench/Verify actually execute
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val name = sys.env.getOrElse("Q", "c2_crawldb_incremental")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = graft.queries.Registry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[aqe] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val p = df.queryExecution.executedPlan.toString
    println("[aqe] exchanges=" + "Exchange".r.findAllIn(p).size)
    p.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("AQEShuffleRead") || l.contains("HashAggregate("))
      .foreach(l => println("[aqe] " + l.trim.take(160)))
    spark.stop()
  }
}
