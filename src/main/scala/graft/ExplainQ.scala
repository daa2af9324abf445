package graft

/** Plan-profiling utility: dump the formatted physical plan of one
  * registry query at an arbitrary SF dir and time a noop-sink run.
  *
  * {{{
  *   sbt "runMain graft.ExplainQ <sfDir> <queryName> [--run]"
  * }}}
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, rest @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = queries.Registry.queries(name)(spark, sfDir)
    // scalastyle:off println
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    if (rest.contains("--run")) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explainq] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // scalastyle:on println
    spark.stop()
  }
}
