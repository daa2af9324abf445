package graft.tools

/** Batch plan dumper for the optimization-round evidence files: writes
  * `<outDir>/<query>_<suffix>.txt` with the formatted physical plan of
  * each named registry query, one JVM for the whole batch.
  *
  * {{{ sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1,q2,..." }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, nameCsv) = args.take(4)
    val names = nameCsv.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    // --exec: let the builder run its materialization points (staging
    // writes, checkpoints) and dump the REAL final-frame plan — the
    // right evidence when the optimization is a materialization cut
    // (plan-only mode no-ops materialize(), so it would keep showing
    // the full unmaterialized lineage on both sides of the change)
    val exec = args.contains("--exec")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.queries.Registry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          // plan-only: skip the eager checkpoint/staging work inside
          // builders — the dump wants the plan, not a timed run
          def fmt = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val plan =
            try { if (exec) fmt else graft.ops.Iterative.planOnly(fmt) }
            catch { case e: Throwable => s"[plandump] $name failed: $e" }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
