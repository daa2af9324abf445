package graft.tools

/** r21 scratch (VERDICT item 8): attribute the sub-second tail.
  *
  * For each named query, in ONE warm JVM, splits the wall into
  *   build — the registry builder call (plan construction + any eager
  *           staging/materialization the builder performs),
  *   plan  — analysis + optimization + physical planning of the final
  *           frame (forced via queryExecution.executedPlan),
  *   exec  — the noop-sink run (includes AQE re-planning + codegen +
  *           task execution).
  * Each query runs twice; the second (warm) run is the floor estimate —
  * the first carries per-query codegen/staging that the suite also pays
  * exactly once.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TailProfile <sfDir> q1,q2,..." }}}
  */
object TailProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.queries.Registry.table(spark, sfDir, t).count()
    }
    // one throwaway query to absorb codegen-infra warmup
    graft.queries.Registry.queries.get("q1_agg").foreach { fn =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    var totB = 0.0; var totP = 0.0; var totE = 0.0; var totCold = 0.0
    names.foreach { name =>
      graft.queries.Registry.queries.get(name) match {
        case None => println(s"[tailprofile] unknown query: $name")
        case Some(fn) =>
          var cold = 0.0
          val rows = (1 to 2).map { i =>
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan // force planning
            val t2 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            val t3 = System.nanoTime()
            if (i == 1) cold = (t3 - t0) / 1e9
            ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
          }
          val (b, p, e) = rows.last
          totB += b; totP += p; totE += e; totCold += cold
          println(f"[tailprofile] $name%-28s cold ${cold}%5.2f | warm build ${b}%5.2f plan ${p}%5.2f exec ${e}%5.2f")
      }
    }
    println(f"[tailprofile] TOTALS over ${names.size} queries: cold ${totCold}%6.2f | warm build ${totB}%6.2f plan ${totP}%6.2f exec ${totE}%6.2f")
    spark.stop()
  }
}
