package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the engine's own session configuration (AQE+skew-join, runtime
    // bloom joins, 256m scan partitions, native-function extensions) —
    // the bench must measure the engine as deployed, not a plain session
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: whichever query runs first would otherwise absorb
    // JVM classloading + codegen-infra + parquet-footer startup (~7 s,
    // observed on g4) and read as the slowest query in the suite.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.queries.Registry.table(spark, sfDir, t).count()
    }
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    // optional comma-separated prefix filter for targeted local profiling
    // (e.g. SPARK_GRAFT_BENCH_FILTER=d,g5); absent → full suite
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String) = filter.forall(_.exists(name.startsWith))
    // deterministic name order so per-query numbers are comparable
    // across rounds (Map iteration order is arbitrary)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes every row end-to-end (count() would let
      // Catalyst drop final sorts/projections and undercount the work)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      // release the query's localCheckpoint/persist blocks: queries are
      // independent, and accumulated blocks from earlier queries otherwise
      // squeeze the block manager and GC-tax later ones (d2 measured 11.9 s
      // mid-suite vs 5.4 s standalone before this)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // a crashed query must not masquerade as a fast one: negative sentinel
      name -> (if (ok) sec else -sec)
    }
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // full precision for local analysis (the stdout line below is budgeted)
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("0")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$fullQs,"sf":$sfNum,"sf_dir":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] full dump failed: $e") }
    // The harness keeps only the last ~2000 chars of the run's output; a
    // full-precision 85-query map is ~3000 chars, so its head (and the
    // required {"metric": prefix) would be cut off and the line would never
    // parse. Emit 2-decimal values and, if still over budget, fold the
    // fastest queries into omitted counters — failed and slow queries (the
    // ones that carry signal) are always kept.
    def fmt(v: Double): String = {
      // clamp failure sentinels away from zero: a crash in a <5ms query
      // would otherwise render as "-0", which JSON consumers read as 0
      val c = if (v < 0) math.min(v, -0.01) else v
      val s = f"$c%.2f"
      val t = s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      if (t.isEmpty || t == "-") "0" else t
    }
    def render(keep: Seq[(String, Double)], omitted: Seq[(String, Double)]): String = {
      val qsStr = keep.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val om =
        if (omitted.isEmpty) ""
        else s""","omitted":${omitted.size},"omitted_sec":${fmt(omitted.map(_._2).sum)}"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed$om,"queries":$qsStr,"sf":$sfNum}"""
    }
    val budget = 1850
    // drop-order: fastest successful queries first; failures never dropped —
    // the loop bound is the SUCCESS count, so under extreme budget pressure
    // a failure can never be folded into omitted/omitted_sec (its negative
    // time would corrupt the sum and hide the crash)
    val dropOrder = results.filter(_._2 >= 0).sortBy(_._2)
    var nDrop = 0
    var line = render(results, Seq.empty)
    while (line.length > budget && nDrop < dropOrder.size) {
      nDrop += 1
      val dropped = dropOrder.take(nDrop).map(_._1).toSet
      line = render(results.filterNot(r => dropped(r._1)), dropOrder.take(nDrop))
    }
    println(line)
    spark.stop()
  }
}
