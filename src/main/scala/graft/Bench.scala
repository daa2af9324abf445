package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
