package graft.sources

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction executor — the physical half of the
  * c8_compaction_plan rule (the reference side-steps the problem by
  * rewriting the whole CrawlDB each merge generation; an incremental
  * store compacts instead, Delta OPTIMIZE / Iceberg rewriteDataFiles
  * semantics).
  *
  * Plan rule (shared with c8): part files in name order are packed
  * left-to-right; a file's bin is its exclusive byte-offset DIV target.
  * Bins are contiguous and overflow by at most one file.
  *
  * Execution: one INDEPENDENT Spark job per bin, writing
  * `out/bin=<id>/`, fanned out on a bounded driver thread pool. That is
  * deliberate — not one big repartition job — because it is what makes
  * compaction operable at warehouse scale: a failed/straggling bin
  * retries alone, finished bins are durable, and the scheduler can run
  * the rewrite incrementally under a time budget. Each job's output
  * goes through the normal committer (attempt dir + rename), and bins
  * never share an output directory, so concurrent jobs cannot race on
  * `_temporary`.
  */
object Compaction {

  final case class Bin(id: Int, files: Seq[String], bytes: Long)

  /** List `dir`'s part files and assign compaction bins. Driver-side FS
    * metadata only — manifest-plane, ~6 orders below the data plane. */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): Seq[Bin] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    var start = 0L
    parts.map { s =>
      val bin = (start / targetBytes).toInt
      start += s.getLen
      (bin, s)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, ss) =>
      Bin(id, ss.map(_._2.getPath.toString), ss.map(_._2.getLen).sum)
    }
  }

  /** Compact `inDir`'s parquet part files into `out/bin=<id>/` groups,
    * one output file per bin. Returns the executed plan. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, parallelism: Int = 4): Seq[Bin] = {
    val bins = plan(spark, inDir, targetBytes)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, math.max(1, bins.size))))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val jobs = bins.map { b =>
      Future {
        spark.read.parquet(b.files: _*)
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$outDir/bin=${b.id}")
      }
    }
    // QUIESCENT on failure: a fail-fast Future.sequence would rethrow on
    // the first bad bin while the pool keeps mutating outDir behind the
    // caller's back. Lift every job to Try and drain them ALL, so this
    // method returns (or throws) only after every rewrite job has
    // stopped; per-bin failures are collected and surfaced together.
    val results =
      try Await.result(
        Future.sequence(jobs.map(_.transform(scala.util.Success(_)))),
        Duration.Inf)
      finally pool.shutdown()
    val failures = bins.zip(results).collect {
      case (b, scala.util.Failure(e)) => (b.id, e)
    }
    if (failures.nonEmpty) {
      val ex = new RuntimeException(
        s"compaction failed for bin(s) ${failures.map(_._1).mkString(",")}" +
          s" of ${bins.size}; all rewrite jobs have stopped",
        failures.head._2)
      failures.tail.foreach { case (_, e) => ex.addSuppressed(e) }
      throw ex
    }
    bins
  }
}
