package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.ops.Dedupe

/** Scratch evidence tool for the d18-vs-d19 shuffle-byte claim (not part
  * of the library surface; run manually on a scaled soak dir): times the
  * string-keyed and xxhash64-keyed span kernels end-to-end and reports
  * total shuffle WRITE bytes per run from task metrics — the number the
  * gram-hash variant exists to cut. */
object SpanShuffleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val shuffleWrite = new AtomicLong
    val shuffleRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // `noop = true` materializes every column through a noop sink —
    // REQUIRED when the probed kernel ends in an aggregation whose
    // inputs a count() would let Catalyst prune (t10: under count() the
    // LM left-outer join is eliminated outright — the right side is
    // provably unique from its own groupBy and cnt is unreferenced — so
    // the probe would measure a plan missing its heaviest exchange).
    // The span kernels keep count(): their final filter depends on the
    // aggregated span length, so nothing prunes.
    def run(name: String, noop: Boolean = false)(
        df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      shuffleWrite.set(0); shuffleRead.set(0)
      val t0 = System.nanoTime()
      val n =
        if (noop) { df.write.format("noop").mode("overwrite").save(); -1L }
        else df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(3000) // listener bus drain
      println(f"[probe] $name%-22s ${sec}%8.2f s  rows=$n%-8d " +
        f"shuffleWriteMB=${shuffleWrite.get / 1e6}%10.1f " +
        f"shuffleReadMB=${shuffleRead.get / 1e6}%10.1f")
    }
    sys.env.getOrElse("SPARK_GRAFT_PROBE", "spans") match {
      case "t10" =>
        // r20: the same keying lever one tier down — t10/cu30's bigram-LM
        // df gate + join-back, string key vs production xxhash64 key.
        // Replication-scaled soak corpora keep the vocabulary bounded, so
        // the pruned LM broadcasts and the join-back never shuffles —
        // which hides exactly the exchange the keying exists to narrow.
        // A real 100 TB corpus grows distinct bigrams ~linearly (Heaps'
        // law) and the LM side stops fitting a broadcast; simulate that
        // regime by disabling broadcast joins so the join-back runs as a
        // shuffle of every bigram occurrence row, keyed string-vs-hash.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        import graft.ops.TextAnalysis
        run("warmup(t10@1pct)", noop = true)(TextAnalysis.bigramLmScores(
          docs.sample(0.01, 19), "doc_id", "text", 5, g => xxhash64(g)))
        run("t10_string", noop = true)(TextAnalysis.bigramLmScores(
          docs, "doc_id", "text", 5, identity))
        run("t10_hashed", noop = true)(TextAnalysis.bigramLmScores(
          docs, "doc_id", "text", 5, g => xxhash64(g)))
      case _ =>
        // warm the JIT + page cache once with the cheap string form at a
        // fraction of the data so first-run effects don't pollute d18's row
        run("warmup(d18@1pct)")(Dedupe.duplicatedSpans(
          docs.sample(0.01, 19), "doc_id", "text", 8, 50))
        run("d18_string")(Dedupe.duplicatedSpans(docs, "doc_id", "text", 8, 50))
        run("d19_hashed")(Dedupe.duplicatedSpansHashed(docs, "doc_id", "text", 8, 50))
    }
    spark.stop()
  }
}
