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
    def run(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      shuffleWrite.set(0); shuffleRead.set(0)
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(3000) // listener bus drain
      println(f"[probe] $name%-22s ${sec}%8.2f s  rows=$n%-8d " +
        f"shuffleWriteMB=${shuffleWrite.get / 1e6}%10.1f " +
        f"shuffleReadMB=${shuffleRead.get / 1e6}%10.1f")
    }
    // warm the JIT + page cache once with the cheap string form at a
    // fraction of the data so first-run effects don't pollute d18's row
    run("warmup(d18@1pct)")(Dedupe.duplicatedSpans(
      docs.sample(0.01, 19), "doc_id", "text", 8, 50))
    run("d18_string")(Dedupe.duplicatedSpans(docs, "doc_id", "text", 8, 50))
    run("d19_hashed")(Dedupe.duplicatedSpansHashed(docs, "doc_id", "text", 8, 50))
    spark.stop()
  }
}
