package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.file.tfile.TFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real Hadoop TFile I/O — the reference's point-lookup index container
  * (the `service/queryserver/index` classes seek sorted TFile and
  * SequenceFile shards by URL fingerprint; SURVEY §2.1 S4). A TFile is a sorted, block-
  * compressed KV file with an embedded block index, so a reader seeks a
  * key with one block-index binary search — the reference's interactive
  * point-fetch mechanism, and the migration bridge for a user's existing
  * TFile indexes. Classes ship inside Spark's Hadoop client.
  *
  * Layout: keys are big-endian 8-byte longs (memcmp order == numeric
  * order — the TFile comparator contract), values UTF-8 record bytes,
  * gz block compression. Shards are range-partitioned and internally
  * sorted; `manifest.json` records each shard's [min,max] key span so
  * a lookup opens only the owning shard (the reference keeps the same
  * shard-range metadata server-side).
  */
object TFiles {

  val Schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("rec", StringType, nullable = false)))

  private def be8(k: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(k).array()

  /** Write (key: long, rec: string) rows as range-partitioned sorted
    * TFile shards under `dir`, plus a `manifest.json` of shard key
    * spans (driver-side, O(shards) — the QueryServer prefix-sum
    * pattern). */
  def write(df: DataFrame, dir: String, shards: Int): Unit = {
    val spark = df.sparkSession
    val confEntries = HadoopConfs.snapshot(spark)
    // same task-commit discipline as TokenShards.write: pre-clean stale
    // shards (Hadoop rename fails onto an existing destination), write
    // each attempt to an attempt-unique temp, rename on clean close —
    // a speculative duplicate can never truncate a live attempt's file,
    // and a rename failure after the sweep means a byte-identical
    // faster attempt won.
    locally {
      val dirPath = new Path(dir)
      val fs = dirPath.getFileSystem(HadoopConfs.session(spark))
      if (fs.exists(dirPath)) fs.listStatus(dirPath).foreach { st =>
        val n = st.getPath.getName
        if (n.endsWith(".tfile") || n.startsWith("_tmp-"))
          fs.delete(st.getPath, false)
      }
    }
    val manifest = df.select("key", "rec")
      .repartitionByRange(shards, col("key"))
      .sortWithinPartitions("key")
      .rdd.mapPartitionsWithIndex { (i, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val conf = HadoopConfs.restore(confEntries)
          val path = new Path(f"$dir/part-$i%05d.tfile")
          val fs = path.getFileSystem(conf)
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new Path(f"$dir/_tmp-part-$i%05d.tfile.$attempt")
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskFailureListener((_, _) => { fs.delete(tmp, false); () }))
          val out = fs.create(tmp, true)
          val w = new TFile.Writer(out, 64 * 1024, "gz", "memcmp", conf)
          var min = Long.MaxValue
          var max = Long.MinValue
          var n = 0L
          it.foreach { r =>
            val k = r.getLong(0)
            w.append(be8(k), r.getString(1).getBytes(UTF_8))
            min = math.min(min, k); max = math.max(max, k); n += 1
          }
          w.close(); out.close()
          if (!fs.rename(tmp, path)) fs.delete(tmp, false)
          Iterator((path.getName, min, max, n))
        }
      }.collect()
    val json = manifest.map { case (f, mn, mx, n) =>
      s"""{"file":"$f","min":$mn,"max":$mx,"n":$n}"""
    }.mkString("", "\n", "\n")
    // through the same Hadoop FileSystem as the shards, so hdfs:// and
    // s3a:// targets get both artifacts in one place
    val mPath = new Path(dir, "manifest.json")
    val mOut = mPath.getFileSystem(HadoopConfs.session(spark)).create(mPath, true)
    try mOut.write(json.getBytes(UTF_8)) finally mOut.close()
  }

  /** Distributed point lookup: each probe key routes to its owning shard
    * via the broadcast manifest, probes co-locate per shard, and one
    * scanner per shard seeks each key through the TFile block index
    * (`Scanner.seekTo` — the reference's fetch path). Missing keys
    * produce no row. Returns (key, rec). */
  def lookup(spark: SparkSession, dir: String, probes: DataFrame): DataFrame = {
    // explicit schema: an empty write's zero-record manifest must yield
    // an empty lookup, not an AnalysisException from schema inference
    val manifestSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("min",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("max",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))
    val manifest = spark.read.schema(manifestSchema).json(s"$dir/manifest.json")
      .select(col("file"), col("min"), col("max"))
    val routed = probes.select(col("key").cast("long").as("key"))
      .join(broadcast(manifest),
        col("key") >= col("min") && col("key") <= col("max"))
      .select(col("file"), col("key"))
      .repartition(col("file"))
      .sortWithinPartitions("file", "key")
    val confEntries = HadoopConfs.snapshot(spark)
    val rows = routed.rdd.mapPartitions { it =>
      val conf = HadoopConfs.restore(confEntries)
      var curFile: String = null
      var reader: TFile.Reader = null
      var scanner: TFile.Reader.Scanner = null
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      def close(): Unit = {
        if (scanner != null) scanner.close()
        if (reader != null) reader.close()
        if (in != null) in.close()
        scanner = null; reader = null; in = null
      }
      // a partially consumed partition (limit / failed downstream) never
      // exhausts the iterator — close unconditionally at task end too
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => close()))
      val out = it.flatMap { r =>
        val f = r.getString(0); val k = r.getLong(1)
        if (f != curFile) {
          close()
          val path = new Path(s"$dir/$f")
          val fs = path.getFileSystem(conf)
          in = fs.open(path)
          reader = new TFile.Reader(in, fs.getFileStatus(path).getLen, conf)
          scanner = reader.createScanner()
          curFile = f
        }
        if (scanner.seekTo(be8(k))) {
          val e = scanner.entry()
          val buf = new Array[Byte](e.getValueLength)
          e.getValue(buf)
          Iterator(Row(k, new String(buf, UTF_8)))
        } else Iterator.empty
      }
      // flatMap is lazy: wrap so the tail close runs after the last row
      new Iterator[Row] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) close(); h }
        def next(): Row = out.next()
      }
    }
    spark.createDataFrame(rows, Schema)
  }
}
