package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of the s26 one-shot copy-on-write MERGE: maintains a
  * key-range-partitioned corpus table under a micro-batch upsert stream
  * (`foreachBatch`), Delta/Iceberg-style but without a table format. The
  * table is a MANIFEST (bucket → immutable parquet directory); each
  * batch rewrites ONLY the buckets it touches into a fresh generation
  * directory and repoints those manifest entries — untouched buckets are
  * neither read nor rewritten, so per-batch cost is O(touched buckets)
  * however large the corpus grows (the s26 pruning argument, held across
  * generations). The manifest is the TFile-manifest class of driver-side
  * small state: one (bucket, path) entry per bucket, persisted trivially
  * alongside checkpoints in production.
  *
  * Reference shape: the CrawlDB generation chain
  * (crawler/CrawlDBMergeJob.java feeds each merge's output back as the
  * next input); here the generation granularity is the BUCKET, so a
  * batch's write amplification is its touched-key range, not the DB.
  *
  * MERGE semantics per batch: full-outer coalesce, batch row wins
  * (update), unmatched batch keys insert (possibly materializing brand
  * new buckets), unmatched base rows pass through. Applying batches
  * b1…bn sequentially therefore equals one relational MERGE of the
  * LAST-writer-wins union of all batches against the base — the parity
  * StreamingCowMergeSpec pins.
  */
object CowMerge {

  /** bucket → directory of exactly that bucket's current rows. */
  type Manifest = Map[Long, String]

  /** Write the initial generation: one parquet dir per key bucket under
    * `dir/gen0`. The bucket column is kept IN the files (the partition
    * dir name duplicates it) so any single bucket dir reads back
    * self-describing. One file per bucket: hash-distribute on the
    * partition column before the dynamic-partition write (the s26
    * small-file discipline). */
  def init(base: DataFrame, keyCol: String, dir: String,
      bucketWidth: Long): Manifest = {
    val b = base.withColumn("bucket", expr(s"$keyCol div $bucketWidth"))
      .withColumn("bucket_p", col("bucket"))
    b.repartition(col("bucket_p"))
      .write.partitionBy("bucket_p").parquet(s"$dir/gen0")
    listBuckets(base.sparkSession, s"$dir/gen0")
  }

  /** Apply one upsert micro-batch: prune to touched buckets, full-outer
    * coalesce (batch wins), rewrite those buckets into `dir/gen<gen>`,
    * return the repointed manifest. The touched-bucket collect is
    * O(buckets in the batch). Contract: keys are UNIQUE within a batch
    * (dedupe upstream — e.g. max_by on an event-sequence column; with a
    * duplicated key the full-outer join fans out and "which write wins
    * within the batch" is undefined, exactly as in SQL MERGE). */
  def applyBatch(manifest: Manifest, batch: DataFrame, keyCol: String,
      dir: String, gen: Long, bucketWidth: Long): Manifest = {
    val spark = batch.sparkSession
    // materialize once: the batch plan feeds BOTH the touched-bucket
    // collect and the merge join — without this a file-source micro-batch
    // re-reads its input files per action
    val bb = graft.ops.Iterative.materialize(
      batch.withColumn("bucket", expr(s"$keyCol div $bucketWidth")))
    val touched = bb.select("bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return manifest
    val existing = touched.flatMap(manifest.get)
    val dataCols = batch.columns
    val oldRows =
      if (existing.isEmpty) batch.limit(0)
      else spark.read.parquet(existing.toIndexedSeq: _*)
        .select(dataCols.map(col).toIndexedSeq: _*)
    val uCols = dataCols.map(c => col(c).as(s"u_$c"))
    // the WHOLE batch row wins on a key match (SQL MERGE "UPDATE SET *"
    // semantics — decided by key presence, NOT per-column coalesce, so a
    // batch row may legitimately set a column to NULL and the sequential
    // result still equals the one-shot last-writer-wins merge)
    val merged = oldRows
      .join(bb.select(uCols.toIndexedSeq: _*),
        col(keyCol) === col(s"u_$keyCol"), "full_outer")
      .select(dataCols.map(c =>
        when(col(s"u_$keyCol").isNotNull, col(s"u_$c"))
          .otherwise(col(c)).as(c)).toIndexedSeq: _*)
      .withColumn("bucket", expr(s"$keyCol div $bucketWidth"))
      .withColumn("bucket_p", col("bucket"))
    merged.repartition(col("bucket_p"))
      .write.partitionBy("bucket_p").parquet(s"$dir/gen$gen")
    manifest ++ listBuckets(spark, s"$dir/gen$gen")
  }

  /** The current table: the union of every bucket's current generation
    * dir. Each dir carries the bucket column in-file, so no partition
    * discovery across mixed generations is needed. */
  def readTable(spark: SparkSession, manifest: Manifest): DataFrame =
    spark.read.parquet(manifest.values.toSeq.distinct.sorted: _*)

  private def listBuckets(spark: SparkSession, genDir: String): Manifest = {
    val fs = new org.apache.hadoop.fs.Path(genDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(genDir)))
      .filter(_.isDirectory)
      .map(_.getPath)
      .collect { case p if p.getName.startsWith("bucket_p=") =>
        p.getName.stripPrefix("bucket_p=").toLong -> p.toString
      }.toMap
  }
}
