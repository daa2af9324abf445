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
  *
  * KEY CONTRACT: merge keys must be NON-NULL (as in SQL MERGE, where a
  * NULL key matches nothing). A null key would land its rows in the
  * dynamic-partition default dir and silently merge wrong in the
  * full-outer select, so [[init]]/[[applyBatch]] FAIL LOUDLY when the
  * written generation contains a null-key partition — before the
  * manifest is repointed, so the table's visible state stays intact.
  *
  * LIFECYCLE (r20): every repoint persists the full manifest as a tiny
  * snapshot file under `dir/_manifest/gen<g>.tsv` (one line per bucket
  * — the TFile-manifest class of driver-side small state). That gives
  * the two lakehouse-maintenance operations a table format ships:
  * [[readAt]] (time travel: the table exactly as of generation g) and
  * [[vacuum]] (drop superseded bucket dirs not referenced by any
  * RETAINED snapshot — the newest `retainGens` snapshots stay
  * readable, so vacuum provably never deletes a dir any retained
  * generation references).
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
    val m = listBuckets(base.sparkSession, s"$dir/gen0")
    writeSnapshot(base.sparkSession, dir, 0L, m)
    m
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
    val touchedRows = bb.select("bucket").distinct().collect()
    // key contract (object doc): fail the batch loudly BEFORE any write
    require(!touchedRows.exists(_.isNullAt(0)),
      "null merge key in batch — CowMerge keys must be non-null " +
        "(a NULL key matches nothing in SQL MERGE; dedupe or filter upstream)")
    val touched = touchedRows.map(_.getLong(0)).sorted
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
    val m = manifest ++ listBuckets(spark, s"$dir/gen$gen")
    writeSnapshot(spark, dir, gen, m)
    m
  }

  /** The table exactly as of generation `gen` (time travel): reads the
    * newest persisted snapshot with generation ≤ `gen` — equal to
    * replaying batches 1..gen against the base (each [[applyBatch]]
    * persists its post-repoint manifest; a generation with no snapshot
    * changed nothing). StreamingCowMergeSpec pins the replay equality. */
  def readAt(spark: SparkSession, dir: String, gen: Long): DataFrame =
    readTable(spark, manifestAt(spark, dir, gen))

  /** The persisted manifest in force as of generation `gen`. */
  def manifestAt(spark: SparkSession, dir: String, gen: Long): Manifest = {
    val snaps = listSnapshots(spark, dir).filter(_._1 <= gen)
    require(snaps.nonEmpty, s"no manifest snapshot at or before gen $gen under $dir")
    readSnapshot(spark, snaps.maxBy(_._1)._2)
  }

  /** Drop bucket directories no RETAINED generation references, and the
    * manifest snapshots older than the newest `retainGens`. Safety
    * argument (the invariant a table format's vacuum carries): the
    * delete set is computed as {on-disk bucket dirs} MINUS {union of
    * every retained snapshot's entries}, and the newest snapshot — the
    * CURRENT manifest, since every repoint persists — is always
    * retained, so neither the live table nor any still-readable
    * [[readAt]] generation can lose a referenced dir. After vacuum,
    * on-disk bucket dirs are exactly the retained snapshots' references
    * — bounded by (retained generations × touched buckets), not by
    * batch count. Returns the deleted bucket-dir paths. */
  def vacuum(spark: SparkSession, dir: String, retainGens: Int = 1): Seq[String] = {
    require(retainGens >= 1, s"retainGens must be >= 1, got $retainGens")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snaps = listSnapshots(spark, dir).sortBy(-_._1)
    if (snaps.isEmpty) return Seq.empty
    val (retained, dropped) = snaps.splitAt(retainGens)
    val referenced: Set[String] =
      retained.flatMap(s => readSnapshot(spark, s._2).values).toSet
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val genDirs = fs.listStatus(root).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith("gen"))
    val deleted = genDirs.flatMap { g =>
      fs.listStatus(g.getPath)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("bucket_p=") &&
          !referenced.contains(st.getPath.toString))
        .map { st => fs.delete(st.getPath, true); st.getPath.toString }
    }.toSeq
    // a generation dir whose buckets are all gone is itself dead weight
    genDirs.foreach { g =>
      val left = fs.listStatus(g.getPath)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket_p="))
      if (left.isEmpty) fs.delete(g.getPath, true)
    }
    dropped.foreach(s => fs.delete(s._2, false))
    deleted
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
        val v = p.getName.stripPrefix("bucket_p=")
        // null merge keys land in the dynamic-partition default dir;
        // fail the batch BEFORE the repoint (key contract in the
        // object doc) instead of NumberFormatException-ing later or
        // letting the full-outer select silently null the row out
        require(v.forall(c => c.isDigit || c == '-'),
          s"null/non-numeric merge key wrote partition '${p.getName}' under " +
            s"$genDir — CowMerge keys must be non-null (see key contract)")
        v.toLong -> p.toString
      }.toMap
  }

  // ---- manifest snapshots (driver-side small state, one tiny file per
  // ---- repointed generation under dir/_manifest)

  private def snapshotPath(dir: String, gen: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/_manifest/gen$gen.tsv")

  private def writeSnapshot(spark: SparkSession, dir: String, gen: Long,
      m: Manifest): Unit = {
    val p = snapshotPath(dir, gen)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(m.toSeq.sorted
      .map { case (b, d) => s"$b\t$d\n" }.mkString.getBytes("UTF-8"))
    finally out.close()
  }

  private def readSnapshot(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): Manifest = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
    new String(bytes, "UTF-8").split("\n").filter(_.nonEmpty).map { line =>
      val Array(b, d) = line.split("\t", 2)
      b.toLong -> d
    }.toMap
  }

  private def listSnapshots(spark: SparkSession,
      dir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val mdir = new org.apache.hadoop.fs.Path(s"$dir/_manifest")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mdir)) return Seq.empty
    fs.listStatus(mdir).toSeq.map(_.getPath)
      .collect { case p if p.getName.startsWith("gen") && p.getName.endsWith(".tsv") =>
        p.getName.stripPrefix("gen").stripSuffix(".tsv").toLong -> p
      }
  }
}
