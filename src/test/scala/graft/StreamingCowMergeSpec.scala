package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CowMerge

/** Streaming twin of s26's copy-on-write MERGE: a foreachBatch upsert
  * stream maintains the doc_id-range-partitioned table across
  * micro-batches (generation manifest, pruned rewrites), and the final
  * table must equal the ONE relational MERGE of the last-writer-wins
  * union of all batches against the base — the StreamingFrozenSplitSpec
  * parity discipline. Also pins the pruning contract: buckets no batch
  * touches still point at (and physically are) the gen0 files. */
class StreamingCowMergeSpec extends AnyFunSuite with SparkSuite {

  test("streamed COW upserts == one-shot merge; untouched buckets stay gen0") {
    import spark.implicits._
    val width = 250L
    val root = Files.createTempDirectory("cowmerge").toString
    val tableDir = s"$root/table"
    val streamDir = s"$root/stream"
    Files.createDirectories(Paths.get(streamDir))

    // base: 1000 docs over 4 buckets
    val base = spark.range(0, 1000).select(
      col("id").as("doc_id"),
      concat(lit("L"), col("id") % 5).as("lang"),
      (col("id") % 700 + 100).as("n_chars"))
    var manifest = CowMerge.init(base, "doc_id", tableDir, width)
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L))
    val gen0Files = manifest.map { case (b, p) => b -> listFiles(p) }

    // three upsert batches with explicit mtime spacing so the file
    // stream processes them in seq order (last-writer-wins is only
    // meaningful under a defined order):
    //  seq 0: update some bucket-0 docs
    //  seq 1: update an OVERLAPPING bucket-0 doc + inserts into a brand
    //         new bucket 4
    //  seq 2: re-update the same overlapping doc (final winner) +
    //         bucket-2 updates
    // doc 77's second write sets lang to NULL — the whole batch row must
    // win on key match (MERGE "UPDATE SET *"), not a per-column coalesce
    // that would silently resurrect the base value
    val batches = Seq(
      Seq((10L, "u0", 1L), (42L, "u0", 2L), (77L, "u0", 3L)),
      Seq((42L, "u1", 20L), (1005L, "new", 21L), (1099L, "new", 22L)),
      Seq((42L, "u2", 200L), (510L, "u2", 201L),
        (77L, null.asInstanceOf[String], 202L)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val f = s"$streamDir/b$i"
      rows.toDF("doc_id", "lang", "n_chars")
        .coalesce(1).write.parquet(f)
      // stamp the whole batch dir's files to a strictly increasing time
      val t = java.nio.file.attribute.FileTime.fromMillis(
        1700000000000L + i * 60000L)
      Files.walk(Paths.get(f)).forEach(p =>
        Files.setLastModifiedTime(p, t))
    }

    val schema = spark.read.parquet(s"$streamDir/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$streamDir/b*")
    var gens = 0L
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          gens += 1
          manifest = CowMerge.applyBatch(manifest, batch, "doc_id",
            tableDir, gens, width)
        }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(gens == 3, s"expected 3 micro-batches, got $gens")

    // one-shot expectation: last-writer-wins union of all batches,
    // full-outer coalesced against the base (the s26 relational replay)
    val allUpserts = batches.zipWithIndex.flatMap { case (rows, i) =>
      rows.map(r => (r._1, r._2, r._3, i))
    }.toDF("doc_id", "lang", "n_chars", "seq")
    val winners = allUpserts.groupBy("doc_id")
      .agg(max_by(struct(col("lang"), col("n_chars")), col("seq")).as("w"))
      .select(col("doc_id"), col("w.lang").as("u_lang"),
        col("w.n_chars").as("u_chars"))
    val oneShot = base
      .join(winners.withColumnRenamed("doc_id", "u_id"),
        col("doc_id") === col("u_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("u_id")).as("doc_id"),
        when(col("u_id").isNotNull, col("u_lang"))
          .otherwise(col("lang")).as("lang"),
        when(col("u_id").isNotNull, col("u_chars"))
          .otherwise(col("n_chars")).as("n_chars"))

    def canon(df: DataFrame) =
      df.select("doc_id", "lang", "n_chars")
        .orderBy("doc_id").collect().toSeq.map(_.toString)
    val table = CowMerge.readTable(spark, manifest)
    assert(canon(table) == canon(oneShot))
    // the overlapping doc carries the LAST batch's values
    assert(table.filter(col("doc_id") === 42L)
      .select("lang", "n_chars").collect().map(_.toString).toSeq
      == Seq("[u2,200]"))
    // a NULL column value in the winning batch row really lands as NULL
    assert(table.filter(col("doc_id") === 77L)
      .select("lang", "n_chars").collect().map(_.toString).toSeq
      == Seq("[null,202]"))
    // inserts materialized a brand new bucket
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L, 4L))

    // pruning contract: buckets 1 and 3 were never touched — their
    // manifest entries still point at gen0 and the FILES are identical
    for (b <- Seq(1L, 3L)) {
      assert(manifest(b).contains("/gen0/"),
        s"bucket $b was rewritten: ${manifest(b)}")
      assert(listFiles(manifest(b)) == gen0Files(b))
    }
    // touched buckets moved off gen0
    for (b <- Seq(0L, 2L, 4L))
      assert(!manifest(b).contains("/gen0/"), s"bucket $b not rewritten")
  }

  test("readAt == per-generation replay; vacuum drops only unreferenced dirs; growth bounded") {
    val width = 250L
    val root = Files.createTempDirectory("cowlife").toString
    val dir = s"$root/table"
    val base = spark.range(0, 1000).select(
      col("id").as("doc_id"),
      concat(lit("L"), col("id") % 5).as("lang"),
      (col("id") % 700 + 100).as("n_chars"))
    import spark.implicits._
    var m = CowMerge.init(base, "doc_id", dir, width)
    val batches = Seq(
      Seq((10L, "b1", 1L)),                   // gen1: rewrites bucket 0
      Seq((510L, "b2", 2L)),                  // gen2: rewrites bucket 2
      Seq((10L, "b3", 3L), (1005L, "b3", 4L))) // gen3: bucket 0 again + new bucket 4
    batches.zipWithIndex.foreach { case (rows, i) =>
      m = CowMerge.applyBatch(m,
        rows.toDF("doc_id", "lang", "n_chars"), "doc_id", dir, i + 1L, width)
    }
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "n_chars").orderBy("doc_id")
        .collect().toSeq.map(_.toString)
    // replay expectation per generation, from the batch definitions
    def replayTo(g: Int) = {
      val ups = batches.take(g).zipWithIndex
        .flatMap { case (rows, i) => rows.map(r => (r._1, r._2, r._3, i)) }
      if (ups.isEmpty) base
      else {
        val winners = ups.toDF("doc_id", "lang", "n_chars", "seq")
          .groupBy("doc_id")
          .agg(max_by(struct(col("lang"), col("n_chars")), col("seq")).as("w"))
          .select(col("doc_id").as("u_id"), col("w.lang").as("u_lang"),
            col("w.n_chars").as("u_chars"))
        base.join(winners, col("doc_id") === col("u_id"), "full_outer")
          .select(coalesce(col("doc_id"), col("u_id")).as("doc_id"),
            when(col("u_id").isNotNull, col("u_lang")).otherwise(col("lang")).as("lang"),
            when(col("u_id").isNotNull, col("u_chars")).otherwise(col("n_chars")).as("n_chars"))
      }
    }
    for (g <- 0 to 3)
      assert(canon(CowMerge.readAt(spark, dir, g)) == canon(replayTo(g)),
        s"readAt($g) != replay of batches <= $g")
    // a generation with no snapshot resolves to the latest one before it
    assert(canon(CowMerge.readAt(spark, dir, 99L)) == canon(replayTo(3)))

    // vacuum(retain 2): gen3+gen2 manifests stay readable. gen2 still
    // references gen1's bucket-0 dir, so it must survive; the deletable
    // set is exactly the gen0 dirs every retained gen has superseded —
    // bucket 0 (rewritten at gen1, again at gen3) and bucket 2
    // (rewritten at gen2).
    val deleted1 = CowMerge.vacuum(spark, dir, retainGens = 2)
    assert(deleted1.map(p => p.substring(p.indexOf("/gen"))).toSet ==
      Set("/gen0/bucket_p=0", "/gen0/bucket_p=2"),
      s"unexpected vacuum set: $deleted1")
    assert(canon(CowMerge.readTable(spark, m)) == canon(replayTo(3)))
    assert(canon(CowMerge.readAt(spark, dir, 2L)) == canon(replayTo(2)))
    intercept[IllegalArgumentException] { CowMerge.readAt(spark, dir, 1L) }

    // vacuum(retain 1): only the current manifest's dirs survive — the
    // on-disk bucket-dir set equals the manifest exactly (bounded by
    // live buckets, not by batch count)
    CowMerge.vacuum(spark, dir, retainGens = 1)
    assert(canon(CowMerge.readTable(spark, m)) == canon(replayTo(3)))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(dir)))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen"))
      .flatMap(g => fs.listStatus(g.getPath))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket_p="))
      .map(_.getPath.toString).toSet
    assert(onDisk == m.values.toSet,
      s"on-disk bucket dirs != current manifest: extra=${onDisk -- m.values.toSet}")
  }

  test("null merge key fails loudly before the manifest is repointed") {
    import spark.implicits._
    val width = 250L
    val root = Files.createTempDirectory("cownull").toString
    val dir = s"$root/table"
    val base = spark.range(0, 100).select(col("id").as("doc_id"),
      lit("x").as("lang"), lit(1L).as("n_chars"))
    val m = CowMerge.init(base, "doc_id", dir, width)
    val bad = Seq((java.lang.Long.valueOf(7L), "u", java.lang.Long.valueOf(1L)),
        (null.asInstanceOf[java.lang.Long], "u", java.lang.Long.valueOf(2L)))
      .toDF("doc_id", "lang", "n_chars")
    val e = intercept[IllegalArgumentException] {
      CowMerge.applyBatch(m, bad, "doc_id", dir, 1L, width)
    }
    assert(e.getMessage.contains("non-null"))
    // the table's visible state is untouched: manifest still reads gen0
    assert(CowMerge.readTable(spark, m).count() == 100L)
    assert(CowMerge.manifestAt(spark, dir, 99L) == m)
  }

  private def listFiles(dir: String): Set[String] = {
    val p = Paths.get(new java.net.URI(dir).getPath)
    val s = Files.list(p)
    try s.toArray.map(_.toString).filter(_.endsWith(".parquet")).toSet
    finally s.close()
  }
}
