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

  private def listFiles(dir: String): Set[String] = {
    val p = Paths.get(new java.net.URI(dir).getPath)
    val s = Files.list(p)
    try s.toArray.map(_.toString).filter(_.endsWith(".parquet")).toSet
    finally s.close()
  }
}
