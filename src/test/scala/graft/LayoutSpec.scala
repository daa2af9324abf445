package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** s20 honesty pins: the z-order locality claim (tile-aligned buckets
  * ⇒ per-bucket spans ≤ 63 on BOTH dimensions) must hold for every
  * bucket, and must actually beat the naive row-order layout — whose
  * same-size buckets span nearly the full domain on both dimensions,
  * so min/max stats prune nothing. */
class LayoutSpec extends AnyFunSuite with SparkSuite {

  test("every z-bucket is a <=64x64 tile; row-order buckets span the domain") {
    val dir = "/root/testdata/sf0.01"
    val rows = Registry.queries("s20_zorder_layout")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xs, ys) = (r.getAs[Long]("x_span"), r.getAs[Long]("y_span"))
      assert(xs <= 63 && ys <= 63, s"bucket ${r.get(0)} spans $xs x $ys")
    }
    // naive layout: same bucket count, rows in arrival (key) order
    val naive = Registry.table(spark, dir, "orders")
      .select((col("o_custkey") % 1024).as("x"),
        (datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")) % 1024).cast("long").as("y"),
        (col("o_orderkey") % 256).as("bucket"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("x_span"), (max("y") - min("y")).as("y_span"))
      .collect()
    val wide = naive.count(r =>
      r.getAs[Long]("x_span") > 500 && r.getAs[Long]("y_span") > 500)
    assert(wide * 10 >= naive.length * 9,
      s"row-order layout unexpectedly tight ($wide/${naive.length} wide) — the comparison is vacuous")
  }

  test("compaction: bins are contiguous offset-DIV-target groups; rewrite preserves content") {
    import graft.sources.Compaction
    val root = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val in = s"$root/in"; val out = s"$root/out"
    // ~40 deliberately small part files
    spark.range(1, 2001)
      .select(col("id"), concat(lit("payload-"), col("id")).as("v"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.option("maxRecordsPerFile", 50).parquet(in)
    val nIn = new java.io.File(in).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(nIn >= 20, s"substrate too coarse: $nIn input files")

    val target = {
      // pick a target ≈ 8 input files per bin from the real sizes
      val sizes = new java.io.File(in).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.length).sum
      sizes / 5
    }
    val bins = Compaction.compact(spark, in, out, target)
    assert(bins.size >= 3 && bins.size < nIn, s"got ${bins.size} bins for $nIn files")
    // contiguity + the offset rule: replay the cumsum over the planned order
    var off = 0L
    val fs = new java.io.File(in).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val expected = fs.map { f => val b = off / target; off += f.length; b.toInt }
    assert(bins.flatMap(b => Seq.fill(b.files.size)(b.id)).toSeq == expected.toSeq)
    // every bin overflows by at most one file
    bins.foreach(b => assert(b.files.size == 1 || b.bytes - fs.filter(f =>
      b.files.exists(_.endsWith(f.getName))).map(_.length).max < target))
    // one output file per bin; exact content parity
    bins.foreach { b =>
      val outFiles = new java.io.File(s"$out/bin=${b.id}").listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(outFiles == 1, s"bin ${b.id}: $outFiles files")
    }
    val a = spark.read.parquet(in)
      .agg(count(lit(1)), sum(col("id")), sum(crc32(col("v")))).head
    val c = spark.read.parquet(out)
      .agg(count(lit(1)), sum(col("id")), sum(crc32(col("v")))).head
    assert(a == c, s"content drift: $a vs $c")
  }

  test("compaction failure is quiescent: all jobs drained, good bins durable") {
    import graft.sources.Compaction
    val root = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val in = s"$root/in"; val out = s"$root/out"
    spark.range(1, 1001)
      .select(col("id"), concat(lit("payload-"), col("id")).as("v"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.option("maxRecordsPerFile", 100).parquet(in)
    // a corrupt part that sorts LAST, so it owns (part of) the final bin
    val bad = new java.io.File(in, "part-zzzz-corrupt.parquet")
    java.nio.file.Files.write(bad.toPath, Array.fill(4096)(0x5A.toByte))
    val target = new java.io.File(in).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sum / 3
    val ex = intercept[RuntimeException] {
      Compaction.compact(spark, in, out, target, parallelism = 2)
    }
    // the method must return only after EVERY rewrite job stopped — a
    // fail-fast rethrow with the pool still mutating outDir is the bug
    assert(ex.getMessage.contains("all rewrite jobs have stopped"),
      s"wrong failure: ${ex.getMessage}")
    val failedIds = "bin\\(s\\) ([0-9,]+)".r.findFirstMatchIn(ex.getMessage)
      .get.group(1).split(",").map(_.toInt).toSet
    assert(failedIds.nonEmpty)
    // every bin NOT in the failure set finished durably before the throw
    val bins = Compaction.plan(spark, in, target)
    val good = bins.filterNot(b => failedIds.contains(b.id))
    assert(good.nonEmpty, "corrupt file swallowed every bin — test substrate broken")
    good.foreach { b =>
      assert(new java.io.File(s"$out/bin=${b.id}/_SUCCESS").exists(),
        s"bin ${b.id} not durable at return")
    }
    // and the good bins' content is intact/readable
    val n = spark.read.parquet(good.map(b => s"$out/bin=${b.id}"): _*).count()
    assert(n > 0)
  }
}
