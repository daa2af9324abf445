package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TokenShards

/** The packed token-shard sink (s19's binary layer): write → manifest →
  * index-seek fetch round-trips, including the edges the oracle query
  * can't reach — missing probes, partial consumption (the
  * task-completion close path), empty shards, and empty id sequences. */
class TokenShardsSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  private def mk(rows: (Long, Seq[Int])*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, ids) => Row(k, ids) }.asJava, schema)
  }

  test("round-trip: every doc comes back with exact stats; misses drop") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tokshard-").toString
    val docs = (0L until 100L).map(k =>
      k -> (0 until (k % 7 + 1).toInt).map(i => (k * 31 + i).toInt))
    TokenShards.write(mk(docs: _*), dir, shards = 4)
    // probes: all present keys plus misses below/above/between
    val probes = mk((Seq(-5L, 1000L) ++ (0L until 100L)).map(_ -> Seq[Int](0)): _*)
      .select("doc_id")
    val got = TokenShards.fetch(spark, dir, probes)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got.size == 100) // the two misses produced no rows
    docs.foreach { case (k, ids) =>
      assert(got(k) == ((ids.length, ids.map(_.toLong).sum, ids.head, ids.last)),
        s"doc $k")
    }
    // manifest spans cover disjoint ranges and all 100 docs
    val man = spark.read.json(s"$dir/manifest.json")
      .select("min", "max", "n").collect()
    assert(man.map(_.getLong(2)).sum == 100)
    val spans = man.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ =>
    }
  }

  test("partial consumption (limit) still closes readers; empty ids fetch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tokshard-").toString
    TokenShards.write(
      mk(1L -> Seq(7, 8), 2L -> Seq.empty[Int], 3L -> Seq(9)), dir, shards = 2)
    // a limit(1) leaves the fetch iterator un-exhausted — the
    // TaskCompletionListener must close the streams (no assertion
    // possible on the handle itself; the test passes if no leak-related
    // failure or hang occurs and the row is correct)
    val one = TokenShards.fetch(spark, dir,
      mk(1L -> Seq(0), 3L -> Seq(0)).select("doc_id")).limit(1).collect()
    assert(one.length == 1)
    // an empty id sequence round-trips as n_tokens=0 with -1 sentinels
    val empty = TokenShards.fetch(spark, dir, mk(2L -> Seq(0)).select("doc_id"))
      .collect()
    assert(empty.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getInt(3), r.getInt(4))).toSeq == Seq((2L, 0, 0L, -1, -1)))
  }

  test("empty input writes a readable (empty) shard set") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tokshard-").toString
    // zero input rows → every partition skips its shard, manifest is a
    // zero-record file; fetch must return an empty result, not throw on
    // schema inference over the empty manifest
    TokenShards.write(mk().limit(0), dir, shards = 2)
    val got = TokenShards.fetch(spark, dir, mk(1L -> Seq(0)).select("doc_id"))
    assert(got.collect().isEmpty)
  }

  test("re-running a write over the same dir replaces it cleanly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tokshard-").toString
    TokenShards.write(mk((0L until 10L).map(k => k -> Seq(1, 2)): _*),
      dir, shards = 2)
    // job re-run (e.g. after a downstream failure): new content, same
    // target — the rename-over commit and manifest overwrite must leave
    // only the second run visible
    TokenShards.write(mk((0L until 10L).map(k => k -> Seq(7)): _*),
      dir, shards = 2)
    val got = TokenShards.fetch(spark, dir,
      mk((0L until 10L).map(_ -> Seq(0)): _*).select("doc_id"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).distinct.toSeq
    assert(got == Seq((1, 7L)), s"stale first-run data visible: $got")
  }

  test("paired commit: interleaved duplicate attempts never expose a mixed pair") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tokshard-").toString
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    def p(n: String) = new Path(s"$dir/$n")
    def put(path: Path, s: String): Unit = {
      val o = fs.create(path, true); o.write(s.getBytes); o.close()
    }
    // THE invariant a reader relies on, checked after every interleaving
    // step: an .idx in final position implies its .bin is final too
    def invariant(): Unit =
      assert(!fs.exists(p("s.idx")) || fs.exists(p("s.bin")),
        "mixed pair: idx final without bin")
    // attempt 1 commits normally
    put(p("_tmp-s.bin.1"), "BIN"); put(p("_tmp-s.idx.1"), "IDX")
    TokenShards.commitPair(fs, p("_tmp-s.bin.1"), p("s.bin"),
      p("_tmp-s.idx.1"), p("s.idx"))
    invariant()
    assert(fs.exists(p("s.bin")) && fs.exists(p("s.idx")))
    // a byte-identical duplicate attempt 2 lands AFTER 1 won: its temps
    // are dropped, the finals stay, never a half-replaced pair
    put(p("_tmp-s.bin.2"), "BIN"); put(p("_tmp-s.idx.2"), "IDX")
    TokenShards.commitPair(fs, p("_tmp-s.bin.2"), p("s.bin"),
      p("_tmp-s.idx.2"), p("s.idx"))
    invariant()
    assert(!fs.exists(p("_tmp-s.bin.2")) && !fs.exists(p("_tmp-s.idx.2")))
    // attempt 3 died BETWEEN its two renames (bin final, idx never
    // landed) — the invariant holds in that state, and a duplicate
    // attempt 4 must COMPLETE the pair against the identical bin
    fs.delete(p("s.idx"), false)
    invariant()
    put(p("_tmp-s.bin.4"), "BIN"); put(p("_tmp-s.idx.4"), "IDX")
    TokenShards.commitPair(fs, p("_tmp-s.bin.4"), p("s.bin"),
      p("_tmp-s.idx.4"), p("s.idx"))
    invariant()
    assert(fs.exists(p("s.idx")), "duplicate attempt did not complete the pair")
  }

  test("fetch refuses a mixed/truncated shard pair instead of silent garbage") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tokshard-").toString
    TokenShards.write(mk((0L until 10L).map(k => k -> Seq(1, 2, 3)): _*),
      dir, shards = 1)
    // truncate the .bin behind the idx's back — the shape a broken
    // commit (or a stale mixed pair) would leave
    val bin = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bin")).head
    val raf = new java.io.RandomAccessFile(bin, "rw")
    try raf.setLength(bin.length() - 4) finally raf.close()
    val ex = intercept[Exception] {
      TokenShards.fetch(spark, dir, mk(1L -> Seq(0)).select("doc_id")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("mixed or truncated")),
      s"wrong failure: ${messages(ex)}")
  }

  test("commit protocol: no _tmp files survive a write; finals are complete") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tokshard-").toString
    TokenShards.write(mk((0L until 20L).map(k => k -> Seq(k.toInt)): _*),
      dir, shards = 3)
    val names = new java.io.File(dir).list().toSeq
    assert(!names.exists(_.startsWith("_tmp-")), s"stale temps in $names")
    assert(names.count(_.endsWith(".bin")) == names.count(_.endsWith(".idx")))
    val got = TokenShards.fetch(spark, dir,
      mk((0L until 20L).map(_ -> Seq(0)): _*).select("doc_id")).collect()
    assert(got.length == 20)
  }
}
