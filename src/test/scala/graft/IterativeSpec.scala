package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedupe, PageRank}

/** The iterative ops' reliable-checkpoint path: with a checkpointDir set,
  * per-round state goes through `df.checkpoint()` (cluster-fault-tolerant)
  * instead of executor-local blocks, and the results are identical. */
class IterativeSpec extends AnyFunSuite with SparkSuite {

  private def ckDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ck").toString

  test("connected components: reliable checkpoint path matches default") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L), (10L, 11L),
    ).toDF("doc_a", "doc_b")
    val want = Dedupe.connectedComponents(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Dedupe.connectedComponents(pairs, checkpointDir = Some(ckDir()))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.map(_._2).distinct.sorted == Seq(1L, 5L, 8L))
  }

  test("pagerank: reliable checkpoint path matches default") {
    import spark.implicits._
    val edges = Seq(
      (1L, 100L, 2L, 200L), (2L, 200L, 3L, 300L), (3L, 300L, 1L, 100L),
      (4L, 100L, 2L, 200L),
    ).toDF("src_domain", "src_root", "dst_domain", "dst_root")
    val supers = Seq(100L).toDF("root")
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("domain").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = tuples(PageRank.run(edges, supers, iters = 3))
    val got = tuples(PageRank.run(edges, supers, iters = 3,
      checkpointDir = Some(ckDir())))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("spark.graft.checkpointDir routes dedupe and IVF materializations " +
      "through reliable checkpoints") {
    // the non-iterative pipelines (shingle/vector tables) materialize via
    // Iterative.materialize; with the session conf set they must survive
    // executor loss (reliable checkpoint files on the checkpoint fs) and
    // return identical results
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(120)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantPairs = pairs(
      Dedupe.minhashNearDupPairs(docs, "doc_id", "text", 0.8, 72, 6)
        .select("doc_a", "doc_b"))

    val session = spark.newSession()
    val dir = ckDir()
    session.conf.set(graft.ops.Iterative.CheckpointDirKey, dir)
    val docsR = session.read.parquet(s"$sfDir/documents.parquet").limit(120)
    val gotPairs = pairs(
      Dedupe.minhashNearDupPairs(docsR, "doc_id", "text", 0.8, 72, 6)
        .select("doc_a", "doc_b"))
    assert(gotPairs == wantPairs)

    // an IVF index build through the same reliable path
    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val path = java.nio.file.Files.createTempDirectory("graft-ivfck-").toString
    graft.ops.Similarity.writeIvfIndex(
      session.read.parquet(s"$sfDir/embeddings.parquet"),
      "vec_id", "embedding", s"ivfck_$suffix", path, nSeeds = 8)
    assert(session.table(s"ivfck_${suffix}_cells").count() == emb.count())

    // reliable checkpoint files actually landed on the checkpoint fs
    def rddFiles(d: java.io.File): Int =
      d.listFiles().map(f =>
        if (f.isDirectory) rddFiles(f)
        else if (f.getName.startsWith("part-")) 1 else 0).sum
    assert(rddFiles(new java.io.File(dir)) > 0,
      s"no reliable checkpoint files under $dir")
  }
}
