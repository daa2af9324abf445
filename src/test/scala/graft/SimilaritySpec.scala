package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSuite {

  test("MIPS norm augmentation: augmented-cosine order == inner-product order") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def ip(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val m2 = vecs.values.map(v => ip(v, v)).max
    def aug(v: Array[Double]): Array[Double] = v :+ math.sqrt(m2 - ip(v, v))
    def cos(a: Array[Double], b: Array[Double]): Double =
      ip(a, b) / (math.sqrt(ip(a, a)) * math.sqrt(ip(b, b)))
    val ids = vecs.keys.toSeq.sorted
    for (q <- ids.take(5); qa = vecs(q) :+ 0.0) {
      val byIp = ids.filter(_ != q).sortBy(n => (-ip(vecs(q), vecs(n)), n))
      val byAugCos = ids.filter(_ != q).sortBy(n => (-cos(qa, aug(vecs(n))), n))
      // the reduction's whole point: for a fixed probe, augmented cosine is
      // a positive monotone transform of the inner product (all augmented
      // corpus vectors share norm M), so the two rankings are identical
      assert(byIp.take(20) == byAugCos.take(20), s"probe $q ranking diverged")
    }
  }

  test("persistent IVF index probe == in-memory ivfTopK (sf0.001)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val nSeeds = math.max(4, math.sqrt(n.toDouble).toInt)
    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      s"ivf_$suffix", path, nSeeds)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val viaIndex = rows(Similarity.probeIvfIndex(spark, s"ivf_$suffix",
      Similarity.vectors(emb, "vec_id", "embedding").filter(col("vec_id") < 20),
      nProbeCells = 2, k = 5))
    val direct = rows(Similarity.ivfTopK(emb, "vec_id", "embedding",
      nSeeds, nProbeCells = 2, probeMax = 20, k = 5))
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty)

    // ingest path: index built WITHOUT a held-out slice (ids >= nSeeds so
    // the codebook is identical), slice appended, probe must then equal
    // ivfTopK over the full corpus with the same seeds
    val heldOut = emb.filter(col("vec_id") >= nSeeds && col("vec_id") % 7 === 0)
    val partial = emb.exceptAll(heldOut)
    val path2 = java.nio.file.Files.createTempDirectory("graft-ivf2-").toString
    Similarity.writeIvfIndex(partial, "vec_id", "embedding",
      s"ivf2_$suffix", path2, nSeeds)
    Similarity.appendToIvfIndex(spark, s"ivf2_$suffix",
      heldOut, "vec_id", "embedding")
    val viaGrown = rows(Similarity.probeIvfIndex(spark, s"ivf2_$suffix",
      Similarity.vectors(emb, "vec_id", "embedding").filter(col("vec_id") < 20),
      nProbeCells = 2, k = 5))
    assert(viaGrown == direct)

    // an append with a different bucket count must fail fast on the
    // stamped table properties, not silently degrade the bucketed layout
    assertThrows[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, s"ivf2_$suffix",
        heldOut, "vec_id", "embedding", buckets = 8)
    }
  }

  test("mipsMultiProbeTopK: ranks candidates by exact inner product") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val got = Similarity.mipsMultiProbeTopK(emb, "vec_id", "embedding",
        dims = 64, bits = graft.queries.SimilarityQueries.lshBitsFor(n),
        probeMax = 10, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def ip(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    // every returned ip is the true sequential-fold inner product, and
    // ranks within a probe are contiguous from 1 in non-increasing ip order
    got.groupBy(_._1).foreach { case (probe, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length))
      sorted.foreach { case (p, nb, v, _) => assert(v == ip(vecs(p), vecs(nb))) }
      assert(sorted.map(_._3).toSeq ==
        sorted.map(_._3).sorted(Ordering[Double].reverse).toSeq)
    }
  }
}
