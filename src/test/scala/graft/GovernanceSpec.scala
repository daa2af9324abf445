package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Property pins for the round-11 governance operators — the claims the
  * DuckDB oracle can't express:
  *  - cu19's content checksum is COMMUTATIVE: any repartitioning or row
  *    order of the same corpus produces the identical manifest (that
  *    invariance is the whole point of a replica-diff audit);
  *  - cu17's split never lets a near-dup cluster straddle the
  *    train/heldout boundary (the leakage guarantee itself);
  *  - c6 classifies a corpus diffed against ITSELF as all-same. */
class GovernanceSpec extends AnyFunSuite with SparkSuite {

  test("cu19 manifest is invariant under repartitioning and row order") {
    val base = Registry.queries("cu19_audit_manifest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val docs = Registry.table(spark, sfDir, "documents")
    // adversarial layout: scramble rows across 7 partitions, then
    // re-run the same aggregate over the scrambled frame
    val scrambled = docs.repartition(7, (col("doc_id") * 2654435761L) % 97)
    val again = scrambled.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        sum(conv(substring(md5(col("text")), 1, 7), 16, 10)
          .cast("long")).as("content_sum"))
      .orderBy("source")
      .collect().map(_.toSeq).toSeq
    assert(again == base)
  }

  test("cu19 catches a single-doc content flip and a double-write") {
    val docs = Registry.table(spark, sfDir, "documents")
    def manifest(df: org.apache.spark.sql.DataFrame) = df.groupBy("source")
      .agg(sum(conv(substring(md5(col("text")), 1, 7), 16, 10)
        .cast("long")).as("content_sum"), count(lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val base = manifest(docs)
    val flipped = manifest(docs.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit("!")))
        .otherwise(col("text"))))
    val doubled = manifest(docs.unionByName(docs.filter(col("doc_id") === 7)))
    val src7 = docs.filter(col("doc_id") === 7).select("source")
      .collect().head.getString(0)
    assert(flipped(src7)._1 != base(src7)._1, "content flip missed")
    assert(flipped.filter(_._1 != src7) == base.filter(_._1 != src7))
    assert(doubled(src7)._2 == base(src7)._2 + 1)
    assert(doubled(src7)._1 != base(src7)._1,
      "a double-write must move the sum (the XOR-checksum failure mode)")
  }

  test("cu17 never splits a near-dup cluster across the boundary") {
    val out = Registry.queries("cu17_leakage_split")(spark, sfDir)
    val straddlers = out.groupBy("cluster_id")
      .agg(count_distinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_splits") > 1)
      .collect()
    assert(straddlers.isEmpty,
      s"clusters straddling the split: ${straddlers.mkString(", ")}")
    // and the guard is non-vacuous: some multi-doc cluster exists
    val multi = out.groupBy("cluster_id").count().filter(col("count") > 1)
    assert(multi.count() > 0, "fixture produced no multi-doc clusters")
  }

  test("cu24 freeze: a batch that re-roots a cluster cannot flip frozen splits") {
    // crafted corpus: the new batch (src0) adds doc 2, a near-dup of the
    // already-split cluster {10, 23} — the full-corpus rep drops 10 → 2,
    // and md5('lsplit:2') buckets to TRAIN while md5('lsplit:10') bucketed
    // the frozen cluster to HELDOUT. A naive re-split would silently move
    // two held-out docs into train; the freeze must not.
    val tA = "the quick brown fox jumps over the lazy dog while seventeen " +
      "pelicans argue about tide tables on the northern jetty every dawn"
    val tB = "carbonated rivers of molten glass poured through the archive " +
      "stacks as the cataloguers indexed each shard by weight and hue"
    val tC = "eleven quiet machines hummed beneath the observatory floor " +
      "recording the slow drift of continents in copper ledgers nightly"
    val tD = "a completely unrelated manifesto about pickled radishes and " +
      "the geometry of bicycle spokes in wintertime municipal parking"
    val rows = Seq(
      (10L, tA, "srcA"), (23L, tA, "srcA"), // old cluster, rep 10 → heldout
      (12L, tB, "srcA"), (13L, tB, "srcA"), // old cluster, rep 12 → train
      (4L, tC, "srcA"), // old singleton → heldout
      (2L, tA, "src0"), // new near-dup re-roots {10,23}'s cluster to 2
      (20L, tD, "src0")) // new never-seen cluster → hashed fresh
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cu24spec-").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.queries("cu24_frozen_split")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    // frozen docs keep their round-1 split even though the re-rooted
    // cluster now hashes to train
    assert(got(10L) == (("heldout", true, true)))
    assert(got(23L) == (("heldout", true, true)))
    // the new bridging doc inherits the anchor's frozen split
    assert(got(2L) == (("heldout", false, true)))
    // untouched old clusters and the never-seen new cluster are stable
    assert(got(12L) == (("train", true, false)))
    assert(got(13L) == (("train", true, false)))
    assert(got(4L) == (("heldout", true, false)))
    assert(got(20L) == (("train", false, false)))
    // non-vacuous: the naive re-split WOULD have flipped assignments
    assert(got.values.count(_._3) == 3, s"expected 3 flipped rows: $got")
  }

  test("c6-style diff of a corpus against itself is all-same") {
    val docs = Registry.table(spark, sfDir, "documents")
    val fp = conv(substring(md5(col("text")), 1, 7), 16, 10).cast("long")
    val a = docs.select(col("doc_id"), col("source"), fp.as("fp_a"))
    val b = docs.select(col("doc_id"), fp.as("fp_b"))
    val diff = a.join(b, Seq("doc_id"), "full_outer")
      .select(when(col("fp_a").isNull, "added")
        .when(col("fp_b").isNull, "removed")
        .when(col("fp_a") =!= col("fp_b"), "changed")
        .otherwise("same").as("status"))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff.keySet == Set("same"))
    assert(diff("same") == docs.count())
  }
}
