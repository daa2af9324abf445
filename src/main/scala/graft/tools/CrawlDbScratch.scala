package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CrawlDb

/** r21 scratch (not part of the library surface): bound the win available
  * from removing c1/c2's ObjectHashAggregate (VERDICT r20 item 4).
  *
  * Variants, all timed warm min-of-N through the noop sink:
  *   full    — production CrawlDb.merge (scalar aggs + 2 collect_set
  *             sample lists → ObjectHashAggregate, no codegen)
  *   scalar  — the same groupBy WITHOUT the sample-list aggregates
  *             (reaches whole-stage-codegen HashAggregate): the upper
  *             bound of what any codegen-friendly restructure can save,
  *             since it does strictly less work than parity requires
  *   twophase— scalar agg + window-pivot min-K sample lists joined back
  *             (full output parity, zero ObjectHashAggregate)
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CrawlDbScratch /root/testdata/sf0.1" }}}
  */
object CrawlDbScratch {

  /** Window-pivot min-K distinct: full-parity sample lists with no
    * ObjectHashAggregate. K is small (cap+1 columns generated). */
  def mergeTwoPhase(status: DataFrame, links: DataFrame,
      maxTypeSamples: Int = CrawlDb.MaxTypeSamples,
      maxSrcSamples: Int = CrawlDb.MaxSrcSamples): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = CrawlDb.taggedUnion(status, links)
    val isS = col("tag") === "status"
    val isL = col("tag") === "link"
    val typeAndRel = when(isL, concat(col("link_type"), lit("/"), col("link_rel")))
    val ord = coalesce(
      concat(
        lpad((unix_millis(col("link_date")) + CrawlDb.OrdMillisBias)
          .cast("string"), 15, "0"),
        lit("|"), typeAndRel,
        lit("|"), lpad(col("link_src").cast("string"), 12, "0")),
      lit(""))
    val scalars = u.groupBy(col("key").as("url_key"))
      .agg(
        sum(when(isS, 1L).otherwise(0L)).as("attempt_count"),
        max(when(isS, col("status"))).as("status"),
        max(when(isS, col("priority"))).as("priority"),
        min(when(isS, col("attempt_ts"))).as("first_attempt"),
        max(when(isS, col("attempt_ts"))).as("latest_attempt"),
        sum(when(isL, 1L).otherwise(0L)).as("link_count"),
        sum(when(isL && col("internal"), 1L).otherwise(0L)).as("int_src_count"),
        sum(when(isL && !col("internal"), 1L).otherwise(0L)).as("ext_src_count"),
        min(when(isL, col("link_date"))).as("earliest_link_date"),
        max(when(isL, col("link_date"))).as("latest_link_date"),
        max(ord).as("latest_link_ord"),
        sum(when(isL, col("qty")).otherwise(0.0)).as("sum_qty"))
    def minK(src: DataFrame, valCol: String, k: Int, outCol: String) = {
      val d = src.where(col(valCol).isNotNull).distinct()
      val rk = row_number().over(
        Window.partitionBy("key").orderBy(col(valCol)))
      d.withColumn("rk", rk).where(col("rk") <= k + 1)
        .groupBy(col("key"))
        .agg(
          array_compact(array((1 to k).map(i =>
            max(when(col("rk") === i, col(valCol)))): _*)).as(outCol),
          (count(lit(1)) > k).as(s"${outCol}_trunc"))
    }
    val lk = links
    val tr = minK(lk.select(col("key"),
        concat(col("link_type"), lit("/"), col("link_rel")).as("tv")),
      "tv", maxTypeSamples, "type_and_rels")
    val sr = minK(lk.select(col("key"), col("link_src").as("sv")),
      "sv", maxSrcSamples, "src_samples")
    scalars
      .join(tr.select(col("key").as("url_key"), col("type_and_rels")),
        Seq("url_key"), "left")
      .join(sr.select(col("key").as("url_key"), col("src_samples"),
        col("src_samples_trunc")), Seq("url_key"), "left")
      .select(
        col("url_key"), col("attempt_count"), col("status"), col("priority"),
        col("first_attempt"), col("latest_attempt"), col("link_count"),
        col("int_src_count"), col("ext_src_count"), col("earliest_link_date"),
        col("latest_link_date"), col("latest_link_ord"),
        coalesce(col("type_and_rels"), array().cast("array<string>"))
          .as("type_and_rels"),
        coalesce(col("src_samples"), array().cast("array<bigint>"))
          .as("src_samples"),
        coalesce(col("src_samples_trunc"), lit(false)).as("src_truncated"),
        col("sum_qty"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Registry
    val status = Registry.table(spark, sfDir, "orders").select(
      col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"), col("o_orderdate").as("attempt_ts"))
    val links = Registry.table(spark, sfDir, "lineitem").select(
      col("l_orderkey").as("key"), col("l_returnflag").as("link_type"),
      col("l_linestatus").as("link_rel"), col("l_shipdate").as("link_date"),
      col("l_partkey").as("link_src"),
      (col("l_returnflag") === "N").as("internal"),
      col("l_quantity").as("qty"))
    val scalarOnly = CrawlDb.taggedUnion(status, links)
    def scalarMerge: DataFrame = {
      val isS = col("tag") === "status"
      val isL = col("tag") === "link"
      scalarOnly.groupBy(col("key").as("url_key"))
        .agg(
          sum(when(isS, 1L).otherwise(0L)).as("attempt_count"),
          max(when(isS, col("status"))).as("status"),
          max(when(isS, col("priority"))).as("priority"),
          min(when(isS, col("attempt_ts"))).as("first_attempt"),
          max(when(isS, col("attempt_ts"))).as("latest_attempt"),
          sum(when(isL, 1L).otherwise(0L)).as("link_count"),
          min(when(isL, col("link_date"))).as("earliest_link_date"),
          max(when(isL, col("link_date"))).as("latest_link_date"),
          sum(when(isL, col("qty")).otherwise(0.0)).as("sum_qty"))
    }
    // fused: rank the link stream BEFORE the union, then ONE codegen
    // groupBy computes the scalar fold and the rank-slot pivots together
    // (no second aggregate, no join-back)
    def mergeFused(maxTypeSamples: Int, maxSrcSamples: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wK = Window.partitionBy("key")
      val tv = concat(col("link_type"), lit("/"), col("link_rel"))
      val rankedLinks = links
        .withColumn("tv", tv)
        .withColumn("rkt", dense_rank().over(wK.orderBy(col("tv").asc_nulls_last)))
        .withColumn("rks", dense_rank().over(wK.orderBy(col("link_src").asc_nulls_last)))
      val nullI = lit(null).cast("int")
      val s = status.select(
        col("key"), lit("status").as("tag"),
        col("status"), col("priority"), col("attempt_ts"),
        lit(null).cast("string").as("tv"), lit(null).cast("timestamp").as("link_date"),
        lit(null).cast("bigint").as("link_src"), lit(null).cast("boolean").as("internal"),
        lit(null).cast("double").as("qty"), nullI.as("rkt"), nullI.as("rks"))
      val l = rankedLinks.select(
        col("key"), lit("link").as("tag"),
        lit(null).cast("string").as("status"), lit(null).cast("string").as("priority"),
        lit(null).cast("timestamp").as("attempt_ts"),
        col("tv"), col("link_date"), col("link_src"), col("internal"),
        col("qty"), col("rkt"), col("rks"))
      val u = s.unionByName(l)
      val isS = col("tag") === "status"
      val isL = col("tag") === "link"
      val ord = coalesce(
        concat(
          lpad((unix_millis(col("link_date")) + CrawlDb.OrdMillisBias)
            .cast("string"), 15, "0"),
          lit("|"), col("tv"),
          lit("|"), lpad(col("link_src").cast("string"), 12, "0")),
        lit(""))
      u.groupBy(col("key").as("url_key"))
        .agg(
          sum(when(isS, 1L).otherwise(0L)).as("attempt_count"),
          max(when(isS, col("status"))).as("status"),
          max(when(isS, col("priority"))).as("priority"),
          min(when(isS, col("attempt_ts"))).as("first_attempt"),
          max(when(isS, col("attempt_ts"))).as("latest_attempt"),
          sum(when(isL, 1L).otherwise(0L)).as("link_count"),
          sum(when(isL && col("internal"), 1L).otherwise(0L)).as("int_src_count"),
          sum(when(isL && !col("internal"), 1L).otherwise(0L)).as("ext_src_count"),
          min(when(isL, col("link_date"))).as("earliest_link_date"),
          max(when(isL, col("link_date"))).as("latest_link_date"),
          max(ord).as("latest_link_ord"),
          array_compact(array((1 to maxTypeSamples).map(i =>
            max(when(col("rkt") === i, col("tv")))): _*)).as("type_and_rels"),
          array_compact(array((1 to maxSrcSamples).map(i =>
            max(when(col("rks") === i, col("link_src")))): _*)).as("src_samples"),
          coalesce(max(when(col("link_src").isNotNull, col("rks"))) > maxSrcSamples,
            lit(false)).as("src_truncated"),
          sum(when(isL, col("qty")).otherwise(0.0)).as("sum_qty"))
        .select(
          col("url_key"), col("attempt_count"), col("status"), col("priority"),
          col("first_attempt"), col("latest_attempt"), col("link_count"),
          col("int_src_count"), col("ext_src_count"), col("earliest_link_date"),
          col("latest_link_date"), col("latest_link_ord"), col("type_and_rels"),
          col("src_samples"), col("src_truncated"), col("sum_qty"))
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "full" -> (() => CrawlDb.merge(status, links, maxSrcSamples = 3)
        .orderBy("url_key")),
      "scalar" -> (() => scalarMerge.orderBy("url_key")),
      "twophase" -> (() => mergeTwoPhase(status, links, maxSrcSamples = 3)
        .orderBy("url_key")),
      "fused" -> (() => mergeFused(CrawlDb.MaxTypeSamples, 3)
        .orderBy("url_key")))
    // INTERLEAVED runs: a fixed variant order hands the later variants
    // free JIT/codegen warmth and biases the comparison
    (1 to 4).foreach { i =>
      variants.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        println(f"[crawldbscratch] $name%-9s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    // parity check: twophase and fused must equal full exactly
    val a = CrawlDb.merge(status, links, maxSrcSamples = 3)
    val b = mergeTwoPhase(status, links, maxSrcSamples = 3)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[crawldbscratch] twophase parity diff rows = $diff")
    val c = mergeFused(CrawlDb.MaxTypeSamples, 3)
    val diffC = a.exceptAll(c).count() + c.exceptAll(a).count()
    println(s"[crawldbscratch] fused parity diff rows = $diffC")
    spark.stop()
  }
}
