package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators (SURVEY §2.8 G1/G3, §2.4 A2/A3/A9).
  *
  * The graph model mirrors the reference's: edges carry
  * (src_domain, src_root, dst_domain, dst_root); "root" plays the role of
  * the root-domain grouping used by the inlink/rank pipeline
  * (LinkGraphDataEmitter.java:302-366 emits, CountInLinksStep.java:42
  * counts, GenDomainRankStep.java:72-77 scores).
  *
  * Scale notes: the only fact-fact shuffle is the edge derivation's
  * equi-join; domain/root dimensions are broadcast. Inlink counting and
  * ranking are single groupBy passes with conditional aggregates.
  */
object LinkGraph {

  /** A9: distinct-edge dedupe + per-edge multiplicity in one pass
    * (the reference dedupes emitted links per source with an in-mapper
    * set; dropDuplicates/groupBy is the distributed equivalent). */
  def distinctEdges(rawEdges: DataFrame): DataFrame =
    rawEdges.groupBy("src_domain", "src_root", "dst_domain", "dst_root")
      .agg(count(lit(1)).as("n_links"))

  /** A2: inlink counts per target domain, split same-root vs cross-root
    * (CountInLinksStep + UniqueIncomingRootDomainCounter semantics). */
  def inlinkCounts(edges: DataFrame): DataFrame = {
    val cross = col("src_root") =!= col("dst_root")
    edges.groupBy(col("dst_domain"), col("dst_root"))
      .agg(
        sum(col("n_links")).as("n_inlinks"),
        count_distinct(col("src_domain")).as("n_src_domains"),
        sum(when(!cross, col("n_links")).otherwise(0L)).as("same_root_links"),
        sum(when(cross, col("n_links")).otherwise(0L)).as("cross_root_links"),
        count_distinct(when(cross, col("src_root"))).as("n_cross_roots"),
      )
  }

  /** G3: inverse link DB — per target, the sorted distinct source-domain
    * list, capped with a truncation flag (bounded sample discipline as in
    * the crawldb fold). */
  def inverseLinkDb(edges: DataFrame, maxSources: Int): DataFrame =
    edges.groupBy(col("dst_domain"))
      .agg(
        // one full distinct set; slice + truncation flag derived from it
        // (a count_distinct alongside would force an Expand in the agg)
        array_sort(collect_set(col("src_domain"))).as("src_set"),
        sum(col("n_links")).as("n_inlinks"),
      )
      .select(col("dst_domain"),
        slice(col("src_set"), 1, maxSources).as("src_domains"),
        (size(col("src_set")) > maxSources).as("src_truncated"),
        col("n_inlinks"))

  /** A3: the reference's domain-rank score
    * (GenDomainRankStep.calcualteScore, GenDomainRankStep.java:72-77):
    * both counts floored at 1, same-root weighted 0.2, capped at 14,
    * scaled to [0,10]. */
  def rankScore(same: Column, diff: Column): Column = {
    val s = greatest(same.cast("double"), lit(1.0))
    val d = greatest(diff.cast("double"), lit(1.0))
    least(sqrt(pow(log(s) * 0.2, 2) + pow(log(d), 2)), lit(14.0)) / 14.0 * 10.0
  }

  /** A3 aggregation feeding [[rankScore]], replicating the reducer's
    * counting rules (GenDomainRankStep.java:57-150):
    *   - same-root inlinks count only if the TARGET's root is a
    *     super-domain;
    *   - cross-root inlinks count per-edge when the SOURCE root is a
    *     super-domain, else once per distinct source root (the Bloom
    *     filter's distinct-tuple semantics).
    * `superRoots` is the broadcast super-domain list (one `root` column).
    */
  def domainRank(edges: DataFrame, superRoots: DataFrame): DataFrame = {
    val e = edges
      .join(broadcast(superRoots.select(col("root").as("dst_super_root"),
        lit(true).as("dst_super"))),
        col("dst_root") === col("dst_super_root"), "left")
      .join(broadcast(superRoots.select(col("root").as("src_super_root"),
        lit(true).as("src_super"))),
        col("src_root") === col("src_super_root"), "left")
      .select(
        col("src_domain"), col("src_root"), col("dst_domain"), col("dst_root"),
        col("n_links"),
        coalesce(col("dst_super"), lit(false)).as("dst_super"),
        coalesce(col("src_super"), lit(false)).as("src_super"))
    val cross = col("src_root") =!= col("dst_root")
    e.groupBy(col("dst_domain"))
      .agg(
        sum(when(!cross && col("dst_super"), col("n_links")).otherwise(0L))
          .as("same_root_inlinks"),
        (sum(when(cross && col("src_super"), col("n_links")).otherwise(0L)) +
          count_distinct(when(cross && !col("src_super"), col("src_root"))))
          .as("cross_root_inlinks"),
      )
      .withColumn("rank_score",
        round(rankScore(col("same_root_inlinks"), col("cross_root_inlinks")), 6))
  }
}
