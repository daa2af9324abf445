package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage — SURVEY.md §2.2 (filters), §2.3 (joins),
  * §2.4 (aggregations), §2.5 (windows), §2.6 (sorts/limits/set ops) —
  * re-expressed over the driver test tables.
  *
  * Oracle-parity rules used throughout:
  *   - double aggregates go through exact DECIMAL(18,2) arithmetic and are
  *     cast back to DOUBLE at the end, so Spark and DuckDB produce
  *     bit-identical doubles regardless of summation order;
  *   - every query has a total deterministic ORDER BY (sort field + key
  *     tiebreaker) in both the Spark plan and the oracle SQL.
  *
  * Scale notes: dimension sides (region, nation, probe lists) are broadcast
  * explicitly; fact-fact joins shuffle on their equi-keys; window queries
  * shuffle once on the partition key. No plan here carries a cross join or
  * a driver-side collect.
  */
object RelationalQueries {
  import Registry.table

  /** Exact-decimal view of a double column holding 2-decimal money values. */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  def defs: Seq[Q] = Seq(
    // ---- A1-analog: the big fold — pricing summary over lineitem.
    // groupBy + partial aggregation (map-side combine is automatic).
    Q(
      "q1_agg",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"),
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim),
    ),

    // ---- J1/J5-analog: multi-hop equi-join through two broadcast dims
    // (customer ⋈ nation ⋈ region). Reference: pipeline join steps
    // (DNSAndCrawlStatsJoinStep etc.) chain small-dim equi-joins the same
    // way; dims are broadcast so the only shuffle is the final groupBy.
    Q(
      "j1_multihop_join",
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val nation = table(s, dir, "nation")
        val region = table(s, dir, "region")
        cust
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            sum(dec2(col("c_acctbal"))).cast("double").as("sum_acctbal"),
          )
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
      """.stripMargin.trim),
    ),

    // ---- J6-analog: bulk point-lookup join — a small probe list of keys
    // resolved against the big fact table (DatabaseIndexV2
    // bulkQueryURLAndMetadataGivenInputStream semantics). The probe side is
    // broadcast, so the fact table is scanned once with no shuffle.
    Q(
      "j2_bulk_lookup",
      (s, dir) => {
        val probes = table(s, dir, "customer")
          .filter(col("c_custkey") % 150 === 0)
          .select(col("c_custkey"), col("c_name"))
        val orders = table(s, dir, "orders")
        orders
          .join(broadcast(probes), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("sum_total"),
          )
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders
        JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 150 = 0) p
          ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey
      """.stripMargin.trim),
    ),

    // ---- O7: anti-join exclusion — customers with no completed ('F')
    // order. Reference excludes via blacklist filter files; the scale shape
    // is a left-anti join (bloom-gated by Spark's runtime filter).
    Q(
      "j3_anti_join",
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val done = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
        cust
          .join(done, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        ORDER BY c_custkey
      """.stripMargin.trim),
    ),

    // ---- J8-analog: existence (semi) join — nations that have at least
    // one high-balance supplier. Bloom/semi-join existence filter shape.
    Q(
      "j4_semi_join",
      (s, dir) => {
        val nation = table(s, dir, "nation")
        val rich = table(s, dir, "supplier").filter(col("s_acctbal") > 8000.0)
        nation
          .join(rich, col("n_nationkey") === col("s_nationkey"), "left_semi")
          .select(col("n_nationkey"), col("n_name"))
          .orderBy(col("n_nationkey"))
      },
      Some("""
        SELECT n_nationkey, n_name
        FROM nation n
        WHERE EXISTS (
          SELECT 1 FROM supplier s
          WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 8000.0)
        ORDER BY n_nationkey
      """.stripMargin.trim),
    ),

    // ---- F1/F4: regex scan (DomainListQuery-style pattern match pushed to
    // the scan) + aggregation.
    Q(
      "f1_rlike_scan",
      (s, dir) =>
        table(s, dir, "part")
          .filter(col("p_type").rlike("^(PROMO|ECONOMY)"))
          .groupBy(col("p_brand"), col("p_type"))
          .agg(
            count(lit(1)).as("n_parts"),
            sum(dec2(col("p_retailprice"))).cast("double").as("sum_retail"),
          )
          .orderBy(col("p_brand"), col("p_type")),
      Some("""
        SELECT p_brand, p_type, COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_retail
        FROM part
        WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)')
        GROUP BY p_brand, p_type
        ORDER BY p_brand, p_type
      """.stripMargin.trim),
    ),

    // ---- W1/A8: top-K per group — top-3 customers per market segment by
    // balance (SegmenterReducer ≤200-per-host / top-2-by-rank shape).
    // Groups are zipf-skewed at crawl scale, so the selection runs as the
    // bounded-heap aggregate (≤k rows per group per mapper, partial→
    // final, no window sort of a whole group); the O(groups·k) winner
    // set then broadcast-joins back for the payload column.
    Q(
      "w1_topk_per_group",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val winners = c
          .groupBy(col("c_mktsegment"))
          .agg(graft.ops.TopK.topScored(3)(
            col("c_acctbal"), col("c_custkey")).as("top"))
          .select(col("c_mktsegment"), posexplode(col("top")))
          .select((col("pos") + 1).cast("long").as("rank"),
            col("col.key").as("c_custkey"))
        c.select("c_custkey", "c_mktsegment", "c_name", "c_acctbal")
          .join(broadcast(winners), "c_custkey")
          .select(col("c_mktsegment"), col("rank"), col("c_custkey"),
            col("c_name"), col("c_acctbal"))
          .orderBy(col("c_mktsegment"), col("rank"))
      },
      Some("""
        SELECT c_mktsegment, rank, c_custkey, c_name, c_acctbal
        FROM (
          SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
          FROM customer)
        WHERE rank <= 3
        ORDER BY c_mktsegment, rank
      """.stripMargin.trim),
    ),

    // ---- W2/S5: deterministic offset pagination — page 6 of orders by
    // price desc with a total order (price, orderkey) so OFFSET is stable
    // (PositionBasedSequenceFileIndex.readPaginatedResults semantics).
    Q(
      "w2_pagination",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .offset(100)
          .limit(20),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20 OFFSET 100
      """.stripMargin.trim),
    ),

    // ---- W3: dual-sort-order listing — one aggregate materialized with
    // ranks under BOTH sort orders (DatabaseIndexV2 indexedByURL /
    // indexedByPR dual indexes collapse to two window functions).
    Q(
      "w3_dual_sort",
      // CARDINALITY ASSUMPTION: the two global (unpartitioned)
      // Window.orderBy's below move their input to ONE partition — safe
      // only because the input is the 25-row per-nation aggregate, and
      // still safe at 100 TB (nation count doesn't scale with data). On
      // an unaggregated input this exact shape is a scale-killer: global
      // rankings over large inputs must partition (zipWithIndex over a
      // range-partitioned sort, or rank within partitions + offset).
      (s, dir) => {
        val perNation = table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_cust"))
        perNation
          .withColumn("rank_by_name",
            row_number().over(Window.orderBy(col("n_name").asc)).cast("long"))
          .withColumn("rank_by_count",
            row_number().over(
              Window.orderBy(col("n_cust").desc, col("n_name").asc)).cast("long"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name, n_cust,
               ROW_NUMBER() OVER (ORDER BY n_name ASC) AS rank_by_name,
               ROW_NUMBER() OVER (ORDER BY n_cust DESC, n_name ASC) AS rank_by_count
        FROM (
          SELECT n_name, COUNT(*) AS n_cust
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name)
        ORDER BY n_name
      """.stripMargin.trim),
    ),

    // ---- W4: aggregate-over-group-window — each line's share of its
    // order's total, plus the order max (maxPageRank-per-bundle shape).
    // Decimal sums keep the divisions bit-identical across engines.
    Q(
      "w4_window_share",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
        table(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (dec2(col("l_extendedprice")).cast("double") /
              sum(dec2(col("l_extendedprice"))).over(w).cast("double"))
              .as("price_share"),
            max(dec2(col("l_extendedprice"))).over(w).cast("double")
              .as("order_max"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                        OVER (PARTITION BY l_orderkey) AS DOUBLE) AS price_share,
               CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_max
        FROM lineitem
        WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber
      """.stripMargin.trim),
    ),

    // ---- W5/A8 scale path: top-k per group via a bounded-heap aggregate
    // (graft.ops.TopK) instead of a window sort. Same semantics as
    // w1_topk_per_group's row_number ≤ 3 but only ≤k rows per group per
    // mapper cross the shuffle (ObjectHashAggregate partial → final, no
    // WindowExec) — the shape that survives a domain with 10^9 pages.
    Q(
      "w5_topk_heap",
      (s, dir) =>
        table(s, dir, "customer")
          .groupBy(col("c_mktsegment"))
          .agg(graft.ops.TopK.topKKeys(3)(col("c_acctbal"), col("c_custkey"))
            .as("top_custkeys"))
          .orderBy(col("c_mktsegment")),
      Some("""
        SELECT c_mktsegment,
               string_agg(CAST(c_custkey AS VARCHAR), ','
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS top_custkeys
        FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer)
        WHERE rn <= 3
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
      """.stripMargin.trim),
    ),

    // ---- O6: tagged union of heterogeneous inputs (JoinMapper path→tag
    // semantics): customer + supplier as one "account" stream with a tag
    // column, aggregated per tag.
    Q(
      "o6_union_tagged",
      (s, dir) => {
        val cust = table(s, dir, "customer")
          .select(lit("customer").as("tag"), col("c_acctbal").as("acctbal"))
        val supp = table(s, dir, "supplier")
          .select(lit("supplier").as("tag"), col("s_acctbal").as("acctbal"))
        cust.unionByName(supp)
          .groupBy(col("tag"))
          .agg(
            count(lit(1)).as("n_accounts"),
            sum(dec2(col("acctbal"))).cast("double").as("sum_acctbal"),
          )
          .orderBy(col("tag"))
      },
      Some("""
        SELECT tag, COUNT(*) AS n_accounts,
               CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM (
          SELECT 'customer' AS tag, c_acctbal AS acctbal FROM customer
          UNION ALL
          SELECT 'supplier' AS tag, s_acctbal AS acctbal FROM supplier)
        GROUP BY tag
        ORDER BY tag
      """.stripMargin.trim),
    ),

    // ---- A5-analog: conditional-sum pivot — order-status histogram per
    // priority (CrawlerStats http-result-class rollup shape: one pass,
    // N conditional aggregates).
    Q(
      "a5_status_pivot",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_done"),
            sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"),
            sum(when(col("o_orderstatus") === "F", dec2(col("o_totalprice")))
              .otherwise(lit(0).cast("decimal(18,2)")))
              .cast("double").as("done_revenue"),
          )
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(o_totalprice AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS done_revenue
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.stripMargin.trim),
    ),

    // ---- A10: composite stats via CUBE — all (returnflag, linestatus)
    // grouping sets in one pass (the reference simulates this with a
    // key_type column; Spark/DuckDB have the real operator).
    Q(
      "a10_cube_stats",
      (s, dir) =>
        table(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
            col("n_lines"), col("sum_qty"))
          .orderBy(col("returnflag"), col("linestatus")),
      Some("""
        SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
               COALESCE(l_linestatus, '(all)') AS linestatus,
               COUNT(*) AS n_lines, SUM(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus
      """.stripMargin.trim),
    ),

    // ---- X5-analog: date bucketing — monthly order rollup via
    // date_trunc (util/time Hour/Day period bucketing semantics).
    Q(
      "x5_month_rollup",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
          )
          .orderBy(col("month")),
      Some("""
        SELECT date_trunc('month', o_orderdate) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY date_trunc('month', o_orderdate)
        ORDER BY month
      """.stripMargin.trim),
    ),

    // ---- As-of (point-in-time) join: each click event joined to the most
    // recent purchase state at-or-before it per user — the time-series
    // append log (S8, SURVEY §1.6) probed at query timestamps. Runs the
    // BUCKETED variant (1-day buckets) so the heavy window is bounded per
    // (user, day) no matter how long one user's history grows; the spec
    // pins bucketed ≡ plain. Build side deduped to one row per (key, ts)
    // as the operator requires.
    Q(
      "j7_asof_join",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val st = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("asof_value"))
        val pr = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.ops.AsOfJoin
          .backwardBucketed(pr, st, "user_id", "ts", bucketWidthSec = 86400L)
          .select(col("event_id"), col("user_id"), col("ts"), col("asof_value"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH st AS (
          SELECT user_id, ts, MAX(value) AS asof_value
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        ), pr AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), u AS (
          SELECT user_id, ts, 0 AS seq, asof_value, CAST(NULL AS BIGINT) AS event_id FROM st
          UNION ALL
          SELECT user_id, ts, 1 AS seq, CAST(NULL AS DOUBLE) AS asof_value, event_id FROM pr
        ), f AS (
          SELECT user_id, ts, seq, event_id,
                 LAST_VALUE(asof_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value_f
          FROM u
        )
        SELECT event_id, user_id, ts, asof_value_f AS asof_value
        FROM f WHERE seq = 1 ORDER BY event_id
      """.stripMargin.trim),
    ),

    // ---- Bounded-memory heavy hitters: suppliers holding ≥0.5% of all
    // lineitems via the Misra-Gries mergeable sketch — ≤4096 counters per
    // partial aggregate cross the shuffle instead of one row per distinct
    // key. Capacity ≥ distinct suppliers at every test SF, so the sketch's
    // answer is provably exact and a plain GROUP BY oracles it; the
    // eviction regime is spec-pinned (SketchesSpec).
    Q(
      "a11_heavy_hitters",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.agg(
            graft.ops.Sketches.frequentItems(4096)(col("l_suppkey").cast("string")).as("hh"),
            count(lit(1)).as("total"))
          .select(explode(col("hh")).as("h"), col("total"))
          .select(col("h.key").cast("long").as("suppkey"),
            col("h.count").as("est_count"), col("total"))
          .filter(col("est_count") * 200 >= col("total"))
          .select(col("suppkey"), col("est_count"))
          .orderBy(desc("est_count"), col("suppkey"))
      },
      Some("""
        SELECT l_suppkey AS suppkey, COUNT(*) AS est_count
        FROM lineitem
        GROUP BY l_suppkey
        HAVING COUNT(*) * 200 >= (SELECT COUNT(*) FROM lineitem)
        ORDER BY est_count DESC, suppkey
      """.stripMargin.trim),
    ),

    // ---- Sketch ROLLUP: per-day heavy-hitter summaries re-merged into
    // the corpus-wide report — the path where sketch state is persisted
    // as plain (key, count) rows (per day / shard / micro-batch) and
    // re-aggregated later WITHOUT rescanning the corpus. Capacity 4096
    // covers the 1.5k users at every test SF, so each daily summary and
    // the merged one are exact and a plain GROUP BY oracles the rollup;
    // lossy-rollup error composition is spec-pinned (SketchesSpec).
    Q(
      "a13_sketch_rollup",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val daily = ev
          .groupBy(to_date(col("ts")).as("day"))
          .agg(graft.ops.Sketches.frequentItems(4096)(
            col("user_id").cast("string")).as("hh"))
        val total = ev.agg(count(lit(1)).as("total"))
        daily.select(explode(col("hh")).as("h"))
          .agg(graft.ops.Sketches.mergeFrequent(4096)(col("h.key"), col("h.count")).as("merged"))
          .crossJoin(broadcast(total))
          .select(explode(col("merged")).as("h"), col("total"))
          .select(col("h.key").cast("long").as("user_id"),
            col("h.count").as("est_count"), col("total"))
          .filter(col("est_count") * 1200 >= col("total"))
          .select(col("user_id"), col("est_count"))
          .orderBy(desc("est_count"), col("user_id"))
      },
      Some("""
        SELECT user_id, COUNT(*) AS est_count
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) * 1200 >= (SELECT COUNT(*) FROM events)
        ORDER BY est_count DESC, user_id
      """.stripMargin.trim),
    ),

    // ---- Distinct-count sketch ROLLUP: per-(type, day) KMV states
    // persisted as plain rows, re-merged into per-type distinct-user
    // counts — COUNT(DISTINCT) without re-shuffling one row per distinct
    // key, and without rescanning when a new day arrives. k=4096 covers
    // the 1.5k users at every test SF so the estimate is exact and a
    // plain COUNT(DISTINCT) oracles it; the lossy-regime error bound and
    // the merge-tree-invariance of KMV state are spec-pinned
    // (SketchesSpec).
    Q(
      "a14_distinct_rollup",
      (s, dir) => {
        val ev = table(s, dir, "events")
        ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(graft.ops.Sketches.distinctState(4096)(
            col("user_id").cast("string")).as("st"))
          .groupBy(col("event_type"))
          .agg(graft.ops.Sketches.mergeDistinct(4096)(
            col("st.hashes"), col("st.full")).as("distinct_users"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.stripMargin.trim),
    ),

    // ---- Count-Min sketch: the remaining classic mergeable summary —
    // point-frequency estimates from d×w integer cells (d=3 rows, w=64
    // columns; cell = md5-derived column per row-salt). The state IS a
    // (r, c) → count table, so in Spark it falls out of ONE partial-agg'd
    // groupBy over the salted explode: ≤192 counters per partition cross
    // the shuffle regardless of key cardinality — the sketch's memory
    // bound, by construction — and merging replicas is the same SUM
    // (commutative, partition/append-invariant). Estimates for the
    // top-10 exact heavy keys (evaluation-only ground truth, as
    // ss11/d12) take min over the key's d cells from the BROADCAST
    // 192-row state; 1.5k users over 192 cells puts ~23 keys in every
    // cell, so the one-sided CM overestimate (est ≥ exact always) is
    // real and measured, not vacuous. All hashes/counts integer-exact
    // in both engines (the cu14 md5-hex idiom).
    Q(
      "a20_countmin",
      (s, dir) => {
        val d = 3
        val w = 64
        val ev = table(s, dir, "events")
        val keyed = ev.select(col("user_id").cast("string").as("k"))
        def cellOf(r: Column, k: Column): Column =
          conv(substring(md5(concat(r.cast("string"), lit(":"), k)), 1, 7),
            16, 10).cast("long") % w
        val salts = explode(array((0 until d).map(lit): _*)).as("r")
        val cells = keyed.select(salts, col("k"))
          .select(col("r"), cellOf(col("r"), col("k")).as("c"))
          .groupBy("r", "c")
          .agg(count(lit(1)).as("cell_cnt"))
        val exact = keyed.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
        val probes = exact.orderBy(col("exact_cnt").desc, col("k")).limit(10)
        probes.select(col("k"), col("exact_cnt"), salts)
          .select(col("k"), col("exact_cnt"), col("r"),
            cellOf(col("r"), col("k")).as("c"))
          .join(broadcast(cells), Seq("r", "c"))
          .groupBy("k", "exact_cnt")
          .agg(min(col("cell_cnt")).cast("long").as("est_cnt"))
          .select(col("k").cast("long").as("user_id"),
            col("exact_cnt"), col("est_cnt"))
          .orderBy(col("exact_cnt").desc, col("user_id"))
      },
      Some("""
        WITH k AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        rs AS (SELECT unnest([0, 1, 2]) AS r),
        cells AS (
          SELECT r,
                 ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || k), 1, 7))::BIGINT
                   % 64 AS c,
                 COUNT(*) AS cell_cnt
          FROM k CROSS JOIN rs
          GROUP BY 1, 2),
        exact AS (SELECT k, COUNT(*) AS exact_cnt FROM k GROUP BY 1),
        probes AS (
          SELECT k, exact_cnt FROM exact ORDER BY exact_cnt DESC, k LIMIT 10),
        pr AS (
          SELECT p.k, p.exact_cnt, rs.r,
                 ('0x' || substr(md5(CAST(rs.r AS VARCHAR) || ':' || p.k), 1, 7))::BIGINT
                   % 64 AS c
          FROM probes p CROSS JOIN rs)
        SELECT CAST(pr.k AS BIGINT) AS user_id, pr.exact_cnt,
               CAST(MIN(cells.cell_cnt) AS BIGINT) AS est_cnt
        FROM pr JOIN cells ON cells.r = pr.r AND cells.c = pr.c
        GROUP BY 1, 2
        ORDER BY exact_cnt DESC, user_id
      """.stripMargin.trim),
    ),

    // ---- KMV multiset ops: pairwise audience overlap between event
    // types computed from the per-type persisted sketch states ALONE —
    // at 100 TB this is |A ∩ B| of two corpus-scale key sets from two
    // k-row summaries, with no join of the corpora. k=4096 covers the
    // users, so the estimate is exact and a DISTINCT self-join oracles
    // it; the lossy-regime Jaccard estimator is spec-pinned.
    Q(
      "a15_sketch_overlap",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val st = ev.groupBy(col("event_type"))
          .agg(graft.ops.Sketches.distinctState(4096)(
            col("user_id").cast("string")).as("st"))
        val a = st.select(col("event_type").as("type_a"), col("st").as("sa"))
        val b = st.select(col("event_type").as("type_b"), col("st").as("sb"))
        a.join(broadcast(b), col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            graft.ops.Sketches.intersectDistinct(4096)(
              col("sa.hashes"), col("sa.full"),
              col("sb.hashes"), col("sb.full")).as("overlap"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""
        WITH s AS (SELECT DISTINCT event_type, user_id FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS overlap
        FROM s a JOIN s b ON a.user_id = b.user_id
         AND a.event_type < b.event_type
        GROUP BY 1, 2
        ORDER BY 1, 2
      """.stripMargin.trim),
    ),

    // ---- Mergeable quantile sketch: per-language document-length
    // quartiles via the KLL-style bounded buffer — O(cap · log(n/cap))
    // state per partial aggregate instead of a per-group full sort
    // (cu2's exact ntile path). Capacity ≥ the largest group at every
    // test SF, so the sketch's lower-rank answers are provably exact and
    // DuckDB's quantile_disc (same ceil(q·n)−1 rank) oracles them;
    // the compaction regime's error bound is SketchesSpec-pinned.
    Q(
      "a12_quantile_sketch",
      (s, dir) => {
        val d = table(s, dir, "documents")
        d.groupBy(col("lang"))
          .agg(
            graft.ops.Sketches.quantiles(4096, Seq(0.25, 0.5, 0.75))(
              col("n_chars").cast("double")).as("qs"),
            count(lit(1)).as("n_docs"))
          .select(col("lang"),
            element_at(col("qs"), 1).cast("long").as("p25"),
            element_at(col("qs"), 2).cast("long").as("p50"),
            element_at(col("qs"), 3).cast("long").as("p75"),
            col("n_docs"))
          .orderBy(col("lang"))
      },
      Some("""
        SELECT lang,
               quantile_disc(n_chars, 0.25) AS p25,
               quantile_disc(n_chars, 0.5) AS p50,
               quantile_disc(n_chars, 0.75) AS p75,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang
      """.stripMargin.trim),
    ),

    // ---- Quantile-state ROLLUP: per-(lang, source) KLL states persisted
    // as plain rows, re-merged into per-language quartiles — the same
    // store-slices-now, aggregate-later path as a13/a14 but for RANKS.
    // Exact here because no slice compacts (capacity covers each
    // language) and the merged totals stay ≤ capacity, so the a12 oracle
    // applies unchanged; the compaction-regime error is spec-bounded.
    Q(
      "a16_quantile_rollup",
      (s, dir) => {
        val d = table(s, dir, "documents")
        d.groupBy(col("lang"), col("source"))
          .agg(
            graft.ops.Sketches.quantileState(4096)(
              col("n_chars").cast("double")).as("qs"),
            count(lit(1)).as("n_docs"))
          .groupBy(col("lang"))
          .agg(
            graft.ops.Sketches.mergeQuantiles(4096, Seq(0.25, 0.5, 0.75))(
              col("qs.levels"), col("qs.parities"), col("qs.n")).as("qs"),
            sum(col("n_docs")).as("n_docs"))
          .select(col("lang"),
            element_at(col("qs"), 1).cast("long").as("p25"),
            element_at(col("qs"), 2).cast("long").as("p50"),
            element_at(col("qs"), 3).cast("long").as("p75"),
            col("n_docs"))
          .orderBy(col("lang"))
      },
      Some("""
        SELECT lang,
               quantile_disc(n_chars, 0.25) AS p25,
               quantile_disc(n_chars, 0.5) AS p50,
               quantile_disc(n_chars, 0.75) AS p75,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang
      """.stripMargin.trim),
    ),
    // ---- Bloom membership GATE: the reference's URLFPBloomFilter
    // (2^26-entry, gating crawldb dedup work —
    // CrawlDBMergingReducer.java:160-162,296) as an exactly-replayable
    // structure: the filter state is the bounded set of set BITS (≤ m
    // rows however big the corpus), built from md5-derived positions so
    // the oracle replays the filter — including any false positives —
    // bit-identically. Candidates are half corpus fingerprints (must
    // all hit: Blooms have no false negatives) and half salted-absent
    // keys (hits here are the deterministic FP set). The confusion
    // matrix with doc_id sums is the gate.
    Q(
      "a17_bloom_gate",
      (s, dir) => {
        val m = 1 << 18
        val kH = 3
        val docs = table(s, dir, "documents")
        val bits = graft.ops.Sketches.bloomBits(
          docs.select(md5(col("text").cast("binary")).as("f")), "f", m, kH)
        val cands = docs.select(col("doc_id"),
          when(col("doc_id") % 2 === 0, md5(col("text").cast("binary")))
            .otherwise(md5(concat(col("text"), lit(":absent")).cast("binary")))
            .as("f"),
          when(col("doc_id") % 2 === 0, "present").otherwise("absent")
            .as("actual"))
        graft.ops.Sketches.bloomProbe(bits, cands, "f", m, kH)
          .groupBy(col("actual"), col("in_bloom"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
          .orderBy("actual", "in_bloom")
      },
      Some("""
        WITH corpus AS (SELECT DISTINCT md5(text) AS f FROM documents),
        bits AS (
          SELECT DISTINCT
                 ('0x' || substr(md5('b' || i || ':' || f), 1, 7))::BIGINT
                   % 262144 AS bit
          FROM corpus, range(0, 3) t(i)),
        cand AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN md5(text)
                      ELSE md5(text || ':absent') END AS f,
                 CASE WHEN doc_id % 2 = 0 THEN 'present'
                      ELSE 'absent' END AS actual
          FROM documents),
        probe AS (
          SELECT doc_id, actual,
                 ('0x' || substr(md5('b' || i || ':' || f), 1, 7))::BIGINT
                   % 262144 AS bit
          FROM cand, range(0, 3) t(i)),
        verdict AS (
          SELECT doc_id, actual, COUNT(h.hit) = 3 AS in_bloom
          FROM probe LEFT JOIN (SELECT bit, 1 AS hit FROM bits) h USING (bit)
          GROUP BY doc_id, actual)
        SELECT actual, in_bloom, COUNT(*) AS n,
               CAST(SUM(doc_id) AS BIGINT) AS sum_id
        FROM verdict GROUP BY actual, in_bloom ORDER BY actual, in_bloom
      """.stripMargin.trim),
    ),
    // A18: single-artifact table profiler — per-column row/null/distinct/
    // mode-frequency stats, the data-quality report a pipeline runs before
    // and after every transform. One union branch per column; each branch's
    // scan prunes to exactly that column (columnar-friendly: the branches
    // read disjoint single-column projections, not N full scans), and every
    // branch is a two-level partial-agg'd groupBy — the inner groupBy is on
    // the column's distinct values (map-side combined), the outer folds the
    // O(ndv) group counts, so no value list ever sits on one task. All
    // metrics are count-valued BIGINTs: value equality happens on native
    // types inside each engine and no formatted value crosses the oracle
    // boundary (double/timestamp rendering never enters the hash).
    Q(
      "a18_table_profile",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val cols = Seq("event_id", "event_type", "props", "ts", "user_id", "value")
        cols.map { c =>
          ev.select(col(c).as("v"))
            .groupBy("v").agg(count(lit(1)).as("cnt"))
            .agg(
              sum(col("cnt")).as("n_rows"),
              coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
              count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
              coalesce(max(when(col("v").isNotNull, col("cnt"))), lit(0L)).as("mode_count"))
            .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
              col("n_distinct"), col("mode_count"))
        }.reduce(_ unionByName _).orderBy("column_name")
      },
      Some {
        val branch = (c: String) => s"""
          |SELECT '$c' AS column_name,
          |       CAST(SUM(cnt) AS BIGINT) AS n_rows,
          |       CAST(coalesce(SUM(CASE WHEN v IS NULL THEN cnt END), 0) AS BIGINT) AS n_nulls,
          |       COUNT(CASE WHEN v IS NOT NULL THEN 1 END) AS n_distinct,
          |       CAST(coalesce(MAX(CASE WHEN v IS NOT NULL THEN cnt END), 0) AS BIGINT) AS mode_count
          |FROM (SELECT $c AS v, COUNT(*) AS cnt FROM events GROUP BY 1)""".stripMargin.trim
        Seq("event_id", "event_type", "props", "ts", "user_id", "value")
          .map(branch).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      },
    ),

    // ---- HyperLogLog register sketch (a21): the canonical cardinality
    // summary (Flajolet et al. 2007) that KMV (a14) approximates from the
    // other direction — m=256 registers, register j = max ρ(hash) over the
    // items whose hash prefix lands in bucket j, where ρ = leading-zero
    // rank of a 40-bit md5-derived suffix. The state is a ≤256-row
    // integer table per group, so in Spark it is two partial-agg'd
    // groupBys: per-(type, day, bucket) MAX (the per-partition/per-shard
    // sketch) folded by per-(type, bucket) MAX — MAX is the HLL merge,
    // so the daily→total fold IS the mergeability proof (a13/a16
    // pattern), and at 100 TB only O(groups × 256) registers ever cross
    // the second shuffle. The raw estimate α·m²/Σ2^-reg is computed in
    // pure integer arithmetic (Σ2^-reg scaled by 2^41; fixed division
    // order, documented headroom: 2^57 DIV S ≤ 2^49, ×7213 < 2^63), so
    // the oracle replays it exactly; exact distinct counts ride along as
    // evaluation ground truth (the a20/ss11 discipline) — the observed
    // |est−exact| error at m=256 is the real ~6.5%/√m envelope, not
    // vacuous. ρ and buckets come from md5 hex (the cu14 idiom), so both
    // engines hash identically; bin() length gives the exact integer
    // floor-log2 with no float ever entering the hash.
    Q(
      "a21_hll_registers",
      (s, dir) => {
        val W = 41 // ρ domain: 40-bit suffix, ρ ∈ [1, 41]
        val ev = table(s, dir, "events")
        val md = md5(col("user_id").cast("string"))
        val bucket = conv(substring(md, 1, 2), 16, 10).cast("int")
        val v = conv(substring(md, 3, 10), 16, 10).cast("long")
        val rho = when(v === 0L, W).otherwise(lit(W) - length(bin(v)))
        val daily = ev
          .select(col("event_type"), to_date(col("ts")).as("day"),
            bucket.as("bucket"), rho.as("rho"))
          .groupBy("event_type", "day", "bucket")
          .agg(max(col("rho")).as("reg"))
        val merged = daily.groupBy("event_type", "bucket")
          .agg(max(col("reg")).as("reg"))
        val g = merged.groupBy("event_type").agg(
          count(lit(1)).as("n_buckets_hit"),
          sum(col("reg")).as("sum_reg"),
          sum(expr("shiftleft(1L, 41 - reg)")).as("s_hit"))
        val exact = ev.groupBy("event_type")
          .agg(count_distinct(col("user_id")).as("exact_users"))
        g
          // Σ 2^(41-reg) over all 256 buckets: empty bucket ⇒ reg=0 ⇒ 2^41
          .withColumn("s_scaled", col("s_hit") +
            (lit(256L) - col("n_buckets_hit")) * lit(2199023255552L))
          // 2^57 = m²·2^41; integer `div` end-to-end — `/` would route
          // through double, which cannot represent 2^57
          .withColumn("est_users",
            expr("(144115188075855872L div s_scaled) * 7213L div 10000L"))
          .select("event_type", "n_buckets_hit", "sum_reg", "s_scaled",
            "est_users")
          .join(broadcast(exact), "event_type")
          .orderBy("event_type")
      },
      Some("""
        WITH h AS (
          SELECT event_type,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
                   AS bucket,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 10))::BIGINT
                   AS v
          FROM events),
        r AS (
          SELECT event_type, bucket,
                 MAX(CASE WHEN v = 0 THEN 41
                          ELSE 41 - length(bin(v)) END) AS reg
          FROM h GROUP BY 1, 2),
        g AS (
          SELECT event_type,
                 COUNT(*) AS n_buckets_hit,
                 CAST(SUM(reg) AS BIGINT) AS sum_reg,
                 CAST(SUM(1::BIGINT << (41 - reg)) AS BIGINT) AS s_hit
          FROM r GROUP BY 1),
        e AS (
          SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
          FROM events GROUP BY 1)
        SELECT g.event_type, g.n_buckets_hit, g.sum_reg,
               CAST(g.s_hit + (256 - g.n_buckets_hit) * 2199023255552
                 AS BIGINT) AS s_scaled,
               CAST(144115188075855872
                      // (g.s_hit + (256 - g.n_buckets_hit) * 2199023255552)
                    * 7213 // 10000 AS BIGINT) AS est_users,
               e.exact_users
        FROM g JOIN e USING (event_type)
        ORDER BY event_type
      """.stripMargin.trim),
    ),
  )
}
