package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** URL identity layer as oracle-checked queries (SURVEY §2.2 F6, §2.7
  * X1/X2). DuckDB cannot run the canonicalizer or Rabin hashing, so the
  * checks work differently:
  *
  *  - u1 synthesizes raw URLs with KNOWN messiness (case, www, default
  *    port, path ;params, session-id query params, #! fragments, multi-
  *    part public suffixes) from customer keys; Spark canonicalizes with
  *    the real library while the oracle constructs the EXPECTED canonical
  *    strings directly — a full behavioral check of the canonicalizer
  *    over every row;
  *  - u2 checks the fingerprint layer through hash-cardinality
  *    invariants: within each root domain, count(distinct domainHash)
  *    must equal count(distinct host) and count(distinct rootDomainHash)
  *    must be 1 — any hash instability or collision breaks the match.
  */
object UrlQueries {

  /** u6's tracking-param canonicalizer: strip utm_* and the ad-click
    * ids, drop the fragment, sort surviving params; empty params
    * (query-less URLs, trailing '&') are dropped so a bare '?' is never
    * re-serialized. Shared by the u6 gated query and the streaming
    * first-seen frontier dedupe. */
  private[graft] def canonicalizeTracking(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(q, "&"), p => {
      val name = lower(element_at(split(p, "="), 1))
      p =!= "" && !(name.startsWith("utm_") ||
        name.isin("gclid", "fbclid", "msclkid", "mc_eid", "igshid"))
    }))
    concat(regexp_extract(url, "^([^?#]*)", 1),
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Synthesized messy URL per customer key (4 deterministic shapes). */
  private def rawUrl(ck0: Column): Column = {
    val ck = ck0.cast("string")
    val site = (ck0 % 40).cast("string")
    val sub = (ck0 % 7).cast("string")
    val m = ck0 % 4
    when(m === 0, concat(lit("HTTP://WWW.Site"), site,
      lit(".com/u/"), ck, lit(";jsessionid=ABCDEF0123456789?x=1")))
      .when(m === 1, concat(lit("http://Sub"), sub, lit(".Site"), site,
        lit(".CO.UK:80/a/"), ck,
        lit("?PHPSESSID=deadbeef12345678deadbeef12345678&y=2")))
      .when(m === 2, concat(lit("https://s"), sub, lit(".site"), site,
        lit(".com:8080/item?id="), ck))
      .otherwise(concat(lit("http://site"), site, lit(".org/p/"), ck, lit("#!x")))
  }

  /** DuckDB expression building the same raw-url inputs' EXPECTED
    * canonical output and host/root, per the canonicalization rules. */
  private val OracleCase =
    """CASE c_custkey % 4
      |  WHEN 0 THEN concat('http://site', c_custkey % 40, '.com/u/', c_custkey, '?x=1')
      |  WHEN 1 THEN concat('http://sub', c_custkey % 7, '.site', c_custkey % 40, '.co.uk/a/', c_custkey, '?y=2')
      |  WHEN 2 THEN concat('https://s', c_custkey % 7, '.site', c_custkey % 40, '.com:8080/item?id=', c_custkey)
      |  ELSE concat('http://site', c_custkey % 40, '.org/p/', c_custkey, '#!x')
      |END""".stripMargin

  private val OracleHost =
    """CASE c_custkey % 4
      |  WHEN 0 THEN concat('site', c_custkey % 40, '.com')
      |  WHEN 1 THEN concat('sub', c_custkey % 7, '.site', c_custkey % 40, '.co.uk')
      |  WHEN 2 THEN concat('s', c_custkey % 7, '.site', c_custkey % 40, '.com')
      |  ELSE concat('site', c_custkey % 40, '.org')
      |END""".stripMargin

  private val OracleRoot =
    """CASE c_custkey % 4
      |  WHEN 0 THEN concat('site', c_custkey % 40, '.com')
      |  WHEN 1 THEN concat('site', c_custkey % 40, '.co.uk')
      |  WHEN 2 THEN concat('site', c_custkey % 40, '.com')
      |  ELSE concat('site', c_custkey % 40, '.org')
      |END""".stripMargin

  def defs: Seq[Q] = Seq(
    // F6/X1: full behavioral check of canonicalize + root-domain over
    // synthesized messy URLs.
    Q(
      "u1_url_canonicalize",
      (s, dir) =>
        Registry.table(s, dir, "customer")
          .select(col("c_custkey"), rawUrl(col("c_custkey")).as("raw"))
          .select(
            col("c_custkey"),
            GraftFunctions.canonicalizeUrl(col("raw")).as("canonical_url"),
            GraftFunctions.rootDomain(
              GraftFunctions.urlHost(col("raw"))).as("root_domain"))
          .orderBy(col("c_custkey")),
      Some(s"""
        SELECT c_custkey,
               $OracleCase AS canonical_url,
               $OracleRoot AS root_domain
        FROM customer
        ORDER BY c_custkey
      """.trim),
    ),

    // X2: fingerprint invariants per root domain — distinct domain hashes
    // == distinct hosts, and exactly one root hash per root domain.
    Q(
      "u2_url_fingerprint",
      (s, dir) =>
        Registry.table(s, dir, "customer")
          .select(col("c_custkey"), rawUrl(col("c_custkey")).as("raw"))
          .select(col("c_custkey"),
            GraftFunctions.rootDomain(GraftFunctions.urlHost(col("raw"))).as("root_domain"),
            GraftFunctions.urlFingerprint(col("raw")).as("fp"))
          .groupBy(col("root_domain"))
          .agg(
            count(lit(1)).as("n_urls"),
            count_distinct(col("fp.urlHash")).as("n_url_hashes"),
            count_distinct(col("fp.domainHash")).as("n_domain_hashes"),
            count_distinct(col("fp.rootDomainHash")).as("n_root_hashes"))
          .orderBy(col("root_domain")),
      Some(s"""
        SELECT root_domain,
               COUNT(*) AS n_urls,
               COUNT(*) AS n_url_hashes,
               COUNT(DISTINCT host) AS n_domain_hashes,
               1::BIGINT AS n_root_hashes
        FROM (
          SELECT c_custkey, $OracleHost AS host, $OracleRoot AS root_domain
          FROM customer)
        GROUP BY root_domain
        ORDER BY root_domain
      """.trim),
    ),

    // X1/F6 adjunct — typosquat / near-miss host detection: all host
    // pairs at edit distance exactly 1 (the lookalike-domain sweep a
    // crawl operator runs for phishing/brand-abuse triage). ALL-PAIRS
    // levenshtein is O(n²·len²) — a non-starter at corpus host counts —
    // so Spark blocks by POSITION-TAGGED symmetric deletion (the
    // FastSS/SymSpell family, sharpened): two equi-join channels whose
    // candidates are not merely complete but EXACT —
    //   · substitution: del_i(a) = del_i(b) at the SAME i ⇔ a and b
    //     differ at exactly position i (distance exactly 1, and the
    //     match position is unique, so no dedupe is even needed);
    //   · indel: a = del_i(b) ⇔ b is a single insertion into a
    //     (dedupe only for insertions into equal-char runs).
    // The naive any-position variant join admits del_i(a) = del_j(b)
    // i≠j distance-2 pairs — measured 17.3M candidates vs 3.9M exact
    // at 10× (and 135 s vs ~10 s) — position tagging deletes the
    // false-candidate class instead of filtering it. Cost: O(n·len)
    // variant rows through hash shuffles keyed on (block, pos); a
    // bucket is the set of hosts one same-position deletion away —
    // bounded by the alphabet, never by n. The final levenshtein
    // column double-checks the exactness claim row-by-row. The oracle
    // asserts the GROUND TRUTH via brute-force pairs (oracle-scale
    // only): channel exactness means the two sets are equal by
    // construction (fuzz-pinned in TypoSquatSpec).
    Q(
      "u3_typosquat",
      (s, dir) => {
        // materialize hosts and the variant table ONCE: both feed two
        // consumers, and Catalyst's size estimate for an exploded tiny
        // dim is wildly low — without runtime stats it broadcast the
        // 2.1M-row variant side at 10× (measured 135 s; with
        // materialized true sizes AQE picks shuffle joins and the run
        // is ~7 s)
        val hosts = graft.ops.Iterative.materialize(
          Registry.table(s, dir, "customer")
            .select(concat(lit("shop-"), col("c_custkey").cast("string"),
              lit(".com")).as("host"))
            .distinct())
        val h = col("host")
        // (host, pos, block): block = host with char `pos` deleted
        val dels = graft.ops.Iterative.materialize(
          hosts.select(h, posexplode(
              transform(sequence(lit(1), length(h)),
                i => concat(h.substr(lit(1), i - 1),
                  h.substr(i + 1, length(h))))))
            .select(h, (col("pos") + 1).as("pos"), col("col").as("block")))
        // merge hints: localCheckpoint stats under-report the variant
        // table (~1 MB claimed for 2.1M rows at 10×), which otherwise
        // broadcasts a corpus-sized side — exactly the OOM shape a
        // 1000-executor run must never plan. Sort-merge (not
        // shuffle-hash): SMJ spills, while a shuffled-hash build map is
        // memory-rigid — at 100× on the 8 g local harness SHJ build
        // maps OOM'd where SMJ completes
        val subs = dels.select(col("host").as("host_a"), col("pos"), col("block"))
          .join(dels.select(col("host").as("host_b"), col("pos"), col("block"))
            .hint("merge"), Seq("block", "pos"))
          .where(col("host_a") < col("host_b"))
          .select("host_a", "host_b")
        val indel = hosts.select(col("host").as("ha"))
          .join(dels.select(col("host").as("hb"), col("block"))
            .hint("merge"), col("ha") === col("block"))
          .select(least(col("ha"), col("hb")).as("host_a"),
            greatest(col("ha"), col("hb")).as("host_b"))
          .distinct()
        // NO global orderBy: the result is corpus-sized (3.9M pairs at
        // 10×), and range-partitioned sorting would re-execute the whole
        // upstream for sampling (measured +36 s) to order a report
        // nobody needs ordered — the gate sorts rows itself
        subs.unionByName(indel)
          .select(col("host_a"), col("host_b"),
            levenshtein(col("host_a"), col("host_b")).cast("long").as("dist"))
          .where(col("dist") === 1L)
      },
      Some("""
        WITH h AS (
          SELECT DISTINCT 'shop-' || c_custkey || '.com' AS host
          FROM customer)
        SELECT a.host AS host_a, b.host AS host_b,
               CAST(levenshtein(a.host, b.host) AS BIGINT) AS dist
        FROM h a JOIN h b
          ON a.host < b.host
         AND abs(length(a.host) - length(b.host)) <= 1
         AND levenshtein(a.host, b.host) = 1
      """.trim),
    ),

    // X1/F6 adjunct #2 — homoglyph / confusable-skeleton collision
    // detection (the UTS#39 idea): map visually-confusable characters
    // to a canonical skeleton and flag DISTINCT hosts whose skeletons
    // collide — the digit-for-letter lookalike sweep ('0'→o, '1'→l,
    // '3'→e, '4'→a, '5'→s) that catches what edit-distance blocking
    // treats as just-another-substitution. One skeleton groupBy onto
    // collision-group cardinality (partial-agg'd, scale-trivial); the
    // per-skeleton member sample is min/max (order-free aggregates, no
    // list collection). Substrate plants 'sale'→'s4le' lookalikes on
    // every 7th key (the u1 synthesized-messiness discipline).
    Q(
      "u4_homoglyph",
      (s, dir) => {
        val name = when(col("c_custkey") % 7 === 0, lit("s4le"))
          .otherwise(lit("sale"))
        val hosts = Registry.table(s, dir, "customer")
          .select(concat(name, (col("c_custkey") % 500).cast("string"),
            lit(".com")).as("host"))
          .distinct()
        hosts
          .select(col("host"), translate(col("host"), "01345", "oleas").as("skeleton"))
          .groupBy("skeleton")
          .agg(count(lit(1)).as("n_hosts"),
            min(col("host")).as("sample_a"), max(col("host")).as("sample_b"))
          .where(col("n_hosts") >= 2)
          .orderBy("skeleton")
      },
      Some("""
        WITH h AS (
          SELECT DISTINCT
            (CASE WHEN c_custkey % 7 = 0 THEN 's4le' ELSE 'sale' END)
              || (c_custkey % 500) || '.com' AS host
          FROM customer)
        SELECT translate(host, '01345', 'oleas') AS skeleton,
               COUNT(*) AS n_hosts,
               MIN(host) AS sample_a, MAX(host) AS sample_b
        FROM h
        GROUP BY 1 HAVING COUNT(*) >= 2
        ORDER BY skeleton
      """.trim),
    ),
    // U5: Punycode / IDN host labels (RFC 3492 bootstring, IDNA
    // parameters) — two byte-different hosts `xn--mnchen-3ya.de` /
    // `münchen.de` are the SAME registrable name; a modern corpus
    // cannot canonicalize, group, or dedupe internationalized domains
    // without the decode. Fixture U-labels mix an 8-codepoint
    // nameprep-invariant repertoire (Latin, Greek, Cyrillic, CJK
    // — no ß/case-mapped chars, so IDNA2003 java.net.IDN agrees) by seed; the engine
    // ENCODES them to A-labels with the spec-derived bootstring
    // encoder and then DECODES mechanically — the oracle asserts the
    // GROUND-TRUTH U-label recomputed from the seed (the m21/m24
    // fixture pattern), and PunycodeSpec referees both directions
    // against java.net.IDN plus the RFC 3492 sample strings. ASCII-only
    // labels pass through un-prefixed (the xn-- convention is gated
    // too: is_idn must match the repertoire picks exactly).
    Q(
      "u5_punycode",
      (s, dir) => {
        val rep = "ab9äé京πш"
        val docs = Registry.table(s, dir, "documents")
        val mk = udf((id: Long) => {
          val cps = rep.codePoints().toArray
          val len = (id % 8 + 3).toInt
          val u = new String(
            Array.tabulate(len)(i => cps(((id * 7 + i * 13) % cps.length).toInt)),
            0, len)
          val a = graft.core.Punycode.toAscii(u)
          val back = graft.core.Punycode.toUnicode(a)
          (a, back)
        })
        docs.select(col("doc_id"), mk(col("doc_id")).as("p"))
          .select(col("doc_id"),
            col("p._2").as("ulabel"),
            length(col("p._2")).as("ulabel_len"),
            col("p._1").startsWith("xn--").as("is_idn"))
          .orderBy("doc_id")
      },
      Some("""
        WITH rep AS (
          SELECT ['a','b','9','ä','é','京','π','ш'] AS cs),
        lab AS (
          SELECT doc_id, doc_id % 8 + 3 AS len,
                 array_to_string(list_transform(range(0, doc_id % 8 + 3),
                   i -> cs[CAST((doc_id * 7 + i * 13) % 8 AS INT) + 1]), '')
                   AS ulabel
          FROM documents, rep)
        SELECT doc_id, ulabel,
               CAST(length(ulabel) AS INT) AS ulabel_len,
               regexp_matches(ulabel, '[^\x00-\x7F]') AS is_idn
        FROM lab
        ORDER BY doc_id
      """.trim),
    ),

    // u6: TRACKING-PARAM STRIP + canonical URL dedup groups — the
    // click-id/utm layer of URL canonicalization (next to F6's
    // normalize and stripSessionIds): utm_* and the ad-click ids
    // (gclid/fbclid/msclkid/mc_eid/igshid) are per-click noise that
    // makes one page look like many URLs; stripping them, DROPPING the
    // fragment, and SORTING the surviving params yields the dedupe key
    // a crawl frontier and a corpus URL-dedup both group on. Fully
    // declarative (split/filter/array_sort/array_join — codegen, zero
    // UDFs); the oracle rebuilds the same URL text and replays the
    // strip-sort-rebuild pipeline with its own list ops, then both
    // sides roll up the canonical groups.
    // u6's canonicalizer as a reusable column expression (also the key
    // of the streaming first-seen frontier dedupe — see
    // StreamingCanonDedupeSpec): strip utm_*/click-id params, DROP the
    // fragment, sort the survivors. Empty params (query-less URLs,
    // trailing '&') are dropped rather than re-serialized as a bare '?'.
    Q(
      "u6_tracking_strip",
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val k = col("doc_id") % 251
        val real1 = concat(lit("id="), col("doc_id") % 97)
        val real2 = concat(lit("page="), k % 3)
        val t1 = when(k % 2 === 0, concat(lit("utm_source=s"), k % 5))
        val t2 = when(k % 3 === 0, concat(lit("utm_campaign=c"), k))
        val t3 = when(k % 5 === 0, concat(lit("gclid=g"), col("doc_id")))
        val t4 = when(k % 7 === 0, lit("fbclid=fb1"))
        val params = when(k % 2 === 0,
            array(t1, real1, t2, real2, t3, t4))
          .otherwise(array(real2, t3, real1, t1, t4, t2))
        val url = concat(
          lit("https://h"), k % 7, lit(".example/p/"), col("doc_id") % 97,
          lit("?"),
          array_join(filter(params, p => p.isNotNull), "&"),
          when(k % 4 === 0, lit("#frag")).otherwise(lit("")))
        val q = regexp_extract(col("url"), "\\?([^#]*)", 1)
        val canon = canonicalizeTracking(col("url"))
        val nStripped = size(split(q, "&")) -
          when(canon.contains("?"),
            size(split(regexp_extract(canon, "\\?(.*)", 1), "&")))
            .otherwise(lit(0))
        docs.select(col("doc_id"), url.as("url"))
          .select(canon.as("canon_url"), nStripped.cast("long").as("ns"))
          .groupBy("canon_url")
          .agg(count(lit(1)).as("n_urls"), sum(col("ns")).as("n_stripped"))
          .orderBy("canon_url")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, doc_id % 251 AS k FROM documents),
        u AS (
          SELECT doc_id,
            'https://h' || (k % 7) || '.example/p/' || (doc_id % 97) || '?' ||
            array_to_string(list_filter(
              CASE WHEN k % 2 = 0 THEN [
                CASE WHEN k % 2 = 0 THEN 'utm_source=s' || (k % 5) END,
                'id=' || (doc_id % 97),
                CASE WHEN k % 3 = 0 THEN 'utm_campaign=c' || k END,
                'page=' || (k % 3),
                CASE WHEN k % 5 = 0 THEN 'gclid=g' || doc_id END,
                CASE WHEN k % 7 = 0 THEN 'fbclid=fb1' END]
              ELSE [
                'page=' || (k % 3),
                CASE WHEN k % 5 = 0 THEN 'gclid=g' || doc_id END,
                'id=' || (doc_id % 97),
                CASE WHEN k % 2 = 0 THEN 'utm_source=s' || (k % 5) END,
                CASE WHEN k % 7 = 0 THEN 'fbclid=fb1' END,
                CASE WHEN k % 3 = 0 THEN 'utm_campaign=c' || k END]
              END, p -> p IS NOT NULL), '&') ||
            (CASE WHEN k % 4 = 0 THEN '#frag' ELSE '' END) AS url
          FROM base),
        c AS (
          SELECT doc_id,
                 regexp_extract(url, '^([^?#]*)', 1) AS head,
                 string_split(regexp_extract(url, '\?([^#]*)', 1), '&') AS ps
          FROM u),
        s AS (
          SELECT doc_id, head,
                 list_sort(list_filter(ps, p ->
                   p <> '' AND
                   NOT (starts_with(lower(string_split(p, '=')[1]), 'utm_')
                        OR lower(string_split(p, '=')[1]) IN
                           ('gclid', 'fbclid', 'msclkid', 'mc_eid', 'igshid'))))
                   AS kept,
                 len(ps) AS np
          FROM c)
        SELECT head || (CASE WHEN len(kept) > 0
                             THEN '?' || array_to_string(kept, '&')
                             ELSE '' END) AS canon_url,
               COUNT(*)::BIGINT AS n_urls,
               CAST(SUM(np - len(kept)) AS BIGINT) AS n_stripped
        FROM s
        GROUP BY 1
        ORDER BY canon_url
      """.trim),
    ),
  )
}
