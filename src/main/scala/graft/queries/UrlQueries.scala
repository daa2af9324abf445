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
    // so Spark blocks by SYMMETRIC DELETION (FastSS/SymSpell): every
    // host emits itself plus its |h| single-character deletions, and
    // candidates are pairs sharing a variant. Completeness is provable,
    // not heuristic: if lev(a,b)=1 then (substitution at i) del_i(a)
    // = del_i(b), (insertion making b from a) a ∈ dels(b) — so every
    // true pair shares a block. Sharing a block is NOT sufficient
    // (del_i(a)=del_j(b) with i≠j can be distance 2), hence the final
    // levenshtein verify on candidates only. Cost: O(n·len) variant
    // rows through one hash shuffle; a variant bucket is the set of
    // hosts one deletion away from the same string — bounded by the
    // alphabet × length, never by n. The oracle asserts the GROUND
    // TRUTH via brute-force pairs (oracle-scale only): blocking
    // completeness means the two sets are equal by construction.
    Q(
      "u3_typosquat",
      (s, dir) => {
        val hosts = Registry.table(s, dir, "customer")
          .select(concat(lit("shop-"), col("c_custkey").cast("string"),
            lit(".com")).as("host"))
          .distinct()
        val h = col("host")
        // variant 0 = the host itself; variant i>=1 = delete char i
        val variants = hosts.select(h, explode(concat(
          array(h),
          transform(sequence(lit(1), length(h)),
            i => concat(h.substr(lit(1), i - 1),
              h.substr(i + 1, length(h)))))).as("block"))
        val a = variants.select(col("host").as("host_a"), col("block"))
        val b = variants.select(col("host").as("host_b"), col("block"))
        a.join(b, "block")
          .where(col("host_a") < col("host_b"))
          .select("host_a", "host_b").distinct()
          .where(levenshtein(col("host_a"), col("host_b")) === 1)
          .select(col("host_a"), col("host_b"),
            levenshtein(col("host_a"), col("host_b")).cast("long").as("dist"))
          .orderBy("host_a", "host_b")
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
        ORDER BY host_a, host_b
      """.trim),
    ),
  )
}
