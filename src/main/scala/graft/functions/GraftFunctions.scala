package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Hashing, RabinFingerprint, Urls}

/** Engine scalar-function surface (SURVEY.md §2.7, §2.12): URL identity,
  * Rabin fingerprints, SimHash + LSH banding, shingle Jaccard.
  *
  * Exposed both as Column builders (for the Scala API) and as registered
  * SQL functions via [[registerAll]]. Implemented as Scala UDFs first;
  * the hot ones are candidates for codegen'd Catalyst Expressions.
  */
object GraftFunctions {

  // typed implementations (null-safe: Spark passes nulls through udf when
  // the input type is a reference type)
  private val simhashF = (s: String) => Hashing.simhash64(s)
  private val hammingF = (a: Long, b: Long) => Hashing.hammingDistance(a, b)
  private val bandKeysF = (h: Long) => Hashing.bandKeys(h)
  private val rabinF = (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(RabinFingerprint.std64.fp(s))
  private val canonF = (s: String) => Urls.canonicalize(s)
  private val hostF = (s: String) => Urls.parse(s).map(_.host).orNull
  private val rootDomainF = (s: String) => Urls.extractRootDomain(s)
  private val urlFpF = (s: String) => Urls.fingerprint(s).orNull
  private val jaccardF = (a: String, b: String) =>
    Hashing.jaccard(Hashing.shingles(a), Hashing.shingles(b))

  private val robotsAllowedF = (robots: String, agent: String, path: String) =>
    graft.core.Robots.isAllowed(robots, agent, path)
  private val robotsDelayF = (robots: String, agent: String) =>
    graft.core.Robots.crawlDelay(robots, agent)

  private val robotsAllowedUdf = udf(robotsAllowedF)
  private val robotsDelayUdf = udf(robotsDelayF)
  private val simhashUdf = udf(simhashF)
  private val hammingUdf = udf(hammingF)
  private val bandKeysUdf = udf(bandKeysF)
  private val rabinUdf = udf(rabinF)
  private val canonUdf = udf(canonF)
  private val hostUdf = udf(hostF)
  private val rootDomainUdf = udf(rootDomainF)
  private val urlFpUdf = udf(urlFpF)
  private val jaccardUdf = udf(jaccardF)

  /** 64-bit SimHash of a text column (util/SimHash.java:52) — a codegen'd
    * native Expression (NativeExpressions), not a boxed UDF. */
  def simhash64(c: Column): Column = NativeExpressions.simhash64(c)

  /** Hamming distance between two 64-bit hashes — equivalently
    * `bit_count(a ^ b)`, which stays in codegen; prefer [[hammingExpr]]. */
  def hamming64(a: Column, b: Column): Column = hammingUdf(a, b)

  /** Codegen-friendly hamming distance via built-ins. */
  def hammingExpr(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The 20 LSH band keys of a simhash (DeduperUtils.java:199-300) —
    * codegen'd native Expression. */
  def bandKeys(c: Column): Column = NativeExpressions.bandKeys(c)

  /** Rabin fp64 of a string (FPGenerator.std64 semantics) — codegen'd
    * native Expression. */
  def rabinFp64(c: Column): Column = NativeExpressions.rabinFp64(c)

  def canonicalizeUrl(c: Column): Column = canonUdf(c)

  /** robots.txt gate with the reference crawler's first-match-wins
    * prefix semantics (RobotRulesParser.java:162-185). */
  def robotsAllowed(robotsTxt: Column, agent: Column, path: Column): Column =
    robotsAllowedUdf(robotsTxt, agent, path)

  /** Crawl-delay seconds for an agent (-1 unset; RobotRuleSet.crawlDelay). */
  def robotsCrawlDelay(robotsTxt: Column, agent: Column): Column =
    robotsDelayUdf(robotsTxt, agent)

  /** Lowercased host of a URL (null if unparseable). */
  def urlHost(c: Column): Column = hostUdf(c)
  def rootDomain(c: Column): Column = rootDomainUdf(c)

  /** struct<rootDomainHash,domainHash,urlHash> fingerprint (URLFPV2). */
  def urlFingerprint(c: Column): Column = urlFpUdf(c)

  /** 3-char-shingle Jaccard similarity of two strings (Shingle.java:49). */
  def jaccardShingles(a: Column, b: Column): Column = jaccardUdf(a, b)

  /** X8: byte-level charset sniff of a binary column
    * (CharsetUtils.bestEffortDetectCharset's deterministic tiers: BOM →
    * strict UTF-8 validation → latin-1 fallback) — codegen'd native
    * Expression. Hint tiers compose in front via [[detectCharset]]. */
  def sniffCharset(c: Column): Column = NativeExpressions.sniffCharset(c)

  /** RFC 8288 Link-header member list from a raw HTTP header block (x31):
    * per `Link:` line (anchored at line start — `X-Weblink:` or a header
    * VALUE containing "link:" must not contribute phantom members), split
    * members on commas OUTSIDE quoted strings — quoted-pairs (RFC 7230
    * backslash escapes) neutralized first so an escaped quote can't flip
    * the parity lookahead. In a conformant header the rewrite can only
    * touch quoted-string interiors, which none of the extracted fields
    * (URL, rel, as) live in: RFC 3986 forbids a raw backslash inside the
    * `<URI-Reference>`, so a backslash elsewhere is already malformed
    * input and is neutralized rather than corrupting the parity count.
    * Declarative codegen built-ins end-to-end.
    *
    * CONTRACT: the returned member text is the NEUTRALIZED copy — any
    * quoted-pair (`\x`) inside a member reads back as `xx`. The fields
    * the census extracts (URL, rel, as) cannot legally contain
    * quoted-pairs, so they are always returned verbatim; a consumer
    * extracting a QUOTED param value (e.g. title="…") from the returned
    * members must re-extract it from the original header instead —
    * member text here is suitable for token/URL matching only. */
  def linkHeaderMembers(headerBlock: Column): Column = {
    val lineVals = regexp_extract_all(headerBlock,
      lit("(?im)^link:[ \\t]*([^\\r\\n]*)"), lit(1))
    val memberSplit = ",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)"
    filter(
      transform(
        flatten(transform(lineVals,
          l => split(regexp_replace(l, "\\\\.", "xx"), memberSplit))),
        m => trim(m)),
      m => m =!= "")
  }

  /** The reference's `charset=` parameter pattern
    * (CharsetUtils.java:188-190), applied to headers and to the meta-tag
    * attribute blob alike. */
  private val CharsetParamRegex = "(?i)charset=\\s*([a-zA-Z][_\\-0-9a-zA-Z]*)"

  /** The reference's `<meta http-equiv="content-type" …>` tag pattern
    * (CharsetUtils.java:184-187). */
  private val MetaTagRegex =
    "(?i)<meta\\s+([^>]*http-equiv=\"?content-type\"?[^>]*)>"

  /** Canonicalize a declared charset name the way the reference's
    * `Charset.forName` + alias step does for the common web spellings
    * (CharsetUtils.aliasCharset); unknown names pass through uppercased —
    * a crawl pipeline groups on the verdict, it never re-decodes here. */
  private def normalizeCharsetName(c: Column): Column = {
    val u = upper(c)
    when(u.isin("UTF8", "UTF-8"), "UTF-8")
      .when(u.isin("LATIN1", "LATIN-1", "ISO8859-1", "ISO-8859-1",
        "ISO_8859-1", "ISO-LATIN-1", "8859-1"), "ISO-8859-1")
      .when(u.isin("ASCII", "US-ASCII"), "US-ASCII")
      .when(u.isin("UTF16", "UTF-16"), "UTF-16")
      .otherwise(u)
  }

  /** X8, full deterministic cascade of the reference's
    * bestEffortDetectCharset (CharsetUtils.java:128-180): the HTTP
    * Content-Type `charset=` parameter wins; else the `<meta http-equiv
    * ="content-type">` charset within the first 2000 bytes (inflated
    * byte-per-char like the reference's ASCII read — decode as latin-1,
    * which is that inflation exactly); else the byte sniffer
    * ([[sniffCharset]]: BOM → statistical tier (BOM-less UTF-16 by
    * zero-byte distribution, windows-1252 by printable-C1 occupancy —
    * the published-heuristic core of the reference's ICU/Mozilla
    * detectors) → strict UTF-8 → latin-1 punt). Entirely built-ins +
    * one native expression: stays inside codegen, no UDF. */
  def detectCharset(headers: Column, content: Column): Column = {
    val fromHeaders =
      regexp_extract(coalesce(headers, lit("")), CharsetParamRegex, 1)
    val chunk = decode(substring(content, 1, 2000), "ISO-8859-1")
    val fromMeta = regexp_extract(
      regexp_extract(coalesce(chunk, lit("")), MetaTagRegex, 1),
      CharsetParamRegex, 1)
    val hint =
      when(fromHeaders =!= "", fromHeaders)
        .when(fromMeta =!= "", fromMeta)
    coalesce(normalizeCharsetName(hint), sniffCharset(content))
  }

  /** X8 (parser half): visible text of an HTML document — the
    * deterministic tier of the reference parser's DOM text walk
    * (ParserMapper feeds HTMLDomUtils-encoded documents; the crawl's
    * text stream is the tag-stripped, entity-decoded, whitespace-folded
    * body). Script/style subtrees and comments vanish wholesale, tags
    * become word boundaries, the five core entities + nbsp decode
    * (`&amp;` last, single literal pass), and runs of whitespace fold to
    * one space. Entirely built-in string functions → codegen; patterns
    * avoid backreferences so an RE2-based oracle replays them exactly.
    * A full DOM walk (nesting-aware block/inline spacing) stays out of
    * scope with the DOM codec itself (SURVEY §2.7). */
  def htmlToText(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = replace(replace(replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(ent, "\\s+", " "))
  }

  // --- link extraction (the parser's link walk: ParseWorker.java:82-88
  // tag→attr inventory; ParserMapper.java:241-265 canonicalized href
  // emission) — declarative regex passes over the markup, so the whole
  // extraction stays in codegen'd built-ins; only the final base-URL
  // resolution is a scalar UDF.

  /** Attribute value in double quotes, single quotes, or unquoted (the
    * three HTML spellings), null when absent. No backreferences, so an
    * RE2-based engine replays the patterns identically. */
  private def attrValue(tag: Column, name: String): Column = {
    def nonEmpty(c: Column) = when(c =!= "", c)
    coalesce(
      nonEmpty(regexp_extract(tag, s"""(?i)\\b$name\\s*=\\s*"([^"]*)"""", 1)),
      nonEmpty(regexp_extract(tag, s"(?i)\\b$name\\s*=\\s*'([^']*)'", 1)),
      nonEmpty(regexp_extract(tag, s"""(?i)\\b$name\\s*=\\s*([^\\s"'>]+)""", 1)))
  }

  /** Entity-decode an attribute value / anchor text (the five core
    * entities + nbsp, `&amp;` last — same single literal pass as
    * [[htmlToText]]). */
  private def decodeEntities(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))

  /** Comments vanish wholesale; script BODIES vanish but the opening tag
    * survives (it carries `src` — the reference's DOM walk likewise never
    * surfaces markup inside script text as tags). */
  private def stripInvisible(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    regexp_replace(noComment, "(?is)(<script\\b[^>]*>).*?</script\\s*>", "$1 ")
  }

  /** First `<base href>` of the document (ParseWorker.java:697 rebases
    * all links on it), null when absent. */
  def baseHref(html: Column): Column =
    attrValue(
      regexp_extract(stripInvisible(html), "(?i)(<base\\b[^>]*>)", 1), "href")

  /** G1 front end / X10: candidate links of an HTML document as
    * `array<struct<tag,url,text>>` — the reference parser's tag→attribute
    * inventory (a/area/link → href; frame/iframe/script/img → src,
    * ParseWorker.java:82-88), with per-link anchor text accumulated for
    * `<a>` elements the way the walk's AddText instruction does. URLs and
    * text are entity-decoded; relative URLs are NOT resolved here — pair
    * with [[resolveUrl]]([[baseHref]](html), url). `<a>` needs a closing
    * tag (the unclosed-anchor recovery a real DOM parser does is out of
    * scope); href-less anchors and src-less scripts drop out. */
  def extractLinks(html: Column): Column = {
    val cleaned = stripInvisible(html)
    // full <a>…</a> elements: opening tag carries href, body carries text
    val aElems = regexp_extract_all(cleaned,
      lit("(?is)<a\\b[^>]*>.*?</a\\s*>"), lit(0))
    val aLinks = transform(aElems, el => struct(
      lit("a").as("tag"),
      decodeEntities(attrValue(regexp_extract(el, "(?is)(<a\\b[^>]*>)", 1),
        "href")).as("url"),
      decodeEntities(trim(regexp_replace(
        regexp_replace(el, "(?s)<[^>]*>", " "), "\\s+", " "))).as("text")))
    // void/self-contained tags: one struct per opening tag
    def tagLinks(tag: String, attr: String) = {
      val tags = regexp_extract_all(cleaned,
        lit(s"(?i)<$tag\\b[^>]*>"), lit(0))
      transform(tags, t => struct(
        lit(tag).as("tag"),
        decodeEntities(attrValue(t, attr)).as("url"),
        lit("").as("text")))
    }
    val all = concat(aLinks,
      tagLinks("area", "href"), tagLinks("link", "href"),
      tagLinks("frame", "src"), tagLinks("iframe", "src"),
      tagLinks("script", "src"), tagLinks("img", "src"))
    filter(all, s => s.getField("url").isNotNull && s.getField("url") =!= "")
  }

  /** Feed-link extraction from raw Atom/RSS markup as
    * `array<struct<scope,rel,url>>` — the reference's link emitter
    * handles feed sources beside HTML, emitting the channel-level link
    * and each item/entry link (LinkGraphDataEmitter.java:201
    * emitLinksFromAtomContent, :273 emitLinksFromRSSContent; its
    * "alternate"-rel filter maps to the `rel` field here, with a missing
    * Atom rel defaulting to "alternate" per the Atom spec). Atom links
    * are `<link href=…/>` attributes; RSS links are `<link>` element
    * TEXT. `scope` is "channel" for links outside any `<entry>`/`<item>`
    * block, "item" inside one — the distinction the reference counts
    * separately (GOT_TOP_LEVEL_LINK vs GOT_ITEM_LINK). Relative URLs are
    * NOT resolved here — pair with [[resolveUrl]] against the fetch URL. */
  def extractFeedLinks(xml: Column): Column = {
    val cleaned = regexp_replace(xml, "(?s)<!--.*?-->", " ")
    val itemBlockRe = "(?is)<(?:entry|item)[\\s>].*?</(?:entry|item)\\s*>"
    val items = regexp_extract_all(cleaned, lit(itemBlockRe), lit(0))
    val channel = regexp_replace(cleaned, itemBlockRe, " ")
    // Atom form: self-closing <link …/> carrying href (+ optional rel)
    def atomLinks(block: Column) = transform(
      regexp_extract_all(block, lit("(?i)<link\\b[^>]*>"), lit(0)),
      t => struct(
        coalesce(attrValue(t, "rel"), lit("alternate")).as("rel"),
        decodeEntities(attrValue(t, "href")).as("url")))
    // RSS form: <link>URL</link> element text (no attributes, no rel)
    def rssLinks(block: Column) = transform(
      regexp_extract_all(block, lit("(?is)<link\\s*>\\s*([^<]*?)\\s*</link\\s*>"), lit(1)),
      u => struct(lit("alternate").as("rel"), decodeEntities(u).as("url")))
    def scoped(scope: String, links: Column) = transform(links, s =>
      struct(lit(scope).as("scope"), s.getField("rel").as("rel"),
        s.getField("url").as("url")))
    val all = concat(
      scoped("channel", concat(atomLinks(channel), rssLinks(channel))),
      flatten(transform(items, b =>
        scoped("item", concat(atomLinks(b), rssLinks(b))))))
    filter(all, s => s.getField("url").isNotNull && s.getField("url") =!= "")
  }

  /** Sitemap extraction from raw urlset/sitemapindex XML as
    * `array<struct<scope,url,lastmod,changefreq,priority>>` — the
    * reference's crawl data model carries sitemap discovery as
    * first-class metadata (protocol.jr:190 `Flag_InSitemap`, :267
    * `SitemapChangeFrequency`, :278-282 sitemapChangeFreq/Priority/
    * LastModifiedTime; database.jr:670 `hasSitemapURL`), so the engine
    * needs the extraction that populates those fields. `scope` is
    * "url" for `<urlset><url>` entries and "index" for
    * `<sitemapindex><sitemap>` child-sitemap pointers (the two document
    * shapes of sitemaps.org 0.9); absent optional fields are null.
    * Relative locs resolve against the fetch URL via [[resolveUrl]]. */
  def extractSitemapUrls(xml: Column): Column = {
    val cleaned = regexp_replace(xml, "(?s)<!--.*?-->", " ")
    // <url[\s>] will not match <urlset, <sitemap[\s>] not <sitemapindex
    val blocks = regexp_extract_all(cleaned,
      lit("(?is)<(?:url|sitemap)[\\s>].*?</(?:url|sitemap)\\s*>"), lit(0))
    val isIndex = cleaned.rlike("(?i)<sitemapindex")
    def elText(b: Column, tag: String) = {
      val v = regexp_extract(b, s"(?is)<$tag\\s*>\\s*([^<]*?)\\s*</$tag\\s*>", 1)
      when(v === "", lit(null).cast("string")).otherwise(decodeEntities(v))
    }
    val all = transform(blocks, b => struct(
      when(isIndex, "index").otherwise("url").as("scope"),
      elText(b, "loc").as("url"),
      elText(b, "lastmod").as("lastmod"),
      elText(b, "changefreq").as("changefreq"),
      elText(b, "priority").as("priority")))
    filter(all, s => s.getField("url").isNotNull)
  }

  private val resolveF = (base: String, ref: String) =>
    if (base == null) ref else Urls.resolve(base, ref)
  private val resolveUdf = udf(resolveF)

  /** RFC 3986 reference resolution of `ref` against `base` (null base
    * passes `ref` through — a page with no base URL). */
  def resolveUrl(base: Column, ref: Column): Column = resolveUdf(base, ref)

  /** Register every function for SQL use. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("simhash64", simhashF)
    spark.udf.register("hamming64", hammingF)
    spark.udf.register("band_keys", bandKeysF)
    spark.udf.register("rabin_fp64", rabinF)
    spark.udf.register("canonicalize_url", canonF)
    spark.udf.register("url_host", hostF)
    spark.udf.register("root_domain", rootDomainF)
    spark.udf.register("url_fingerprint", urlFpF)
    spark.udf.register("jaccard_shingles", jaccardF)
    spark.udf.register("resolve_url", resolveF)
  }
}
