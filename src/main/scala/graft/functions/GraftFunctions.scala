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
    * Expression. Header/meta charset hints are regexp_extract upstream. */
  def sniffCharset(c: Column): Column = NativeExpressions.sniffCharset(c)

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
  }
}
