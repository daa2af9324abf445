package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID
  * (stopword/n-gram scoring), quality scoring, token counting, document
  * fingerprinting. All built from codegen'd built-ins — deliberately
  * engine-portable so each query has an exact DuckDB oracle, and
  * deliberately free of transcendental functions (libm results are not
  * bit-portable across engines; +,-,*,/,sqrt are IEEE-defined).
  */
object TextAnalysis {

  /** Whitespace tokens of a text column (normalized single-space split). */
  def tokens(text: Column): Column =
    split(regexp_replace(trim(text), "\\s+", " "), " ")

  /** Exact count of token w in a pre-tokenized array column. */
  def tokenCountIn(toks: Column, w: String): Column =
    size(filter(toks, t => t === lit(w)))

  /** Exact count of a token w in the text. Prefer [[tokenCountIn]] over a
    * shared tokens column when counting many words — this re-tokenizes. */
  def tokenCount(text: Column, w: String): Column =
    tokenCountIn(tokens(text), w)

  /** Per-language marker tokens for the n-gram/stopword language heuristic.
    * (The reference has no langid — this is the LLM-pipeline extension;
    * marker sets are the classic top-stopwords per language.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "de", "la", "que", "los"),
    "zh" -> Seq("的", "是", "了", "在", "我"),
  )

  /** Language scores + argmax prediction (ties broken by marker order),
    * over a PRE-TOKENIZED array column — the tokenizer runs once per row,
    * not once per marker word. */
  def langIdFromTokens(toks: Column): (Seq[(String, Column)], Column) = {
    val scores = LangMarkers.map { case (lang, words) =>
      lang -> words.map(w => tokenCountIn(toks, w)).reduce(_ + _)
    }
    val best = scores.tail.foldLeft(greatest(scores.head._2, scores.head._2)) {
      case (acc, (_, s)) => greatest(acc, s)
    }
    val pred = scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
    (scores, pred)
  }

  /** Language scores over raw text (re-tokenizes per marker — prefer
    * materializing [[tokens]] into a column and [[langIdFromTokens]]). */
  def langId(text: Column): (Seq[(String, Column)], Column) =
    langIdFromTokens(tokens(text))

  /** Quality features + a deterministic [0,1] score: length in range,
    * mean token length sane, low repetition (type/token ratio). */
  def qualityFeatures(df: DataFrame, text: String): DataFrame = {
    val t = tokens(col(text))
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_types", size(array_distinct(t)).cast("long"))
      .withColumn("len_chars", length(col(text)).cast("long"))
      .withColumn(
        "mean_token_len",
        (col("len_chars") - (col("n_tokens") - lit(1))).cast("double") / col("n_tokens"))
      .withColumn("type_token_ratio", col("n_types").cast("double") / col("n_tokens"))
      .withColumn(
        "quality_score",
        least(col("n_tokens").cast("double") / lit(64.0), lit(1.0)) * lit(0.5)
          + least(col("type_token_ratio") * lit(2.0), lit(1.0)) * lit(0.5))
  }

  /** Winnowing-style document fingerprint: the k lexicographically smallest
    * md5(3-gram shingle) digests, hashed together. Robust to local edits
    * (a single edit disturbs at most 3 of the k mins). */
  def docFingerprint(text: Column, k: Int = 4): Column =
    md5(concat_ws("", slice(array_sort(transform(Dedupe.shingles3(text), s => md5(s.cast("binary")))), 1, k)).cast("binary"))
}
