package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T-family: TRAINABLE multinomial Naive Bayes (train + inference) — the
  * count-based classifier the public pipelines actually train for
  * language-ID and quality gating (fastText's NB baseline; CCNet's
  * fasttext lang-ID is the same bag-of-tokens decision rule), completing
  * the classifier story next to t12's fixed-weight inference.
  *
  * Everything is integer, so both the learned model table and every
  * prediction are exactly SQL-replayable (the t13/t21 train discipline):
  * log-likelihoods use a FIXED-POINT BASE-2 LOG in 1/64 units computed
  * with integer ops only —
  *
  *   L(x) = 64·(bitlen(x)−1) + LUT[ (x·64 div 2^(bitlen(x)−1)) − 64 ]
  *
  * where bitlen(x) = length(bin(x)) (the binary-string trick both Spark
  * and DuckDB evaluate identically) and LUT is the public 64-entry table
  * floor(64·log2(1+k/64)), k=0..63. L is monotone (spec-checked over
  * 1..200000), resolution 1/64 log2 ≈ 1.1% in probability — far inside
  * NB's decision margins; ties in argmax break to the smallest label, so
  * predictions are deterministic.
  *
  * Model (Laplace-smoothed, vocabulary-capped):
  *   weight(c,w)  = L(cnt(c,w)+1) − L(T_c+V+1)   for vocab tokens seen in c
  *   oov(c)       = −L(T_c+V+1)                  (cnt 0 → L(1)=0 numerator;
  *                                               also the unseen-in-class weight)
  *   prior(c)     = L(ndocs_c)                   (the shared −L(ndocs) constant drops)
  *   score(d,c)   = prior(c) + Σ_tokens coalesce(weight(c,w), oov(c))
  *
  * Scale shape (100 TB): the corpus collapses once to (label, token,
  * cnt) — a map-side-combined groupBy, the only corpus-wide shuffle; the
  * model is (V × labels) rows — broadcast; inference is one explode, a
  * broadcast join, and a per-doc partial-agg'd argmax. No token text in
  * any wide exchange beyond the count collapse itself. */
object NaiveBayes {

  /** floor(64·log2(1+k/64)), k = 0..63 — fixed public constant table. */
  val Lut: Seq[Int] = Seq(
    0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14, 15, 17, 18, 19, 20, 21, 22,
    24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
    41, 42, 43, 43, 44, 45, 46, 47, 48, 49, 50, 50, 51, 52, 53, 54, 54,
    55, 56, 57, 58, 58, 59, 60, 61, 61, 62, 63)

  private val LutSql = Lut.mkString("array(", ",", ")")

  /** Fixed-point integer log2 in 1/64 units of a positive long column.
    * The mantissa index (x·64 div 2^(bitlen−1)) − 64 is computed as a
    * right shift — never Column./, which is IEEE double division. */
  def ilog(x: Column): Column = {
    val b = (length(bin(x)) - 1).cast("int") // bitlen(x) - 1
    (lit(64L) * b) +
      element_at(expr(LutSql),
        (call_function("shiftright", x * 64L, b) - 63L).cast("int"))
  }

  /** Per-token normalized lowercase tokens with the label — the shared
    * enumeration of train and inference. */
  private def labeledTokens(docs: DataFrame, id: String, label: String,
      text: String): DataFrame =
    docs.select(col(id).as("doc_id"), col(label).as("label"),
      explode(filter(TextAnalysis.tokens(lower(col(text))),
        t => t =!= "")).as("w"))

  /** TRAIN: one corpus collapse feeding both outputs (the labeled token
    * table materializes once; everything after is model-sized work).
    * Returns (model, stats):
    *  - model: one row per (label, vocab token seen in that label) —
    *    (label, w, cnt, weight);
    *  - stats: one row per label — (label, t_mass, oov_weight,
    *    prior_weight); a label whose docs contribute no vocab token
    *    still gets its smoothed OOV weight (t_mass 0). */
  def train(docs: DataFrame, id: String, label: String, text: String,
      vocab: Int): (DataFrame, DataFrame) = {
    val toks = Iterative.materialize(labeledTokens(docs, id, label, text))
    // capped vocabulary: global top-`vocab` by count, ties to the
    // lexicographically smallest token (the t9 head rule)
    val vocabDf = toks.groupBy("w").agg(count(lit(1)).as("gc"))
      .orderBy(col("gc").desc, col("w")).limit(vocab)
      .select("w")
    val counts = Iterative.materialize(toks
      .join(broadcast(vocabDf), "w")
      .groupBy("label", "w").agg(count(lit(1)).as("cnt")))
    val totals = counts.groupBy("label").agg(sum(col("cnt")).as("t_mass"))
    val model = counts.join(broadcast(totals), "label")
      .select(col("label"), col("w"), col("cnt"),
        (ilog(col("cnt") + 1L) - ilog(col("t_mass") + vocab + 1L))
          .as("weight"))
    val priors = docs.groupBy(col(label).as("label"))
      .agg(count(lit(1)).as("ndocs"))
    val stats = priors.join(totals, Seq("label"), "left")
      .select(col("label"), coalesce(col("t_mass"), lit(0L)).as("t_mass"),
        (-ilog(coalesce(col("t_mass"), lit(0L)) + vocab + 1L)).as("oov_weight"),
        ilog(col("ndocs")).as("prior_weight"))
    (model, stats)
  }

  /** INFERENCE: score every doc against every label and take the
    * deterministic argmax (highest score, ties to the smallest label).
    * Returns (doc_id, pred_label, score). The model/stats inputs are
    * model-sized and broadcast; `docs` here may be any corpus — the
    * trained model applies to unlabeled data.
    *
    * Scale shape: the naive plan crosses TOKENS × LABELS before
    * aggregating — a 100×-token fan-out at CCNet's 100+ languages.
    * This uses the algebraically identical decomposition
    *
    *   score(d,c) = prior(c) + oov(c)·n_d + Σ_{t∈d, (t,c)∈model} (w(t,c) − oov(c))
    *
    * (every token contributes oov(c) by default; only the model's own
    * (token, label) rows carry a correction), so the only per-token
    * fan-out is the broadcast join against the model — in-vocab tokens
    * fan to the labels that actually saw them, OOV tokens to none —
    * and the label cross happens at DOC granularity (docs × labels
    * rows into the argmax). Pure integer, so the two forms are
    * bit-identical — NaiveBayesSpec's driver-side referee and the t25
    * gate pin that. */
  def classify(docs: DataFrame, id: String, text: String,
      model: DataFrame, stats: DataFrame): DataFrame = {
    // serialized blocks: this is the corpus's biggest frame (one row per
    // token) — deserialized per-row objects here are the documented
    // HyperBall-class OOM shape (see Iterative.materializeSer)
    val toks = docs.select(col(id).as("doc_id"),
      explode(filter(TextAnalysis.tokens(lower(col(text))),
        t => t =!= "")).as("w"))
      .transform(Iterative.materializeSer) // feeds the count AND the model join
    val nd = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val modelAdj = model
      .join(stats.select(col("label"), col("oov_weight")), "label")
      .select(col("label"), col("w"),
        (col("weight") - col("oov_weight")).as("adj"))
    val adj = toks.join(broadcast(modelAdj), "w")
      .groupBy("doc_id", "label").agg(sum(col("adj")).as("adjsum"))
    nd.crossJoin(broadcast(stats.select(col("label"), col("oov_weight"),
        col("prior_weight"))))
      .join(adj, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (col("prior_weight") + col("oov_weight") * col("n") +
          coalesce(col("adjsum"), lit(0L))).as("score"))
      .groupBy("doc_id")
      .agg(min(struct((-col("score")).as("ns"), col("label"))).as("best"))
      .select(col("doc_id"), col("best.label").as("pred_label"),
        (-col("best.ns")).as("score"))
  }
}
