package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** T-family: unigram-LM tokenizer training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model trained by EM) in
  * an integer fixed-point form, completing the tokenizer family next to
  * BPE learning/encoding ([[Bpe]], t13/t14).
  *
  * The reference algorithm seeds a large substring vocabulary, then
  * alternates E (segment the corpus under current piece scores) and M
  * (re-estimate piece scores from segmentation usage), pruning
  * low-loss pieces each round. This implementation keeps that loop
  * structure but replaces float log-probabilities with a deterministic
  * integer objective so the whole training run is replayable in SQL
  * (the t13 oracle discipline — the oracle re-runs EVERY round
  * level-by-level and the learned piece table itself is hash-gated):
  *
  *   - segmentation of a word = Viterbi DP maximizing
  *     `sum_i (count(piece_i) - BIG)` — lexicographically "fewest
  *     pieces, then highest total piece count" (BIG = 10^12 dominates
  *     any count sum the DP can form; see the bound note below);
  *     DP ties broken by the SMALLEST split point (min i), so the
  *     chosen path is unique;
  *   - E-step: usage(p) = sum over distinct words of freq(word) ×
  *     occurrences of p in the word's Viterbi path;
  *   - M-step: next round's count(p) = usage(p); pieces of length ≥ 2
  *     below `pruneMin` usage are dropped (prune-by-loss: the loss of
  *     dropping p is its usage), single chars always survive so every
  *     word stays segmentable.
  *
  * Scale design (the [[Bpe]] discipline): the corpus collapses to its
  * word-frequency table once — the only corpus-sized shuffle — and
  * every EM round is vocabulary work. The piece table is MODEL-sized:
  * the seed is capped at `seedCap` pieces (SentencePiece itself caps
  * its seed vocabulary the same way), so collecting it to the driver
  * and broadcasting into the segment UDF is the t14 broadcast pattern,
  * not a data collect. BIG-bound: the objective stays exact while
  * `maxWordLen × max piece count < 10^12`, i.e. corpus token counts
  * up to ~10^10 — beyond that widen BIG (documented, not silent).
  */
object UnigramLm {

  private val BIG = 1000000000000L // piece cost: fewest-pieces dominates

  /** Deterministic integer Viterbi segmentation of one word: maximize
    * sum(count(piece) - BIG); ties at a DP cell resolve to the smallest
    * split point. `counts` must contain every single char of `w`. */
  private[graft] def viterbi(w: String, counts: scala.collection.Map[String, Long],
      maxPiece: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val NEG = Long.MinValue / 4
    val score = Array.fill(n + 1)(NEG)
    val backI = Array.fill(n + 1)(-1)
    val backP = new Array[String](n + 1)
    score(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPiece)
      while (i < j) {
        if (score(i) > NEG) {
          val p = w.substring(i, j)
          counts.get(p) match {
            case Some(c) =>
              val s = score(i) + c - BIG
              // strict > with ascending i keeps the SMALLEST i on ties
              if (s > score(j)) { score(j) = s; backI(j) = i; backP(j) = p }
            case None => ()
          }
        }
        i += 1
      }
      j += 1
    }
    var out = List.empty[String]
    var k = n
    while (k > 0) { out = backP(k) :: out; k = backI(k) }
    out
  }

  private val OutSchema = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("piece", StringType, nullable = false),
    StructField("usage", LongType, nullable = false)))

  /** Train `rounds` integer-EM rounds and return the FULL final piece
    * map (model-sized: seed-capped multi-char pieces + the always-alive
    * char floor), counts = final-round usage. */
  def trainPieces(docs: DataFrame, textCol: String, rounds: Int,
      maxPiece: Int = 4, seedMin: Long = 2L, pruneMin: Long = 2L,
      seedCap: Int = 10000): Map[String, Long] = {
    val spark = docs.sparkSession
    // corpus → word-frequency table: the only corpus-sized shuffle
    val words = Iterative.materialize(docs
      .select(explode(split(regexp_replace(trim(lower(col(textCol))),
        "\\s+", " "), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq")))
    // seed counts: every substring of length <= maxPiece, weighted by
    // word frequency (one vocabulary-sized explode)
    val sub = words.select(col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(w)),
             |  i -> transform(sequence(1, least($maxPiece, length(w) - i + 1)),
             |    l -> substr(w, i, l))))""".stripMargin)).as("p"))
      .groupBy("p").agg(sum(col("freq")).as("c"))
    val chars = sub.filter(length(col("p")) === 1)
    val multi = sub.filter(length(col("p")) >= 2 && col("c") >= seedMin)
      .orderBy(col("c").desc, col("p")).limit(seedCap)
    // the MODEL: capped piece table, collected to broadcast (t14 pattern)
    var pieces: Map[String, Long] =
      (chars.collect() ++ multi.collect())
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val charSet = pieces.keySet.filter(_.length == 1)
    var usage: Map[String, Long] = Map.empty
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(pieces)
      val segment = udf((w: String) => viterbi(w, bc.value, maxPiece))
      usage = words
        .select(col("freq"), explode(segment(col("w"))).as("p"))
        .groupBy("p").agg(sum(col("freq")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M + prune: usage becomes the next counts; chars always survive
      pieces = usage.filter { case (p, u) => p.length >= 2 && u >= pruneMin } ++
        charSet.map(c => c -> usage.getOrElse(c, 0L)).toMap
    }
    pieces
  }

  /** t21: the learned piece table as a DataFrame — top `topN` by
    * (usage DESC, piece), usage measured by the FINAL round's
    * segmentation. */
  def train(docs: DataFrame, textCol: String, rounds: Int,
      maxPiece: Int = 4, seedMin: Long = 2L, pruneMin: Long = 2L,
      seedCap: Int = 10000, topN: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    val pieces = trainPieces(docs, textCol, rounds, maxPiece, seedMin,
      pruneMin, seedCap)
    val ranked = pieces.toSeq.sortBy { case (p, u) => (-u, p) }.take(topN)
      .zipWithIndex.map { case ((p, u), i) => Row((i + 1).toLong, p, u) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(ranked.toSeq, 1), OutSchema)
  }

  /** t22: ENCODE the corpus with a learned piece map (the inference
    * half — the t14 pattern): segmentation is a function of the WORD
    * alone, so the corpus collapses to its distinct-word table, each
    * surface form is Viterbi-segmented exactly once under the broadcast
    * model, and per-doc accounting joins back on the pre-grouped
    * (doc_id, word) counts. Returns (doc_id, n_words, n_tokens). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      pieces: Map[String, Long], maxPiece: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(pieces)
    val nToks = udf((w: String) => viterbi(w, bc.value, maxPiece).length)
    val dw = docs
      .select(col(idCol).as("doc_id"),
        explode(split(regexp_replace(trim(lower(col(textCol))),
          "\\s+", " "), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val wordToks = dw.select("w").distinct()
      .withColumn("nt", nToks(col("w")))
    dw.join(wordToks, "w")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("nt")).as("n_tokens"))
  }
}
