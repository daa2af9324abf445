package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** a18 table profiler + d10 chunk dedupe: the code paths the sf tables
  * cannot exercise (nulls for the profiler; a doc whose every chunk is
  * boilerplate for the reassembler). */
class ProfileSpec extends AnyFunSuite with SparkSuite {

  test("profiler branch counts nulls, distincts, and mode on a null-bearing column") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None, None)
      .toDF("v")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        coalesce(max(when(col("v").isNotNull, col("cnt"))), lit(0L)).as("mode_count"))
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((6L, 3L, 2L, 2L)))
  }

  test("all-null column profiles with zero distincts and zero mode") {
    import spark.implicits._
    val df = Seq[Option[String]](None, None).toDF("v")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        coalesce(max(when(col("v").isNotNull, col("cnt"))), lit(0L)).as("mode_count"))
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 2L, 0L, 0L)))
  }

  test("chunk dedupe drops corpus-repeated chunks and reassembles in order") {
    import spark.implicits._
    // chunk width 5, threshold 3: "a b c d e" appears in 3 docs → dropped;
    // doc 3 is ALL boilerplate → kept_text must be the empty string
    val docs = Seq(
      (1L, "a b c d e keep one two three four"),
      (2L, "a b c d e other words here too x"),
      (3L, "a b c d e"),
    ).toDF("doc_id", "text")
    val W = 5
    val words = split(col("text"), " ")
    val nChunks = ceil(size(words).cast("double") / W).cast("int")
    val chunks = docs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), nChunks - 1),
        k => array_join(slice(words, k * W + 1, lit(W)), " "))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val counts = chunks.groupBy("chunk").agg(count(lit(1)).as("n"))
    val out = chunks.join(counts, "chunk")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("n") >= 3, 1L).otherwise(0L)).as("n_boilerplate"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("n") < 3, struct(col("chunk_idx"), col("chunk"))))),
            x => x.getField("chunk")),
          " ").as("kept_text"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, "keep one two three four"),
      (2L, 2L, 1L, "other words here too x"),
      (3L, 1L, 1L, "")))
  }
}
