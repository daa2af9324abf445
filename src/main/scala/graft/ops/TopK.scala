package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** W1/A8 at scale: bounded top-k-per-group WITHOUT a window sort.
  *
  * The reference caps per-group output with reducer-side counters while
  * streaming a sorted shuffle (SegmenterReducer's ≤200-per-host cap,
  * CrawlDBMergingReducer's best-by-rank picks). Spark's idiomatic
  * `row_number().over(Window.partitionBy(...))` reproduces the semantics
  * but not the cost model: a window shuffles EVERY row of a group to one
  * task and sorts the whole group before discarding all but k.
  *
  * This `Aggregator` instead keeps a k-bounded buffer ordered by
  * (score desc, key asc) with map-side partial aggregation: each mapper
  * ships at most k rows per group into the shuffle, so a 100 TB scan with
  * hot groups (a domain with 10^9 pages, k=200) moves O(groups × k)
  * bytes, not O(rows). Physically it runs as ObjectHashAggregate
  * (partial → final), no WindowExec, no per-group full sort.
  */
object TopK {

  /** One candidate: `score` ranks desc, `key` breaks ties asc. */
  final case class Scored(score: Double, key: Long)

  /** Rank order: higher score first, then lower key. */
  private val rankOrder: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.key))

  private final class TopKAgg(k: Int)
      extends Aggregator[Scored, List[Scored], String] {
    override def zero: List[Scored] = Nil

    private def insert(buf: List[Scored], in: Scored): List[Scored] =
      if (buf.lengthCompare(k) >= 0 && rankOrder.gteq(in, buf.last)) buf
      else (in :: buf).sorted(rankOrder).take(k)

    override def reduce(buf: List[Scored], in: Scored): List[Scored] =
      insert(buf, in)

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      (a ++ b).sorted(rankOrder).take(k)

    /** Keys in rank order, comma-joined (driver-gate-friendly scalar). */
    override def finish(buf: List[Scored]): String =
      buf.map(_.key).mkString(",")

    override def bufferEncoder: Encoder[List[Scored]] =
      ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Untyped column function: `topKKeys(k)(score, key)` → "k1,k2,…". */
  def topKKeys(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k))

  private final class TopScoredAgg(k: Int)
      extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    override def zero: List[Scored] = Nil

    private def insert(buf: List[Scored], in: Scored): List[Scored] =
      if (buf.lengthCompare(k) >= 0 && rankOrder.gteq(in, buf.last)) buf
      else (in :: buf).sorted(rankOrder).take(k)

    override def reduce(buf: List[Scored], in: Scored): List[Scored] =
      insert(buf, in)

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      (a ++ b).sorted(rankOrder).take(k)

    /** The k winners in rank order — posexplode downstream recovers the
      * 0-based rank without any window. */
    override def finish(buf: List[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[List[Scored]] =
      ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Untyped column function: `topScored(k)(score, key)` →
    * array<struct<score,key>> in (score desc, key asc) order — the
    * (rank_value, url) shape of per-host crawl-list selection. Same
    * bounded-buffer cost model as [[topKKeys]]: ≤k rows per group leave
    * each mapper, no WindowExec, no per-group full sort. */
  def topScored(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopScoredAgg(k))

  /** String-keyed candidate: `score` (a count) ranks desc, `key` breaks
    * ties asc — the (cnt, gram) shape of n-gram head selection. */
  final case class ScoredStr(score: Long, key: String)

  private val strOrder: Ordering[ScoredStr] =
    Ordering.by((s: ScoredStr) => (-s.score, s.key))

  private final class TopStrAgg(k: Int)
      extends Aggregator[ScoredStr, List[ScoredStr], Seq[ScoredStr]] {
    override def zero: List[ScoredStr] = Nil

    private def insert(buf: List[ScoredStr], in: ScoredStr): List[ScoredStr] =
      if (buf.lengthCompare(k) >= 0 && strOrder.gteq(in, buf.last)) buf
      else (in :: buf).sorted(strOrder).take(k)

    override def reduce(buf: List[ScoredStr], in: ScoredStr): List[ScoredStr] =
      insert(buf, in)

    override def merge(a: List[ScoredStr], b: List[ScoredStr]): List[ScoredStr] =
      (a ++ b).sorted(strOrder).take(k)

    /** The k winners in rank order — posexplode downstream recovers the
      * 0-based rank without any window. */
    override def finish(buf: List[ScoredStr]): Seq[ScoredStr] = buf

    override def bufferEncoder: Encoder[List[ScoredStr]] =
      ExpressionEncoder[List[ScoredStr]]()
    override def outputEncoder: Encoder[Seq[ScoredStr]] =
      ExpressionEncoder[Seq[ScoredStr]]()
  }

  /** Untyped column function: `topScoredStrings(k)(score, key)` →
    * array<struct<score,key>> in (score desc, key asc) order. Same
    * bounded-buffer cost model as [[topKKeys]]: ≤k rows per group leave
    * each mapper, no WindowExec, no per-group full sort. */
  def topScoredStrings(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopStrAgg(k))
}
