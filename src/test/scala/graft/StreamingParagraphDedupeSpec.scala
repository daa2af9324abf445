package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FirstSeen
import graft.streaming.FirstSeen.KeyedEvent

/** Streaming twin of d20: Dolma's paragraph dedup is DEPLOYED as a
  * streaming first-seen filter (their bloom filter admits a paragraph's
  * first sighting and drops every later one, across and within docs) —
  * exactly FirstSeen keyed on the paragraph hash. Global-first-keeper
  * is d20's keep-first rule at minDf=1 (every later occurrence drops,
  * within-doc repeats included), so the streamed admissions must match
  * the batch operator's accounting doc for doc — pinned here on a
  * fixture with cross-doc dups, a within-doc repeat, and multi-batch
  * arrival. */
class StreamingParagraphDedupeSpec extends AnyFunSuite with SparkSuite {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("streamed first-seen paragraph filter == batch keep-first at minDf=1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // doc -> blank-line paragraphs; A repeats WITHIN doc 1, B and C
    // repeat ACROSS docs
    val docs = Seq(
      (1L, Seq("alpha para body", "bravo para body", "alpha para body")),
      (2L, Seq("bravo para body", "charlie para body")),
      (3L, Seq("charlie para body", "delta para body", "bravo para body")))

    // stream the paragraphs in (doc, idx) order: ts encodes the order,
    // and FirstSeen's within-batch sort on (ts, payload) makes the
    // earliest occurrence the deterministic winner
    val in = MemoryStream[(String, Timestamp, String)]
    val events = in.toDS().toDF("para", "ts", "payload")
      .select(md5(col("para").cast("binary")).as("key"),
        col("ts"), col("payload"))
      .withWatermark("ts", "0 seconds")
      .as[KeyedEvent]
    val q = FirstSeen.firstSeenWithinTtl(events, ttlMs = 1000L * 60 * 60 * 24)
      .writeStream.format("memory").queryName("para_seen")
      .outputMode("append").start()
    try {
      def evs(d: (Long, Seq[String])) = d._2.zipWithIndex.map { case (p, i) =>
        (p, ts(d._1 * 100 + i), s"${d._1}:$i")
      }
      in.addData(evs(docs(0)) ++ evs(docs(1)): _*) // docs 1+2 in batch 1
      q.processAllAvailable()
      in.addData(evs(docs(2)): _*)                 // doc 3 in batch 2
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.table("para_seen").as[FirstSeen.FirstHit]
      .collect().map(_.payload).toSet
    // global first occurrences: alpha@(1,0), bravo@(1,1), charlie@(2,1),
    // delta@(3,1)
    assert(admitted == Set("1:0", "1:1", "2:1", "3:1"))

    // batch parity: d20's operator at minDf=1 must account identically —
    // kept = admissions per doc, and the reassembled text is the
    // admitted paragraphs in order
    val docsDf = docs.map { case (id, ps) => (id, ps.mkString("\n\n")) }
      .toDF("doc_id", "text")
    val got = graft.ops.Dedupe.paragraphDedupe(docsDf, "doc_id", "text",
        minDf = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4)))
      .toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(got(1L) == ((3L, 1L, md5hex("alpha para body\n\nbravo para body"))))
    assert(got(2L) == ((2L, 1L, md5hex("charlie para body"))))
    assert(got(3L) == ((3L, 2L, md5hex("delta para body"))))
    // per-doc admitted counts == n_paras - n_dropped
    val admittedPerDoc = admitted.groupBy(_.split(":")(0).toLong)
      .view.mapValues(_.size.toLong).toMap
    for ((d, (np, nd, _)) <- got)
      assert(admittedPerDoc.getOrElse(d, 0L) == np - nd)
  }
}
