package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NaiveBayes

/** t24/t25: the integer fixed-point log, the learned model table, and
  * the classifier — each refereed independently of the SQL replay:
  * ilog against a plain-Scala bit-twiddling reference over 1..200000,
  * the model against hand-computed Laplace weights, and classify
  * against a driver-side NB implementation on the fixture corpus. */
class NaiveBayesSpec extends AnyFunSuite with SparkSuite {

  private def refIlog(x: Long): Long = {
    val b = 64 - java.lang.Long.numberOfLeadingZeros(x) // bitlen
    64L * (b - 1) + NaiveBayes.Lut(((x * 64) >> (b - 1)).toInt - 64)
  }

  test("ilog == bit-twiddling reference over 1..200000, and is monotone") {
    val got = spark.range(1, 200001)
      .select(col("id"), NaiveBayes.ilog(col("id")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (x, l) =>
      assert(l == refIlog(x), s"ilog($x) = $l != ${refIlog(x)}")
    }
    val ls = got.sortBy(_._1).map(_._2)
    assert(ls.zip(ls.tail).forall { case (a, b) => a <= b })
    // anchor values (64*log2): L(1)=0, L(2)=64, L(1024)=640
    assert(refIlog(1) == 0 && refIlog(2) == 64 && refIlog(1024) == 640)
  }

  test("train: hand-computed Laplace weights on a 4-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat the dog"),
      (2L, "en", "the cat"),
      (3L, "de", "der hund"),
      (4L, "de", "der der katze")).toDF("doc_id", "lang", "text")
    val (model, stats) = NaiveBayes.train(docs, "doc_id", "lang", "text", 2000)
    val m = model.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // en: the=3 cat=2 dog=1 (mass 6); de: der=3 hund=1 katze=1 (mass 5)
    def w(cnt: Long, mass: Long) = refIlog(cnt + 1) - refIlog(mass + 2001)
    assert(m(("en", "the")) == (3L, w(3, 6)))
    assert(m(("en", "cat")) == (2L, w(2, 6)))
    assert(m(("en", "dog")) == (1L, w(1, 6)))
    assert(m(("de", "der")) == (3L, w(3, 5)))
    assert(m.size == 6)
    val st = stats.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(st("en") == (6L, -refIlog(6 + 2001), refIlog(2)))
    assert(st("de") == (5L, -refIlog(5 + 2001), refIlog(2)))
  }

  test("classify: argmax + smallest-label tie-break; OOV collapses to the smoothed weight") {
    import spark.implicits._
    val train = Seq(
      (1L, "en", "aa bb"),
      (2L, "zz", "aa bb")).toDF("doc_id", "lang", "text")
    val (model, stats) = NaiveBayes.train(train, "doc_id", "lang", "text", 2000)
    // both labels have identical counts -> every score ties -> the
    // smallest label must win deterministically
    val probe = Seq((10L, "aa qq"), (11L, "zz-unseen")).toDF("doc_id", "text")
    val got = NaiveBayes.classify(probe, "doc_id", "text", model, stats)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.forall(_._2 == "en"), s"tie must break to smallest label: ${got.toSeq}")
    // doc 10: prior + w(aa) + oov ; doc 11: prior + oov
    def w(cnt: Long, mass: Long) = refIlog(cnt + 1) - refIlog(mass + 2001)
    val prior = refIlog(1)
    assert(got(0)._3 == prior + w(1, 2) + -refIlog(2 + 2001))
    assert(got(1)._3 == prior + -refIlog(2 + 2001))
  }

  test("classify == driver-side NB referee on the fixture corpus (sf0.001)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
    val (model, stats) = NaiveBayes.train(docs, "doc_id", "lang", "text", 2000)
    val got = NaiveBayes.classify(docs, "doc_id", "text", model, stats)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    // plain-Scala referee: same tokenization, vocab rule, weights
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    val gc = rows.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong)
    val vocab = gc.toSeq.sortBy { case (t, c) => (-c, t) }.take(2000).map(_._1).toSet
    val cnt = rows.flatMap(r => r._3.filter(vocab).map(t => (r._2, t)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mass = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ndocs = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val labels = ndocs.keys.toSeq.sorted
    rows.foreach { case (id, _, toks) =>
      if (toks.nonEmpty) {
        val best = labels.map { c =>
          val m = mass.getOrElse(c, 0L)
          val oov = -refIlog(m + 2001)
          val s = refIlog(ndocs(c)) + toks.map(t =>
            cnt.get((c, t)).map(n => refIlog(n + 1) - refIlog(m + 2001))
              .getOrElse(oov)).sum
          (-s, c)
        }.min
        assert(got(id) == (best._2, -best._1), s"doc $id")
      } else assert(!got.contains(id))
    }
  }
}
