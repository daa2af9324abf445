package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.ops.Dedupe

/** Seeded fuzz battery for the round-19 string parsers (the r16–r18
  * codec-fuzz discipline applied to the header/paragraph tier): the
  * Link-header member split must recover exactly the members it was
  * given under adversarial quoting (commas inside quoted strings,
  * quoted-pairs, multi-member lines vs one-per-line), and the paragraph
  * splitter must count exactly the non-empty paragraphs under every
  * blank-line dialect. 251 seeds each, evaluated in ONE DataFrame pass. */
class Round19ParserFuzzSpec extends AnyFunSuite with SparkSuite {

  test("x31 member split recovers exact member counts under adversarial quoting") {
    import spark.implicits._
    val cases = (0 until 251).map { seed =>
      val rnd = new scala.util.Random(seed)
      val nMembers = rnd.nextInt(5) + 1
      val members = (0 until nMembers).map { i =>
        val sb = new StringBuilder(s"<https://h$seed.example/p$i>")
        // params in random order; quoted values may contain commas,
        // semicolons, and quoted-pairs — everything RFC 8288 §3 allows
        val params = scala.collection.mutable.ArrayBuffer[String]()
        if (rnd.nextBoolean()) params +=
          (if (rnd.nextBoolean()) "rel=\"next\"" else "rel=next")
        if (rnd.nextBoolean()) {
          val inner = (0 until rnd.nextInt(4)).map(_ =>
            Seq("a", ",", "; ", "\\\"", "b,c", " ")(rnd.nextInt(6))).mkString
          params += s"""title="$inner""""
        }
        if (rnd.nextBoolean()) params += "as=style"
        params.foreach(p => sb.append("; ").append(p))
        sb.toString
      }
      // one comma-combined line or one line per member
      val h =
        if (rnd.nextBoolean())
          s"HTTP/1.1 200 OK\r\nLink: ${members.mkString(", ")}\r\n\r\n"
        else
          s"HTTP/1.1 200 OK\r\n${members.map("Link: " + _).mkString("\r\n")}\r\n\r\n"
      // the only rel value generated is next (quoted or bare), and the
      // title alphabet can never spell "rel=" — so expected matches are
      // simply the members carrying a rel param
      (seed.toLong, h, nMembers.toLong,
        members.count(_.contains("rel=")).toLong)
    }
    val got = cases.toDF("seed", "h", "want_members", "want_next")
      .select(col("seed"), col("want_members"), col("want_next"),
        size(GraftFunctions.linkHeaderMembers(col("h"))).cast("long")
          .as("got_members"),
        size(filter(GraftFunctions.linkHeaderMembers(col("h")),
          m => m.rlike("(?i)rel=\"?next"))).cast("long").as("got_next"))
      .collect()
    for (r <- got) {
      assert(r.getLong(3) == r.getLong(1),
        s"seed ${r.getLong(0)}: member count ${r.getLong(3)} != ${r.getLong(1)}")
      assert(r.getLong(4) == r.getLong(2),
        s"seed ${r.getLong(0)}: rel=next count ${r.getLong(4)} != ${r.getLong(2)}")
    }
  }

  test("d20 paragraph splitter counts exact paragraphs under every blank-line dialect") {
    import spark.implicits._
    val seps = Seq("\n\n", "\n\n\n", "\r\n\r\n", "\n\r\n", "\n\n\r\n")
    val docs = (0 until 251).map { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val nParas = rnd.nextInt(6) + 1
      // paragraphs unique per doc AND per seed → nothing ever dedups
      val paras = (0 until nParas).map(i =>
        s"seed$seed para$i " + ("tok " * rnd.nextInt(4)).trim).map(_.trim)
      val text = paras.zipWithIndex.map { case (p, i) =>
        // random leading/trailing intra-paragraph whitespace survives trim
        if (rnd.nextBoolean()) s" $p " else p
      }.mkString(seps(rnd.nextInt(seps.length)))
      (seed.toLong, text, nParas.toLong)
    }
    val got = Dedupe.paragraphDedupe(
        docs.toDF("doc_id", "text", "want"), "doc_id", "text")
      .join(docs.toDF("doc_id", "t2", "want"), "doc_id")
      .select("doc_id", "n_paras", "want", "n_dropped").collect()
    assert(got.length == 251)
    for (r <- got) {
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: n_paras ${r.getLong(1)} != ${r.getLong(2)}")
      assert(r.getLong(3) == 0L, s"doc ${r.getLong(0)}: unexpected drop")
    }
  }
}
