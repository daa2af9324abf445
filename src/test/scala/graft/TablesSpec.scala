package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tables

/** x27 table extraction: analytic replay over all 251 seeds, the three
  * must-not-count distractors (commented-out table, scripted "<table>"
  * string, nested table), header detection edge cases, and garbage
  * tolerance. */
class TablesSpec extends AnyFunSuite {

  test("all 251 seeds replay analytically") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 11
      val ts = Tables.extractTables(Tables.encodeTablesHtml(docId))
      val nt = (k % 3 + 1).toInt
      val dr = (k % 4 + 1).toInt
      val cols = (k % 3 + 2).toInt
      assert(ts.length == nt, s"seed $k: ${ts.length} tables")
      for (t <- 0 until nt) {
        val (idx, nRows, nCols, hasHeader, text) = ts(t)
        assert(idx == t, s"seed $k")
        val hdr = if (t % 2 == 0) 1 else 0
        assert(nRows == dr + hdr && nCols == cols && hasHeader == hdr,
          s"seed $k table $t")
        val head =
          if (hdr == 1)
            Seq((0 until cols).map(c => s"H$t $c").mkString(" | "))
          else Seq.empty
        val body = (0 until dr).map(r => (0 until cols).map { c =>
          s"c$t $r $c of $docId" + (if (r == 0 && c == 0) " & co" else "")
        }.mkString(" | "))
        assert(text == (head ++ body).mkString("\n"), s"seed $k table $t")
      }
    }
  }

  test("distractors never count; mixed th/td first row is not a header") {
    val ts = Tables.extractTables(
      "<script>var x = '<table><tr><td>s</td></tr></table>';</script>" +
        "<!-- <table><tr><td>c</td></tr></table> -->" +
        "<table><tr><th>h</th><td>d</td></tr><tr><td>a</td><td>b</td></tr></table>" +
        "<table><tr><td>o<table><tr><td>i</td></tr></table></td></tr></table>")
    assert(ts.length == 1)
    val (_, nRows, nCols, hasHeader, text) = ts.head
    assert(nRows == 2 && nCols == 2 && hasHeader == 0)
    assert(text == "h | d\na | b")
  }

  test("empty rows and cell entities handle; garbage tolerated") {
    val ts = Tables.extractTables(
      "<table><tr></tr><tr><td>a &amp; b</td></tr></table>")
    assert(ts.length == 1 && ts.head._2 == 1 && ts.head._5 == "a & b")
    assert(Tables.extractTables(null).isEmpty)
    assert(Tables.extractTables("").isEmpty)
    assert(Tables.extractTables("<table><tr><td>unclosed").isEmpty)
    val rnd = new scala.util.Random(71)
    val base = Tables.encodeTablesHtml(17L).toCharArray
    for (_ <- 0 until 200) {
      val mut = base.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mut(rnd.nextInt(mut.length)) = (rnd.nextInt(94) + 32).toChar
      Tables.extractTables(new String(mut)) // never throws
    }
  }
}
