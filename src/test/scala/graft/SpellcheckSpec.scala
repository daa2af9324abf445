package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** i17 mechanism pins: the SymSpell claim that any pair at edit
  * distance ≤ 2 shares a ≤2-deletion variant — fuzzed over random
  * strings with planted 1- and 2-edit damage of every kind — and the
  * converse honesty check that d=2 blocking DOES over-generate (the
  * levenshtein verify is load-bearing, unlike u3's exact channels). */
class SpellcheckSpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0)
      d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  /** The query's exact variant set: delete ≤ 2 characters. */
  private def del2(s: String): Set[String] = {
    val d1 = s.indices.map(i => s.substring(0, i) + s.substring(i + 1))
    val d2 = for {
      i <- s.indices; j <- (i + 1) until s.length
    } yield s.substring(0, i) + s.substring(i + 1, j) + s.substring(j + 1)
    (d1 ++ d2 :+ s).toSet
  }

  test("lev<=2 pairs always share a <=2-deletion variant; blocking over-generates") {
    val rnd = new Random(20260815)
    val alphabet = "abcz0"
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def edit1(s: String): String = {
      if (s.isEmpty) return alphabet(rnd.nextInt(alphabet.length)).toString
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i + 1)
        case 1 => s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i)
        case _ => s.substring(0, i) + s.substring(i + 1)
      }
    }
    val bases = (1 to 200).map(_ => randStr(4 + rnd.nextInt(6)))
    var checked = 0
    bases.foreach { b =>
      val once = edit1(b)
      val twice = edit1(once)
      for (v <- Seq(once, twice) if v.nonEmpty && lev(b, v) <= 2) {
        assert(del2(b).intersect(del2(v)).nonEmpty,
          s"blocking MISSED '$b' vs '$v' (lev ${lev(b, v)})")
        checked += 1
      }
    }
    assert(checked > 300, s"fuzz degenerated: only $checked pairs checked")
    // the verify must be load-bearing: find a sharing pair with lev > 2
    val over = (for {
      a <- bases.take(60); b <- bases.take(60)
      if a < b && lev(a, b) > 2 && del2(a).intersect(del2(b)).nonEmpty
    } yield (a, b)).take(1)
    assert(over.nonEmpty,
      "no lev>2 pair shares a block — the levenshtein verify looks vacuous")
  }
}
