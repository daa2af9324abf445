package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** u3 mechanism pins: symmetric-delete blocking (FastSS/SymSpell) must
  * find EVERY pair at edit distance 1 — the completeness claim the
  * oracle's brute force checks only on the fixture's digit-string
  * shapes. The fuzz here drives arbitrary random strings plus planted
  * single-edit variants (substitution, insertion, deletion) through the
  * same variant generation and compares against brute-force levenshtein
  * over all pairs. */
class TypoSquatSpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0) // d[i-1][j-1]
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

  /** The query's exact variant set: (pos, string-with-char-pos-deleted),
    * 1-based pos — the position tag is what makes the channels exact. */
  private def dels(h: String): Seq[(Int, String)] =
    h.indices.map(i => (i + 1) -> (h.substring(0, i) + h.substring(i + 1)))

  test("pos-tagged two-channel blocking yields EXACTLY the levenshtein=1 pairs") {
    val rnd = new Random(20260814)
    val alphabet = "abcz0" // tiny alphabet forces dense collisions
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val bases = (1 to 120).map(_ => randStr(3 + rnd.nextInt(6)))
    // plant single-edit variants of every kind
    val planted = bases.flatMap { b =>
      val i = rnd.nextInt(b.length)
      Seq(
        b.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + b.substring(i + 1),
        b.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + b.substring(i),
        b.substring(0, i) + b.substring(i + 1))
    }
    val hosts = (bases ++ planted).distinct.filter(_.nonEmpty)

    val truth = (for {
      a <- hosts; b <- hosts if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    assert(truth.size > 100, s"fuzz degenerated: only ${truth.size} true pairs")

    // substitution channel: same deleted position, equal remainder
    val subs = hosts.flatMap(h => dels(h).map(d => d -> h))
      .groupBy(_._1).values.flatMap { vs =>
        val hs = vs.map(_._2).distinct
        for (a <- hs; b <- hs if a < b) yield (a, b)
      }.toSet
    // indel channel: a full host equals some deletion of another
    val hostSet = hosts.toSet
    val indel = hosts.flatMap(h => dels(h).map(_._2).filter(hostSet)
      .map(a => if (a < h) (a, h) else (h, a))).toSet
    val candidates = subs ++ indel
    // the sharpened claim: candidates ARE the answer — complete (no
    // missed edit kind) AND exact (no distance-2 false candidates)
    assert(candidates == truth)
    assert(candidates.forall { case (a, b) => lev(a, b) == 1 })
  }
}
