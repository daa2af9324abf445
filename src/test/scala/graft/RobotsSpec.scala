package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Robots

/** Pins core/Robots to the reference crawler's semantics
  * (RobotRulesParser.java): ordered first-match-wins prefixes, agent
  * precedence with `*` fallback, Crawl-delay, default allow. */
class RobotsSpec extends AnyFunSuite {

  private val policy =
    """# comment line
      |User-agent: alphabot
      |User-agent: betabot
      |Allow: /shared/ok/
      |Disallow: /shared/
      |Crawl-delay: 7
      |
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp/
      |""".stripMargin

  test("ordered rules: first prefix match wins, Allow must precede Disallow") {
    val r = Robots.parse(policy, Seq("alphabot"))
    assert(r.isAllowed("/shared/ok/page"))
    assert(!r.isAllowed("/shared/other"))
    assert(r.isAllowed("/anything/else")) // default allow
    // order-sensitivity: an Allow AFTER the broader Disallow never fires
    val late = Robots.parse(
      "User-agent: a\nDisallow: /p/\nAllow: /p/ok/\n", Seq("a"))
    assert(!late.isAllowed("/p/ok/x"))
  }

  test("agent precedence and * fallback") {
    // betabot shares alphabot's section (consecutive User-agent lines)
    assert(!Robots.parse(policy, Seq("betabot")).isAllowed("/shared/x"))
    // unknown agent falls to *
    val star = Robots.parse(policy, Seq("crawlerx"))
    assert(!star.isAllowed("/private/a") && !star.isAllowed("/tmp/b"))
    assert(star.isAllowed("/shared/anything"))
    assert(star.crawlDelaySec == -1L)
    // preferred agent order: first matching agent's section wins
    val multi = "User-agent: low\nDisallow: /a/\n\nUser-agent: high\nDisallow: /b/\n"
    val r = Robots.parse(multi, Seq("high", "low"))
    assert(!r.isAllowed("/b/x") && r.isAllowed("/a/x"))
  }

  test("crawl delay, empty values, garbage, and missing file") {
    assert(Robots.parse(policy, Seq("alphabot")).crawlDelaySec == 7L)
    assert(Robots.crawlDelay(policy, "betabot") == 7L)
    assert(Robots.isAllowed(null, "any", "/x")) // no robots.txt = all allowed
    assert(Robots.isAllowed("", "any", "/x"))
    // empty Disallow value restricts nothing (de-facto standard)
    assert(Robots.isAllowed("User-agent: *\nDisallow:\n", "any", "/x"))
    // garbage lines are skipped, valid rules still apply
    assert(!Robots.isAllowed(
      "<<not robots>>\nUser-agent: *\nDisallow: /x/\nnonsense\n", "any", "/x/1"))
    assert(Robots.parse("User-agent: *\nCrawl-delay: 2.5\n", Seq("a")).crawlDelaySec == 2L)
  }

  test("sitemap directives: anywhere in the file, any case, comments stripped") {
    val txt =
      """Sitemap: https://a.ex/one.xml
        |User-agent: *
        |Disallow: /private/
        |SITEMAP:	https://a.ex/two.xml # weekly
        |User-agent: badbot
        |sitemap: https://a.ex/three.xml
        |Sitemap:
        |Sitemap # no colon key
        |""".stripMargin
    assert(Robots.sitemaps(txt) == Seq(
      "https://a.ex/one.xml", "https://a.ex/two.xml", "https://a.ex/three.xml"))
    // the directive is section-independent: rules around it unaffected
    assert(!Robots.isAllowed(txt, "any", "/private/x"))
    assert(Robots.sitemaps(null).isEmpty && Robots.sitemaps("").isEmpty)
    // budget: a million-line bomb stops at the cap, no quadratic blowup
    val bomb = "Sitemap: https://b.ex/s.xml\n" * 1000000
    assert(Robots.sitemaps(bomb).length == 1024)
  }
}
