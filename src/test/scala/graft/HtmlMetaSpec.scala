package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.HtmlMeta

/** Head-directive census: tag-soup attribute tolerance, head-only
  * scoping, token semantics, budgets. */
class HtmlMetaSpec extends AnyFunSuite {

  test("attribute order, quote styles, and case are all tolerated") {
    val d = HtmlMeta.parse(
      """<html><head>
        |<META CONTENT='NoIndex, NOFOLLOW' NAME=ROBOTS>
        |<link href=https://a.example/c rel=canonical>
        |<link hreflang="PT-BR" rel='alternate' href='/pt'>
        |<meta property="og:title" content="T & T">
        |<meta charset = UTF-8 >
        |</head><body></body>""".stripMargin)
    assert(d.noindex && d.nofollow)
    assert(d.canonical == "https://a.example/c")
    assert(d.hreflangs == Seq("pt-br"))
    assert(d.ogTitle == "T & T")
    assert(d.charset == "utf-8")
  }

  test("robots 'none' implies both; 'all'/'index' imply neither") {
    assert(HtmlMeta.parse("""<meta name=robots content=none>""").noindex)
    assert(HtmlMeta.parse("""<meta name=robots content=none>""").nofollow)
    val all = HtmlMeta.parse("""<meta name=robots content="all">""")
    assert(!all.noindex && !all.nofollow)
  }

  test("directives after </head> or <body do not count") {
    val d = HtmlMeta.parse(
      """<head><meta name=robots content=index></head>
        |<body><link rel=canonical href="https://evil/">
        |<meta name=robots content=noindex></body>""".stripMargin)
    assert(!d.noindex && d.canonical == null)
    val e = HtmlMeta.parse(
      """<head></head><body onload=x><meta property="og:title" content=late>""")
    assert(e.ogTitle == null)
  }

  test("first-wins for single-valued fields; repeats accumulate flags") {
    val d = HtmlMeta.parse(
      """<head><link rel=canonical href=/first>
        |<link rel=canonical href=/second>
        |<meta name=robots content=noindex>
        |<meta name=robots content=nofollow></head>""".stripMargin)
    assert(d.canonical == "/first")
    assert(d.noindex && d.nofollow) // union across repeated robots metas
  }

  test("meta refresh: the WHATWG content grammar's spellings") {
    def r(c: String) =
      HtmlMeta.parse(s"""<head><meta http-equiv=refresh content="$c"></head>""")
    assert(r("5") == r("5").copy(refreshDelay = 5L, refreshUrl = null))
    assert(r("0; url=https://t.ex/a").refreshUrl == "https://t.ex/a")
    assert(r("0; url=https://t.ex/a").refreshDelay == 0L)
    assert(r("3,URL='https://t.ex/b'").refreshUrl == "https://t.ex/b")
    assert(r("7 ; Url = https://t.ex/c").refreshUrl == "https://t.ex/c")
    // non-conforming content ignored (no digits / garbage)
    assert(r("soon").refreshDelay == -1L && r("soon").refreshUrl == null)
    assert(r("").refreshDelay == -1L)
    // first refresh wins
    val two = HtmlMeta.parse(
      """<head><meta http-equiv=refresh content="1; url=/first">
        |<meta http-equiv=refresh content="9; url=/second"></head>""".stripMargin)
    assert(two.refreshDelay == 1L && two.refreshUrl == "/first")
  }

  test("null, empty, unterminated, and tag-bomb inputs never throw") {
    assert(HtmlMeta.parse(null).canonical == null)
    assert(HtmlMeta.parse("").ogTitle == null)
    assert(HtmlMeta.parse("<meta name=robots content=noindex").noindex == false)
    // 100k tags: the budget stops the scan, no quadratic blowup
    val bomb = "<meta name=x content=y>" * 100000
    val t0 = System.nanoTime()
    HtmlMeta.parse("<head>" + bomb)
    assert((System.nanoTime() - t0) / 1e9 < 2.0, "tag bomb not budgeted")
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 200) {
      val junk = Array.fill(500)(rnd.nextPrintableChar()).mkString
      HtmlMeta.parse(junk)
    }
  }
}
