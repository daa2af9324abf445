package graft.core

/** HTML `<head>` directive census — the page-level signals a crawler's
  * policy loop consumes next to robots.txt (`core/Robots.scala` is the
  * host gate; these are the PER-PAGE gates): `<meta name=robots>`
  * noindex/nofollow, `<link rel=canonical>` (the dedupe hint every
  * search pipeline honors), `<link rel=alternate hreflang>` language
  * alternates, OpenGraph title/image, and the declared charset. The
  * reference's parser inventories head tags the same way
  * (`ParseWorker.java` tag→attr walk) but never surfaces directives.
  *
  * Tag-soup tolerant the way the signals appear in the wild: attribute
  * order free, single/double/unquoted values, case-insensitive names
  * and tokens, self-closing or not; the scan stops at `</head>`/`<body`
  * (directives are head material per spec) and is budgeted. Pure
  * function of the input string; never throws.
  */
object HtmlMeta {

  final case class Directives(
      noindex: Boolean, nofollow: Boolean, canonical: String,
      hreflangs: Seq[String], ogTitle: String, ogImage: String,
      charset: String, refreshDelay: Long = -1L, refreshUrl: String = null)

  private val MaxTags = 4096

  /** Parse attributes of one tag body (between the tag name and '>'). */
  private def attrs(s: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && (s(i).isWhitespace || s(i) == '/')) i += 1
      val ks = i
      while (i < n && s(i) != '=' && s(i) != '>' && !s(i).isWhitespace &&
        s(i) != '/') i += 1
      if (i > ks) {
        val key = s.substring(ks, i).toLowerCase
        var value = ""
        while (i < n && s(i).isWhitespace) i += 1
        if (i < n && s(i) == '=') {
          i += 1
          while (i < n && s(i).isWhitespace) i += 1
          if (i < n && (s(i) == '"' || s(i) == '\'')) {
            val q = s(i); i += 1
            val vs = i
            while (i < n && s(i) != q) i += 1
            value = s.substring(vs, math.min(i, n))
            if (i < n) i += 1
          } else {
            val vs = i
            while (i < n && !s(i).isWhitespace && s(i) != '>') i += 1
            value = s.substring(vs, i)
          }
        }
        if (!out.contains(key)) out(key) = value
      } else i += 1
    }
    out.toMap
  }

  def parse(html: String): Directives = {
    if (html == null) return Directives(noindex = false, nofollow = false,
      null, Seq.empty, null, null, null)
    var noindex = false; var nofollow = false
    var canonical: String = null
    val hreflangs = scala.collection.mutable.ArrayBuffer[String]()
    var ogTitle: String = null; var ogImage: String = null
    var charset: String = null
    var refreshDelay = -1L; var refreshUrl: String = null
    var i = 0
    val n = html.length
    var tags = 0
    var stop = false
    while (!stop && tags < MaxTags) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) stop = true
      else {
        val gt = html.indexOf('>', lt + 1)
        if (gt < 0) stop = true
        else {
          val body = html.substring(lt + 1, gt)
          val nameEnd = body.indexWhere(c => c.isWhitespace || c == '/')
          val name = (if (nameEnd < 0) body else body.substring(0, nameEnd))
            .toLowerCase
          if (name == "/head" || name == "body") stop = true
          else if (name == "meta" || name == "link") {
            val a = attrs(if (nameEnd < 0) "" else body.substring(nameEnd))
            if (name == "meta") {
              val metaName = a.getOrElse("name", "").toLowerCase
              val prop = a.getOrElse("property", "").toLowerCase
              if (metaName == "robots") {
                val toks = a.getOrElse("content", "").toLowerCase
                  .split("[,\\s]+").map(_.trim).filter(_.nonEmpty).toSet
                if (toks("noindex") || toks("none")) noindex = true
                if (toks("nofollow") || toks("none")) nofollow = true
              } else if (a.getOrElse("http-equiv", "").equalsIgnoreCase("refresh")
                  && refreshDelay < 0) {
                // WHATWG "shared declarative refresh steps": digits,
                // optional [;,] + whitespace, optional url= prefix,
                // optional quotes around the URL
                val c = a.getOrElse("content", "").trim
                val m = "^(\\d+)\\s*(?:[;,]\\s*(?:[uU][rR][lL]\\s*=\\s*)?" +
                  "[\"']?([^\"']*)[\"']?)?\\s*$"
                val re = m.r
                c match {
                  case re(d, u) =>
                    refreshDelay = d.toLongOption.getOrElse(-1L)
                    refreshUrl = Option(u).map(_.trim).filter(_.nonEmpty).orNull
                  case _ => () // non-conforming content ignored
                }
              } else if (prop == "og:title" && ogTitle == null)
                ogTitle = a.getOrElse("content", null)
              else if (prop == "og:image" && ogImage == null)
                ogImage = a.getOrElse("content", null)
              else if (a.contains("charset") && charset == null)
                charset = a("charset").toLowerCase
            } else {
              val rel = a.getOrElse("rel", "").toLowerCase
              if (rel == "canonical" && canonical == null)
                canonical = a.getOrElse("href", null)
              else if (rel == "alternate" && a.contains("hreflang"))
                hreflangs += a("hreflang").toLowerCase
            }
          }
          tags += 1
          i = gt + 1
        }
      }
    }
    Directives(noindex, nofollow, canonical, hreflangs.toSeq, ogTitle,
      ogImage, charset, refreshDelay, refreshUrl)
  }
}
