package graft.core

/** URL canonicalization, root-domain extraction, and 128-bit URL
  * fingerprints — the identity layer of the crawl database.
  *
  * Behavior follows the reference (util/URLUtils.java:67-187 canonicalize,
  * :268-319 fingerprint; util/SessionIDURLNormalizer.java:70 session-id
  * stripping; util/TLDNamesCollection.java TLD tables) re-implemented in
  * pure Scala: lowercase scheme/host, trailing-dot strip, www-strip (unless
  * the host IS the root domain), default-port-80 drop, path ;params strip,
  * session-id removal, fragment dropped except #! (AJAX crawl convention).
  */
object Urls {

  final case class ParsedUrl(
      scheme: String,
      userInfo: String,
      host: String,
      port: Int,
      path: String,
      query: String,
      ref: String,
  )

  /** Multi-label public suffixes (compact subset of the public-suffix list;
    * the reference embeds a full TLD table — TLDNamesCollection.java:33). */
  private val MultiPartSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ac.in", "edu.in", "gov.in",
    "com.mx", "org.mx", "net.mx", "gob.mx",
    "co.za", "org.za", "net.za", "ac.za", "gov.za",
    "com.ar", "com.tr", "com.tw", "com.hk", "com.sg", "com.my",
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "com.ua", "net.ua", "org.ua",
    "com.ru", "net.ru", "org.ru",
    "co.th", "ac.th", "or.th", "go.th",
    "com.pl", "net.pl", "org.pl",
    "com.vn", "net.vn", "org.vn",
    "com.ph", "net.ph", "org.ph",
    "co.id", "or.id", "ac.id", "go.id",
  )

  /** Extract the registrable ("root") domain from a host name:
    * the public suffix plus one label. Returns null when the host has no
    * dot or is an IP address (matches reference null behavior).
    */
  def extractRootDomain(host0: String): String = {
    if (host0 == null || host0.isEmpty) return null
    val host = host0.toLowerCase.stripSuffix(".")
    if (host.indexOf('.') < 0) return null
    if (host.forall(c => c.isDigit || c == '.')) return null // IPv4
    val labels = host.split('.')
    if (labels.length < 2 || labels.exists(_.isEmpty)) return null
    val lastTwo = labels.takeRight(2).mkString(".")
    val suffixLabels =
      if (labels.length >= 3 && MultiPartSuffixes.contains(lastTwo)) 3 else 2
    if (labels.length < suffixLabels) null
    else labels.takeRight(suffixLabels).mkString(".")
  }

  // session-id path/query fragments the normalizer removes
  // (SessionIDURLNormalizer.java:58-66)
  private val SessionQueryParams: Set[String] =
    Set("jsessionid", "phpsessid", "sid", "oscsid", "mscsid", "sessionid", "session_id")
  private val HexId = "^[0-9a-fA-F]{16,64}$".r
  private val PathSessionSeg =
    "(?i)[;/](jsessionid|phpsessid|session_id|oscsid)[=/.][0-9a-zA-Z]{8,64}".r

  /** Remove common session-id patterns from a canonical URL string. */
  def stripSessionIds(url: String): String = {
    var out = PathSessionSeg.replaceAllIn(url, "")
    val qIdx = out.indexOf('?')
    if (qIdx >= 0) {
      val (base, queryPart) = (out.substring(0, qIdx), out.substring(qIdx + 1))
      val kept = queryPart.split('&').filter { kv =>
        val eq = kv.indexOf('=')
        val k = (if (eq >= 0) kv.substring(0, eq) else kv).toLowerCase
        val v = if (eq >= 0) kv.substring(eq + 1) else ""
        !(SessionQueryParams.contains(k) &&
          (v.length >= 8 || HexId.findFirstIn(v).isDefined))
      }
      out = if (kept.isEmpty) base else base + "?" + kept.mkString("&")
    }
    out
  }

  private val UrlRe =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:([^/?#@]*)@)?([^/?#:]*)(?::([0-9]*))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$".r

  def parse(url: String): Option[ParsedUrl] = url match {
    case null => None
    case UrlRe(scheme, user, host, port, path, query, ref) if host != null && host.nonEmpty =>
      Some(ParsedUrl(
        scheme.toLowerCase,
        Option(user).getOrElse(""),
        host.toLowerCase.stripSuffix("."),
        Option(port).filter(_.nonEmpty).map(_.toInt).getOrElse(-1),
        Option(path).getOrElse(""),
        Option(query).getOrElse(""),
        Option(ref).getOrElse(""),
      ))
    case _ => None
  }

  /** Canonical form usable as the identity of a URL. Null for invalid URLs. */
  def canonicalize(url: String, stripWww: Boolean = true): String = {
    parse(url) match {
      case None => null
      case Some(u) =>
        var host = u.host
        if (stripWww && host.startsWith("www.")) {
          val root = extractRootDomain(host)
          if (root == null || root != host) host = host.substring(4)
        }
        val sb = new StringBuilder(url.length)
        sb.append(u.scheme).append("://")
        if (u.userInfo.nonEmpty) sb.append(u.userInfo).append('@')
        sb.append(host)
        if (u.port > 0 && u.port != 80) sb.append(':').append(u.port)
        val semi = u.path.indexOf(';')
        sb.append(if (semi >= 0) u.path.substring(0, semi) else u.path)
        if (u.query.nonEmpty) sb.append('?').append(u.query)
        var out = stripSessionIds(sb.toString)
        if (u.ref.nonEmpty && u.ref.charAt(0) == '!') out += "#" + u.ref
        out
    }
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over the path part of `s`
    * (query/fragment tail untouched). */
  private def removeDotSegments(s: String): String = {
    val cut = s.indexWhere(c => c == '?' || c == '#') match {
      case -1 => s.length
      case i => i
    }
    val (path, tail) = (s.substring(0, cut), s.substring(cut))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val abs = path.startsWith("/")
    val segs = path.split("/", -1)
    for (seg <- segs) seg match {
      case "." => ()
      case ".." => if (out.nonEmpty && out.last != "..") out.remove(out.length - 1)
                   else if (!abs) out += ".."
      case s2 => out += s2
    }
    // preserve a trailing slash implied by a final "." / ".." segment
    val trailingSlash = path.endsWith("/.") || path.endsWith("/..") || path.endsWith("/")
    val joined = out.filter(_.nonEmpty).mkString("/")
    val p = (if (abs) "/" else "") + joined + (if (trailingSlash && joined.nonEmpty) "/" else "")
    (if (p.isEmpty && abs) "/" else p) + tail
  }

  /** Resolve `ref` against absolute `base` (RFC 3986 §5 reference
    * resolution, the subset a link extractor needs): absolute refs and
    * non-hierarchical schemes pass through, `//host` takes the base
    * scheme, `/path` roots at the base authority, `?q`/`#f` replace the
    * base's query/fragment, and relative paths merge with the base path's
    * directory with dot-segment removal. The reference rebases links the
    * same way via its `<base href>`-aware URL construction
    * (ParseWorker.java:697, link URL resolution against baseURL). */
  def resolve(base: String, ref0: String): String = {
    if (ref0 == null) return null
    val ref = ref0.trim
    if (ref.isEmpty) return base
    if (ref.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) return ref
    parse(base) match {
      case None => ref
      case Some(b) =>
        val auth = new StringBuilder(b.scheme).append("://")
        if (b.userInfo.nonEmpty) auth.append(b.userInfo).append('@')
        auth.append(b.host)
        if (b.port > 0) auth.append(':').append(b.port)
        val prefix = auth.toString
        if (ref.startsWith("//")) b.scheme + ":" + ref
        else if (ref.startsWith("#")) {
          val cut = base.indexOf('#')
          (if (cut < 0) base else base.substring(0, cut)) + ref
        }
        else if (ref.startsWith("?")) {
          val path = if (b.path.isEmpty) "/" else b.path
          prefix + path + ref
        }
        else if (ref.startsWith("/")) prefix + removeDotSegments(ref)
        else {
          val dir = b.path.lastIndexOf('/') match {
            case -1 => "/"
            case i => b.path.substring(0, i + 1)
          }
          prefix + removeDotSegments(dir + ref)
        }
    }
  }

  /** 128-bit-style URL fingerprint (URLFPV2 — protocol.jr:54-72):
    * rootDomainHash = fp(rootDomain), domainHash = fp(host),
    * urlHash = fp(canonicalUrl) (URLUtils.java:268-319). */
  final case class UrlFp(rootDomainHash: Long, domainHash: Long, urlHash: Long)

  def fingerprint(url: String): Option[UrlFp] = {
    val canonical = canonicalize(url)
    if (canonical == null) return None
    parse(canonical).map { u =>
      val root = Option(extractRootDomain(u.host)).getOrElse(u.host)
      UrlFp(
        rootDomainHash = RabinFingerprint.std64.fp(root),
        domainHash = RabinFingerprint.std64.fp(u.host),
        urlHash = RabinFingerprint.std64.fp(canonical),
      )
    }
  }
}
