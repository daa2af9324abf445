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

  // ---- session-id normalization (the reference's full pattern
  // inventory, SessionIDURLNormalizer.java) ----
  // Eight families of embedded session tokens, each gated on an exact id
  // shape — 32-hex, 26-alnum, digits, or ≥36 hex-with-dashes — so
  // ordinary short ids (?sid=4422, ?sid=1085) survive. Tiers run in the
  // reference's order; first hit wins. Where the reference's raw
  // substring splice would detach a following query param ("cart&item"),
  // the splice here repairs the separator ("cart?item") — its own test
  // URLs never exercise that edge.

  private def isHex(s: String) = s.forall(c =>
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
  private def isAlnumAscii(s: String) = s.forall(c =>
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
  private def isHexDash(s: String) = s.forall(c => c == '-' || isHex(c.toString))
  private def isDigits(s: String) = s.forall(c => c >= '0' && c <= '9')

  /** Remove common session-id patterns from a URL string. */
  def stripSessionIds(url: String): String = {
    if (url == null) return null
    val lower = url.toLowerCase
    // remove [from, until) and repair query separators the removal broke
    def splice(from: Int, until: Int): String = {
      val pre = url.substring(0, from)
      var post = url.substring(until)
      if (post.startsWith("&") && !pre.contains('?')) post = "?" + post.substring(1)
      if (pre.endsWith("?") && post.startsWith("&")) post = post.substring(1)
      val out = pre + post
      if (out.endsWith("?") || out.endsWith("&")) out.dropRight(1) else out
    }
    // 1. PHPSESSID<delim><id>: delim in =.-+/, id runs to the next
    //    &.-+/ or end, and must be exactly 32-hex or 26-alnum
    val phpIdx = lower.lastIndexOf("phpsessid")
    if (phpIdx >= 1 && phpIdx + 9 < lower.length &&
        "=.-+/".indexOf(lower.charAt(phpIdx + 9)) >= 0) {
      val idStart = phpIdx + 10
      var idEnd = idStart
      while (idEnd < lower.length && "&.-+/".indexOf(lower.charAt(idEnd)) < 0) idEnd += 1
      val id = lower.substring(idStart, idEnd)
      if ((id.length == 32 && isHex(id)) || (id.length == 26 && isAlnumAscii(id)))
        return splice(phpIdx - 1, idEnd)
    }
    // 2. .php URL whose trailing path is /oscsid/<32-hex>
    if (lower.contains(".php")) {
      val lastSlash = lower.lastIndexOf('/')
      if (lastSlash > 0) {
        val id = lower.substring(lastSlash + 1)
        if (id.length == 32 && isHex(id)) {
          val prevSlash = lower.lastIndexOf('/', lastSlash - 1)
          if (prevSlash >= 0 && lower.startsWith("oscsid", prevSlash + 1) &&
              prevSlash + 7 == lastSlash)
            return url.substring(0, prevSlash)
        }
      }
    }
    // 3. oscsid<...>/<32-hex> tail (any spelling position)
    val oscIdx = lower.lastIndexOf("oscsid")
    if (oscIdx >= 1) {
      val slash = lower.indexOf('/', oscIdx + 6)
      if (slash >= 0) {
        val id = lower.substring(slash + 1)
        if (id.length == 32 && isHex(id)) return url.substring(0, oscIdx - 1)
      }
    }
    // 4. -oscsid-<32-hex>.html
    val dashIdx = lower.lastIndexOf("-oscsid-")
    if (dashIdx >= 0) {
      val htmlIdx = lower.lastIndexOf(".html")
      if (htmlIdx > dashIdx) {
        val id = lower.substring(dashIdx + 8, htmlIdx)
        if (id.length == 32 && isHex(id))
          return url.substring(0, dashIdx) + url.substring(htmlIdx)
      }
    }
    // 5. /sessions/<32-hex>/
    val sessIdx = lower.indexOf("/sessions/")
    if (sessIdx >= 0) {
      val slash = lower.indexOf('/', sessIdx + 10)
      if (slash >= 0) {
        val id = lower.substring(sessIdx + 10, slash)
        if (id.length == 32 && isHex(id))
          return url.substring(0, sessIdx) + url.substring(slash)
      }
    }
    // 6. ;$sessionid$<alnum-to-end>
    val dsIdx = lower.indexOf(";$sessionid$")
    if (dsIdx >= 0 && isAlnumAscii(lower.substring(dsIdx + 12)))
      return url.substring(0, dsIdx)
    // 7. /session_id/<32-hex>/
    val siIdx = lower.indexOf("/session_id/")
    if (siIdx >= 0) {
      val slash = lower.indexOf('/', siIdx + 12)
      if (slash >= 0) {
        val id = lower.substring(siIdx + 12, slash)
        if (id.length == 32 && isHex(id))
          return url.substring(0, siIdx) + url.substring(slash)
      }
    }
    // 8. --session_id.<digits>--
    val ddIdx = lower.indexOf("--session_id.")
    if (ddIdx >= 0) {
      val next = lower.indexOf("--", ddIdx + 13)
      if (next >= 0 && isDigits(lower.substring(ddIdx + 13, next)))
        return url.substring(0, ddIdx) + url.substring(next)
    }
    // 9. generic sid/oscsid/mscsid param preceded by / ? & +, id shape
    //    ≥32-hex, ≥36 hex-with-dashes, or ≥26-alnum (dashes allowed
    //    mid-id: the terminator set here excludes '-')
    var keyIdx = -1
    var keyLen = 0
    for (k <- Seq("sid", "oscsid", "mscsid") if keyIdx < 0) {
      val i = lower.lastIndexOf(k)
      if (i >= 1 && "/?&+".indexOf(lower.charAt(i - 1)) >= 0) { keyIdx = i; keyLen = k.length }
    }
    if (keyIdx >= 1 && keyIdx + keyLen < lower.length &&
        "=.-+/".indexOf(lower.charAt(keyIdx + keyLen)) >= 0) {
      val idStart = keyIdx + keyLen + 1
      var idEnd = idStart
      while (idEnd < lower.length && "&.+/".indexOf(lower.charAt(idEnd)) < 0) idEnd += 1
      val id = lower.substring(idStart, idEnd)
      val ok = (id.length >= 32 && isHex(id)) ||
        (id.length >= 36 && isHexDash(id)) ||
        (id.length >= 26 && isAlnumAscii(id))
      if (ok) return splice(keyIdx - 1, idEnd)
    }
    // 10. ;jsessionid=… runs to '?' (query survives) or to the end
    val jsIdx = lower.indexOf(";jsessionid=")
    if (jsIdx >= 0) {
      val q = lower.indexOf('?', jsIdx)
      return if (q >= 0) url.substring(0, jsIdx) + url.substring(q)
      else url.substring(0, jsIdx)
    }
    url
  }

  /** IDN host → punycode ASCII form (googleurl canonicalizes non-ASCII
    * hosts the same way; RFC 3490 via the JDK). Unconvertible input
    * passes through — malformed hosts are data at crawl scale. */
  private def punycode(host: String): String =
    if (host.forall(_ < 128)) host
    else scala.util.Try(
      java.net.IDN.toASCII(host, java.net.IDN.ALLOW_UNASSIGNED).toLowerCase)
      .getOrElse(host)

  /** Characters that invalidate a host after %-decoding (url_canon's
    * forbidden-host set: a host containing any of these makes the whole
    * URL invalid, it is not escaped around). '%' is here too — after
    * decoding, a leftover '%' means a malformed escape. */
  private def hostCharForbidden(c: Char): Boolean =
    c <= ' ' || " <>\"#%/:?@[\\]^|{}".indexOf(c) >= 0

  /** %-decode a host section to UTF-8 (url_canon decodes host escapes
    * before IDN); returns null on a malformed escape or bad UTF-8. */
  private def decodeHostEscapes(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length || !isHexDigit(s.charAt(i + 1)) || !isHexDigit(s.charAt(i + 2)))
          return null
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else if (c < 128) { bytes.write(c.toInt); i += 1 }
      else {
        // advance by CODE POINT: char-at-a-time UTF-8 encoding turns a
        // surrogate pair (any non-BMP host label, e.g. an emoji domain)
        // into two '?' bytes — '?' is then a forbidden host char and a
        // valid IDN host gets rejected
        val n = s.offsetByCodePoints(i, 1)
        s.substring(i, n).getBytes("UTF-8").foreach(b => bytes.write(b & 0xff))
        i = n
      }
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    scala.util.Try(
      dec.decode(java.nio.ByteBuffer.wrap(bytes.toByteArray)).toString
    ).getOrElse(null)
  }

  /** Component-wise URL parse with url_canon's cleanup rules (the
    * googleurl behaviors GoogleURL.java:30 delegates to native code for):
    * tab/CR/LF stripped anywhere, surrounding space/control trimmed,
    * backslashes read as slashes for the special schemes, userinfo split
    * at the LAST '@' of the authority, host %-decoded → lowercased → IDN
    * punycoded with the forbidden-char check, port validated ≤ 65535
    * with leading zeros dropped. Invalid host/port ⇒ None (url_canon
    * marks the whole URL invalid, it never "repairs" a bad authority). */
  def parse(url: String): Option[ParsedUrl] = {
    if (url == null) return None
    var s = url
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) <= ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) <= ' ') hi -= 1
    s = s.substring(lo, hi).filter(c => c != '\t' && c != '\n' && c != '\r')
    val ci = s.indexOf(':')
    if (ci <= 0) return None
    val scheme = s.substring(0, ci).toLowerCase
    // ASCII-only scheme charset (url_canon / RFC 3986 §3.1):
    // Char.isLetter is Unicode-aware and would accept "фtp:"
    def asciiLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def asciiAlnum(c: Char) = asciiLetter(c) || (c >= '0' && c <= '9')
    if (!asciiLetter(scheme.charAt(0)) ||
        !scheme.forall(c => asciiAlnum(c) || c == '+' || c == '.' || c == '-'))
      return None
    val special = DefaultPorts.contains(scheme)
    // special schemes: any run of / or \ opens the authority (url_canon
    // accepts http:\\host, http:////host); others need a literal //
    var p = ci + 1
    if (special) {
      if (p >= s.length || (s.charAt(p) != '/' && s.charAt(p) != '\\')) return None
      while (p < s.length && (s.charAt(p) == '/' || s.charAt(p) == '\\')) p += 1
    } else {
      if (!s.startsWith("//", p)) return None
      p += 2
    }
    // authority runs to the first / \ ? #
    var ae = p
    while (ae < s.length && "/\\?#".indexOf(s.charAt(ae)) < 0) ae += 1
    val authority = s.substring(p, ae)
    val at = authority.lastIndexOf('@')
    val userInfo = if (at < 0) "" else authority.substring(0, at)
    val hostPort = authority.substring(at + 1)
    // bracketed IPv6 literal: [::1] passes through lowercased
    val (rawHost, portStr) =
      if (hostPort.startsWith("[")) {
        val rb = hostPort.indexOf(']')
        if (rb < 0) return None
        val tail = hostPort.substring(rb + 1)
        if (tail.isEmpty) (hostPort.substring(0, rb + 1), "")
        else if (tail.startsWith(":")) (hostPort.substring(0, rb + 1), tail.substring(1))
        else return None
      } else hostPort.lastIndexOf(':') match {
        case -1 => (hostPort, "")
        case i => (hostPort.substring(0, i), hostPort.substring(i + 1))
      }
    if (rawHost.isEmpty) return None
    val port =
      if (portStr.isEmpty) -1
      else if (portStr.forall(c => c >= '0' && c <= '9') && portStr.length <= 9) {
        val v = portStr.toInt
        if (v > 65535) return None else v
      } else return None
    val host =
      if (rawHost.startsWith("[")) rawHost.toLowerCase
      else {
        val dec = decodeHostEscapes(rawHost)
        if (dec == null) return None
        val lower = dec.toLowerCase.stripSuffix(".")
        if (lower.isEmpty || lower.exists(c => c < 128 && hostCharForbidden(c)))
          return None
        punycode(lower)
      }
    // the rest: path (backslashes are slashes up to the query), ?query, #ref
    val rest = s.substring(ae)
    val qi = rest.indexOf('?')
    val fi = rest.indexOf('#')
    val pathEnd = (qi, fi) match {
      case (-1, -1) => rest.length
      case (-1, f) => f
      case (q, -1) => q
      case (q, f) => math.min(q, f)
    }
    val path = rest.substring(0, pathEnd).replace('\\', '/')
    val afterPath = rest.substring(pathEnd)
    val (query, ref) =
      if (afterPath.startsWith("?")) {
        val f2 = afterPath.indexOf('#')
        if (f2 < 0) (afterPath.substring(1), "")
        else (afterPath.substring(1, f2), afterPath.substring(f2 + 1))
      } else if (afterPath.startsWith("#")) ("", afterPath.substring(1))
      else ("", "")
    Some(ParsedUrl(scheme, userInfo, host, port, path, query, ref))
  }

  private def isHexDigit(c: Char) =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private val UnreservedChars: Set[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9')).toSet ++ Set('-', '.', '_', '~')

  /** Characters a canonical PATH escapes when they appear raw
    * (url_canon's path charset: space plus the "unsafe" printables). */
  private def pathCharNeedsEscape(c: Char): Boolean =
    c < ' ' || c == 0x7f || " \"<>`^{}|".indexOf(c) >= 0

  private def appendUtf8Escaped(sb: StringBuilder, s: String, i: Int): Int = {
    val c = s.charAt(i)
    val end = if (Character.isHighSurrogate(c) && i + 1 < s.length) i + 2 else i + 1
    s.substring(i, end).getBytes("UTF-8")
      .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
    end
  }

  /** googleurl-style percent-encoding normalization of a PATH section:
    * an escape of an UNRESERVED char decodes (%7E → ~), any other escape
    * uppercases its hex (%3c → %3C), raw space/unsafe printables/
    * controls/non-ASCII encode, and a stray '%' not opening a valid
    * escape passes through unchanged (url_canon is lenient there — it
    * never rewrites it to %25). Decoding runs before dot-segment removal
    * so %2E-spelled dots participate in it, as they do in googleurl. */
  private def normalizeEscapes(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHexDigit(s.charAt(i + 1)) && isHexDigit(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar
        if (UnreservedChars.contains(v)) sb.append(v)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      }
      else if (c > 127) i = appendUtf8Escaped(sb, s, i)
      else if (pathCharNeedsEscape(c)) { sb.append(f"%%${c.toInt}%02X"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Canonical QUERY encoding (url_canon_query): existing escapes pass
    * through VERBATIM — no case normalization, no unreserved decoding —
    * and only space, quote, angle brackets, controls and non-ASCII get
    * escaped. A query hashes differently from a path on purpose: the
    * reference fingerprints the canonical string, and googleurl leaves
    * query escapes exactly as the site emitted them. */
  private def normalizeQueryEscapes(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 127) i = appendUtf8Escaped(sb, s, i)
      else if (c < ' ' || c == 0x7f || " \"<>".indexOf(c) >= 0) {
        sb.append(f"%%${c.toInt}%02X"); i += 1
      }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Canonical userinfo: path-style escape normalization plus the '@'
    * that survived the last-wins authority split (url_canon escapes it
    * so the canonical form re-parses to the same components). */
  private def normalizeUserInfo(s: String): String =
    normalizeEscapes(s).replace("@", "%40")

  /** Scheme default ports (url_canon's per-scheme defaults). */
  private val DefaultPorts = Map(
    "http" -> 80, "ws" -> 80, "https" -> 443, "wss" -> 443, "ftp" -> 21)

  /** Canonical form usable as the identity of a URL. Null for invalid
    * URLs. Follows the reference's assembly (URLUtils.canonicalizeURL:
    * scheme://[user[:pass]@]host[:port]path-cut-at-';'[?query], session
    * ids stripped, ref kept only for #! hashbangs) over googleurl's
    * component canonicalization (IDN→punycode in [[parse]], escape
    * normalization, dot-segment removal, empty path → "/", default and
    * port-80 stripping — the reference drops :80 for EVERY scheme, not
    * just http: URLUtils.java:114 compares the port string to "80"
    * unconditionally; kept bit-for-bit for fingerprint parity). */
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
        if (u.userInfo.nonEmpty) sb.append(normalizeUserInfo(u.userInfo)).append('@')
        sb.append(host)
        if (u.port > 0 && u.port != 80 &&
            !DefaultPorts.get(u.scheme).contains(u.port))
          sb.append(':').append(u.port)
        val semi = u.path.indexOf(';')
        val rawPath = if (semi >= 0) u.path.substring(0, semi) else u.path
        val path = removeDotSegments(normalizeEscapes(rawPath))
        sb.append(if (path.isEmpty) "/" else path)
        if (u.query.nonEmpty) sb.append('?').append(normalizeQueryEscapes(u.query))
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
