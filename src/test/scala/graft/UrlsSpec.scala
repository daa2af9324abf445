package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Urls

class UrlsSpec extends AnyFunSuite {

  test("canonicalize: lowercases scheme/host, strips www, port 80, fragment") {
    assert(Urls.canonicalize("HTTP://WWW.Example.COM:80/Path?q=1#frag")
      == "http://example.com/Path?q=1")
  }

  test("canonicalize: keeps non-default port, #! refs, userinfo") {
    assert(Urls.canonicalize("http://example.com:8080/a") == "http://example.com:8080/a")
    assert(Urls.canonicalize("http://example.com/a#!state") == "http://example.com/a#!state")
    assert(Urls.canonicalize("http://u:p@example.com/") == "http://u:p@example.com/")
  }

  test("canonicalize: www kept when host IS the root domain-less name") {
    // www.com: stripping would leave a bare TLD; reference keeps it
    assert(Urls.canonicalize("http://www.com/x") == "http://www.com/x")
  }

  test("canonicalize: strips path ;params and session ids") {
    assert(Urls.canonicalize("http://example.com/a;jsessionid=ABC123?x=1")
      == "http://example.com/a?x=1")
    assert(Urls.canonicalize(
      "http://example.com/cart?phpsessid=96bc0d2490b3ce6206d04c1ed7ccfb26&item=2")
      == "http://example.com/cart?item=2")
    assert(Urls.canonicalize("http://example.com/a?sid=deadbeefdeadbeef")
      == "http://example.com/a")
  }

  test("canonicalize: invalid URLs → null") {
    assert(Urls.canonicalize("not a url") == null)
    assert(Urls.canonicalize("") == null)
  }

  test("root domain: two-label default, multi-part public suffixes, IP/null") {
    assert(Urls.extractRootDomain("news.example.com") == "example.com")
    assert(Urls.extractRootDomain("a.b.example.co.uk") == "example.co.uk")
    assert(Urls.extractRootDomain("example.com") == "example.com")
    assert(Urls.extractRootDomain("localhost") == null)
    assert(Urls.extractRootDomain("192.168.0.1") == null)
  }

  test("canonicalize: golden vectors for the reference edge cases") {
    // Pinned behaviors for the identity layer everything keys on
    // (URLUtils.java:67-187 canonicalize table,
    // SessionIDURLNormalizer.java:58-66). A change to any of these
    // silently re-keys the whole crawl database.
    val vectors = Seq(
      // IP hosts: never www-stripped, no root domain to collapse to
      "http://192.168.0.1/x" -> "http://192.168.0.1/x",
      "http://10.0.0.1:8080/a" -> "http://10.0.0.1:8080/a",
      // userinfo survives canonicalization, www still stripped
      "http://u:p@www.example.com/" -> "http://u:p@example.com/",
      // nested www: one leading www. label stripped per pass
      "http://www.www.example.com/" -> "http://www.example.com/",
      // www kept when the host IS the root domain (bare TLD / suffix)
      "http://www.com/x" -> "http://www.com/x",
      "http://www.co.uk/x" -> "http://www.co.uk/x",
      // empty path, query-only URL
      "http://example.com" -> "http://example.com",
      "http://example.com?q=1" -> "http://example.com?q=1",
      // trailing-dot host, empty port
      "http://example.com./a" -> "http://example.com/a",
      "http://example.com:/a" -> "http://example.com/a",
      // ;params truncate the path at the first semicolon
      "http://example.com/a;b/c" -> "http://example.com/a",
      // session id as a path segment
      "http://example.com/x/jsessionid=0123456789abcdef" -> "http://example.com/x",
      // session params are case-insensitive; short non-hex sid kept
      "http://example.com/c?PHPSESSID=96bc0d2490b3ce6206d04c1ed7ccfb26&i=2" ->
        "http://example.com/c?i=2",
      "http://example.com/a?sid=abc" -> "http://example.com/a?sid=abc",
      // scheme lowercased, path case preserved
      "FTP://Example.COM/File" -> "ftp://example.com/File",
      // default port 80 dropped, other ports kept
      "https://www.example.com:80/" -> "https://example.com/",
      "http://example.com:443/a" -> "http://example.com:443/a",
    )
    vectors.foreach { case (in, want) =>
      assert(Urls.canonicalize(in) == want, s"canonicalize($in)")
    }
  }

  test("root domain: golden vectors for suffix and label edge cases") {
    val vectors = Seq(
      // case + trailing dot normalize before extraction
      "EXAMPLE.Com." -> "example.com",
      // empty label anywhere → invalid
      "a..com" -> null,
      // digits with letters is a name, not an IP
      "1.2.3.4.example.com" -> "example.com",
      // multi-part suffix needs a label to its left; a bare suffix is
      // its own registrable name here
      "b.example.com.au" -> "example.com.au",
      "com.au" -> "com.au",
      "www.co.uk" -> "www.co.uk",
      // userinfo-free plain hosts
      "news.example.com" -> "example.com",
    )
    vectors.foreach { case (in, want) =>
      assert(Urls.extractRootDomain(in) == want, s"extractRootDomain($in)")
    }
  }

  test("fingerprint: IP hosts hash the host as their root") {
    val fp = Urls.fingerprint("http://192.168.0.1/x").get
    assert(fp.rootDomainHash == fp.domainHash)
  }

  test("resolve: RFC 3986 reference resolution vectors") {
    val base = "http://a.example.com/b/c/d?q#f"
    val vectors: Seq[(String, String)] = Seq(
      // absolute and non-hierarchical refs pass through
      "http://other.com/x" -> "http://other.com/x",
      "mailto:x@y.com" -> "mailto:x@y.com",
      // RFC 3986 §5.4.1 normal examples
      "g" -> "http://a.example.com/b/c/g",
      "./g" -> "http://a.example.com/b/c/g",
      "g/" -> "http://a.example.com/b/c/g/",
      "/g" -> "http://a.example.com/g",
      "//g.com/h" -> "http://g.com/h",
      "?y" -> "http://a.example.com/b/c/d?y",
      "#s" -> "http://a.example.com/b/c/d?q#s",
      "" -> base,
      "../g" -> "http://a.example.com/b/g",
      "../../g" -> "http://a.example.com/g",
      // dot-segments can't climb above the root
      "../../../g" -> "http://a.example.com/g",
      "g?y#s" -> "http://a.example.com/b/c/g?y#s",
    )
    vectors.foreach { case (ref, want) =>
      assert(Urls.resolve(base, ref) == want, s"resolve($base, $ref)")
    }
    // base with no path: relative refs root at /
    assert(Urls.resolve("http://h.com", "x") == "http://h.com/x")
    assert(Urls.resolve("http://h.com", "?q") == "http://h.com/?q")
    // non-default port survives resolution
    assert(Urls.resolve("http://h.com:8080/a/b", "c") == "http://h.com:8080/a/c")
    // unparseable base: ref passes through untouched
    assert(Urls.resolve("garbage", "x/y") == "x/y")
  }

  test("fingerprint: stable, root/domain/url hashes distinct") {
    val fp1 = Urls.fingerprint("http://www.example.com/a").get
    val fp2 = Urls.fingerprint("http://example.com/a").get
    assert(fp1 == fp2) // www-strip makes them identical
    val fp3 = Urls.fingerprint("http://news.example.com/a").get
    assert(fp3.rootDomainHash == fp1.rootDomainHash)
    assert(fp3.domainHash != fp1.domainHash)
    assert(Urls.fingerprint("garbage").isEmpty)
  }
}
