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
