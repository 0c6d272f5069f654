package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level cases for TextKernel.canonicalUrl — the URL-level dedup
  * normalizer (t32). Each rule gets a positive and a boundary case, plus
  * idempotence: canonicalizing a canonical URL is a no-op (the property
  * that makes incremental re-crawl dedup safe).
  */
class UrlCanonSpec extends AnyFunSuite {
  private def c(u: String) = TextKernel.canonicalUrl(u)

  test("scheme and host lowercase; path and query keep case") {
    assert(c("HTTPS://ExAmPle.COM/Path/File?Q=Value") ===
      "https://example.com/Path/File?Q=Value")
  }

  test("www. label stripped; non-leading www kept") {
    assert(c("https://www.example.com/a") === "https://example.com/a")
    assert(c("https://wwwx.example.com/a") === "https://wwwx.example.com/a")
    assert(c("https://sub.www.example.com/a") === "https://sub.www.example.com/a")
  }

  test("default port dropped only for the matching scheme") {
    assert(c("http://example.com:80/a") === "http://example.com/a")
    assert(c("https://example.com:443/a") === "https://example.com/a")
    assert(c("http://example.com:443/a") === "http://example.com:443/a")
    assert(c("https://example.com:8443/a") === "https://example.com:8443/a")
    assert(c("ftp://example.com:21/a") === "ftp://example.com:21/a")
  }

  test("fragment dropped") {
    assert(c("https://example.com/a#sec") === "https://example.com/a")
    assert(c("https://example.com/a?x=1#sec") === "https://example.com/a?x=1")
  }

  test("empty path becomes /; trailing slash stripped off non-root paths") {
    assert(c("https://example.com") === "https://example.com/")
    assert(c("https://example.com/") === "https://example.com/")
    assert(c("https://example.com/a/") === "https://example.com/a")
    assert(c("https://example.com/a/b/") === "https://example.com/a/b")
  }

  test("tracking params dropped, survivors sorted, empty query dropped") {
    assert(c("https://example.com/a?utm_source=x&b=2&a=1") ===
      "https://example.com/a?a=1&b=2")
    assert(c("https://example.com/a?b=2&a=1") === "https://example.com/a?a=1&b=2")
    assert(c("https://example.com/a?utm_campaign=x&gclid=1&fbclid=2&ref=h&mc_cid=3&mc_eid=4") ===
      "https://example.com/a")
    // bare tracking token (no '=') is still tracking; 'ref' only as the
    // whole name ('refresh=1' survives)
    assert(c("https://example.com/a?gclid&x=1") === "https://example.com/a?x=1")
    assert(c("https://example.com/a?refresh=1") === "https://example.com/a?refresh=1")
    assert(c("https://example.com/a?&&b=1&") === "https://example.com/a?b=1")
  }

  test("param sort is whole-token code-unit order (matches list_sort)") {
    assert(c("https://example.com/a?b=2&b=10&a=z") ===
      "https://example.com/a?a=z&b=10&b=2")
  }

  test("non-hierarchical inputs pass through trimmed") {
    assert(c("  mailto:a@b.c  ") === "mailto:a@b.c")
    assert(c("not a url") === "not a url")
  }

  test("host-only query (no path) still normalizes") {
    assert(c("HTTP://WWW.Example.com:80?b=1&utm_x=2") ===
      "http://example.com/?b=1")
  }

  test("idempotent on every case above") {
    val inputs = Seq(
      "HTTPS://ExAmPle.COM/Path/File?Q=Value",
      "https://www.example.com/a", "http://example.com:80/a",
      "https://example.com/a?utm_source=x&b=2&a=1#frag",
      "https://example.com/a/b/", "https://example.com",
      "HTTP://WWW.Example.com:80?b=1&utm_x=2", "mailto:a@b.c")
    for (u <- inputs) assert(c(c(u)) === c(u), s"not idempotent on $u")
  }
}
