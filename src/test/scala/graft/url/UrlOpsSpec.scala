package graft.url

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for [[UrlOps]], porting the assertion shapes of the reference
  * test suites: `spider/src/utils/abs.rs:148-328`,
  * `spider/src/utils/frontier.rs:286-354`, `spider/src/page.rs` scope tests,
  * `spider/src/utils/media_asset.rs:113-162`.
  */
class UrlOpsSpec extends AnyFunSuite {
  private def base(s: String) = UrlOps.parseCrawlBase(s).serialize

  // --- convert_abs_path vectors (abs.rs tests) ---

  test("basic join: root base + /subpage") {
    assert(UrlOps.convertAbsPath(base("https://example.com/path/"), "/subpage") == "https://example.com/subpage")
  }
  test("absolute href wins") {
    assert(UrlOps.convertAbsPath(base("https://example.com/path/"), "https://example.org/anotherpath")
      == "https://example.org/anotherpath")
  }
  test("empty href returns base") {
    assert(UrlOps.convertAbsPath(base("https://example.com/path/"), "") == "https://example.com/")
  }
  test("double dot resolves to root") {
    assert(UrlOps.convertAbsPath(base("https://example.com/path/"), "..") == "https://example.com/")
  }
  test("domain-like link treated as relative path (abs.rs test_domain_like_link)") {
    assert(UrlOps.convertAbsPath(base("https://www.example.com/path/"), "example.org/another-path")
      == "https://www.example.com/example.org/another-path")
  }
  test("mailto ignored, returns base (abs.rs test_no_invalid_protocols)") {
    assert(UrlOps.convertAbsPath(base("https://www.example.com"), "mailto:info@laminarpharma.com")
      == "https://www.example.com/")
  }
  test("query string preserved (abs.rs test_convert_abs_path_query_string)") {
    assert(UrlOps.convertAbsPath(base("https://example.com"), "/page?key=value&other=123")
      == "https://example.com/page?key=value&other=123")
  }
  test("fragment stripped (abs.rs test_convert_abs_path_fragment)") {
    assert(UrlOps.convertAbsPath(base("https://example.com"), "/page#section") == "https://example.com/page")
  }
  test("percent-encoded path preserved") {
    assert(UrlOps.convertAbsPath(base("https://example.com"), "/path%20with%20spaces").contains("path%20with%20spaces"))
  }
  test("port preserved (abs.rs test_convert_abs_path_port_number)") {
    val r = UrlOps.convertAbsPath(base("https://example.com:8080"), "/api/data")
    assert(r.contains(":8080") && r.contains("/api/data"))
  }
  test("non-ascii after colon does not throw (abs.rs regression)") {
    for (href <- Seq("ab:\u00e9\u00e9", "x:\u00e9y", "abc:\u4e2d\u6587", "ab:\ud83e\udd80de", "ab:\u00e9\u00e9/path"))
      UrlOps.convertAbsPath(base("https://example.com"), href) // must not throw
  }
  test("javascript:void(0); and # return base") {
    assert(UrlOps.convertAbsPath(base("https://example.com"), "#") == "https://example.com/")
    assert(UrlOps.convertAbsPath(base("https://example.com"), "javascript:void(0);") == "https://example.com/")
  }
  test("relative path resolves against page dir") {
    assert(UrlOps.convertAbsPath("https://example.com/a/b/page.html", "sub/x") == "https://example.com/a/b/sub/x")
    assert(UrlOps.convertAbsPath("https://example.com/a/b/page.html", "../up") == "https://example.com/a/up")
    assert(UrlOps.convertAbsPath("https://example.com/a/b/page.html", "./same") == "https://example.com/a/b/same")
  }
  test("scheme-relative // href") {
    assert(UrlOps.convertAbsPath("https://example.com/a", "//other.com/x") == "https://other.com/x")
  }
  test("uppercase-scheme absolute link resolves via join path") {
    assert(UrlOps.convertAbsPath(base("https://example.com"), "HTTP://Other.COM/X") == "http://other.com/X")
  }
  test("host lowercased, default port stripped, space encoded") {
    assert(UrlOps.convertAbsPath(base("https://example.com"), "https://EXAMPLE.com:443/A B") == "https://example.com/A%20B")
  }
  test("canonicalization is idempotent") {
    val once = UrlOps.convertAbsPath(base("https://example.com"), "/a/./b/../c d?x=1#f")
    val twice = UrlOps.convertAbsPath(once, once)
    assert(once == twice && once == "https://example.com/a/c%20d?x=1")
  }

  // --- host / path / root domain (frontier.rs, page.rs) ---

  test("host extraction strips port, empty without ://") {
    assert(UrlOps.host("https://sub.example.com:8080/p") == "sub.example.com")
    assert(UrlOps.host("https://example.com") == "example.com")
    assert(UrlOps.host("no-scheme/path") == "")
  }
  test("url_path shapes (frontier.rs url_path)") {
    assert(UrlOps.urlPath("https://example.com/a/b?q=1") == "/a/b")
    assert(UrlOps.urlPath("https://example.com") == "/")
    assert(UrlOps.urlPath("https://example.com/a#f") == "/a")
  }
  test("root domain: last two labels, not PSL (page.rs extract_root_domain)") {
    assert(UrlOps.rootDomain("sub.example.com") == "example.com")
    assert(UrlOps.rootDomain("example.com") == "example")
    assert(UrlOps.rootDomain("localhost") == "localhost")
    assert(UrlOps.rootDomain("a.b.co.uk") == "co.uk") // reference does NOT use a PSL
  }
  test("path depth mirrors rust split semantics (website.rs:2009-2028)") {
    assert(UrlOps.pathDepth("https://x.com") == 1) // "/" → [""] → 1
    assert(UrlOps.pathDepth("https://x.com/a") == 1)
    assert(UrlOps.pathDepth("https://x.com/a/b") == 2)
    assert(UrlOps.pathDepth("https://x.com/a/") == 2) // trailing slash → ["a",""]
  }

  // --- score_url (frontier.rs:163-185, tests 286-354) ---

  test("score: base minus depth, high/low value segments, clamped") {
    assert(UrlOps.scoreUrl("https://x.com/", 0) == 1000)
    assert(UrlOps.scoreUrl("https://x.com/", 3) == 700)
    assert(UrlOps.scoreUrl("https://x.com/product/1", 0) == 1050)
    assert(UrlOps.scoreUrl("https://x.com/legal/privacy", 0) == 600) // -200 twice
    assert(UrlOps.scoreUrl("https://x.com/legal", 20) == 0) // clamped at 0
    assert(UrlOps.scoreUrl("https://x.com/PRODUCT/ARTICLE", 0) == 1100) // case-insensitive
  }

  // --- media / ignored assets (media_asset.rs:113-162) ---

  test("media asset classification by extension") {
    assert(UrlOps.isMediaAssetUrl("https://x.com/a/pic.PNG"))
    assert(UrlOps.isMediaAssetUrl("https://x.com/v.mp4?x=1"))
    assert(!UrlOps.isMediaAssetUrl("https://x.com/page.html"))
    assert(!UrlOps.isMediaAssetUrl("https://x.com"))
    assert(UrlOps.isMediaAssetPath("/d/file.webp"))
    assert(!UrlOps.isMediaAssetPath("/d/file."))
  }
  test("ignored extension set covers frontier-blocking assets (page.rs:1994-2063)") {
    for (ext <- Seq("jpg", "pdf", "zip", "exe", "woff2", "sqlite"))
      assert(UrlOps.isIgnoredExtension(ext), ext)
    assert(!UrlOps.isIgnoredExtension("html"))
    assert(UrlOps.isIgnoredAssetUrl("https://x.com/file.pdf"))
    assert(!UrlOps.isIgnoredAssetUrl("https://x.com/file.x")) // needs >= 2 ext chars
    assert(!UrlOps.isIgnoredAssetUrl("https://x.com/page"))
  }

  // --- scope (page.rs:2966-2991) ---

  test("parent_host_match: exact, redirect, subdomain root match (page.rs pins 10856-10871)") {
    assert(UrlOps.parentHostMatch("example.com", "", "example.com", ""))
    assert(!UrlOps.parentHostMatch("sub.example.com", "", "example.com", ""))
    // Reference quirk, pinned by its own is_subdomain tests (page.rs:10867):
    // root("sub.example.com")="example.com" but root("example.com")="example"
    // → an apex seed does NOT root-match its subdomains.
    assert(!UrlOps.parentHostMatch("sub.example.com", "example.com", "example.com", ""))
    // …but sibling subdomains DO match (page.rs:10864).
    assert(UrlOps.parentHostMatch("b.example.com", "a.example.com", "a.example.com", ""))
    // …and sibling TLDs of an apex match in tld/subdomain mode (page.rs:10860).
    assert(UrlOps.parentHostMatch("example.org", "example.com", "example.com", ""))
    assert(UrlOps.parentHostMatch("redirected.org", "", "example.com", "redirected.org"))
    assert(!UrlOps.parentHostMatch("other.org", "example.com", "example.com", ""))
  }

  test("validateLink: scope + scheme coercion + asset filter (page.rs push_link)") {
    val v = UrlOps.validateLink(
      pageUrl = "https://example.com/a/page.html", crawlBase = "https://example.com/",
      baseHref = null, href = "/next", subMatcher = "", parentHost = "example.com",
      parentScheme = "https", redirectHost = "", externalDomains = Set.empty, fullResources = false)
    assert(v == "https://example.com/next")
    // http link on https crawl → coerced to https (page.rs:2844-2848)
    val v2 = UrlOps.validateLink("https://example.com/", "https://example.com/", null,
      "http://example.com/x", "", "example.com", "https", "", Set.empty, false)
    assert(v2 == "https://example.com/x")
    // out-of-scope host dropped
    val v3 = UrlOps.validateLink("https://example.com/", "https://example.com/", null,
      "https://other.org/x", "", "example.com", "https", "", Set.empty, false)
    assert(v3 == null)
    // external domain allow-list
    val v4 = UrlOps.validateLink("https://example.com/", "https://example.com/", null,
      "https://other.org/x", "", "example.com", "https", "", Set("other.org"), false)
    assert(v4 == "https://other.org/x")
    // wildcard external
    val v5 = UrlOps.validateLink("https://example.com/", "https://example.com/", null,
      "https://anything.net/x", "", "example.com", "https", "", Set("*"), false)
    assert(v5 == "https://anything.net/x")
    // asset link filtered unless full_resources (page.rs:2902-2929)
    val v6 = UrlOps.validateLink("https://example.com/", "https://example.com/", null,
      "/big.zip", "", "example.com", "https", "", Set.empty, false)
    assert(v6 == null)
    val v7 = UrlOps.validateLink("https://example.com/", "https://example.com/", null,
      "/big.zip", "", "example.com", "https", "", Set.empty, true)
    assert(v7 == "https://example.com/big.zip")
    // mailto → early return → resolves to the PAGE url (relative_directory_url
    // routes non-"/" hrefs to original_page) — already visited, so net drop
    val v8 = UrlOps.validateLink("https://example.com/p", "https://example.com/", null,
      "mailto:x@y.z", "", "example.com", "https", "", Set.empty, false)
    assert(v8 == "https://example.com/p")
    // <base href> override wins (page.rs:4261-4271)
    val v9 = UrlOps.validateLink("https://example.com/a/b", "https://example.com/", "https://example.com/cdn/",
      "img1", "", "example.com", "https", "", Set.empty, false)
    assert(v9 == "https://example.com/cdn/img1")
  }

  test("validateLink fast path is bit-identical to the slow chain") {
    val hosts = Seq("www.site0.com", "sub.site0.com", "other.org", "www.site0.com:8080")
    val paths = Seq("/a/b.html", "/", "/p1", "/x/y/z.png", "/deep/p.pdf", "/q?x=1",
      "/has%20esc", "/dot/./seg", "/../up", "/end/", "/UPPER/Case.html", "/v1.2/file")
    val hrefs =
      paths ++
        (for (h <- hosts; p <- paths.take(6)) yield s"https://$h$p") ++
        Seq("http://www.site0.com/x", "https://WWW.SITE0.COM/x", "//www.site0.com/y",
          "rel/path", "../up", "mailto:a@b.c", "", "#", "https://www.site0.com:443/x",
          "https://www.site0.com", "javascript:void(0);")
    val scopes = Seq(
      ("", "www.site0.com", "https", "", Set.empty[String]),
      ("www.site0.com", "www.site0.com", "https", "", Set.empty[String]),
      ("", "www.site0.com", "http", "redir.org", Set("other.org")),
      ("", "www.site0.com", "https", "", Set("*")))
    var checked = 0
    for {
      (sm, ph, ps, rh, ext) <- scopes
      pageUrl <- Seq("https://www.site0.com/a/page.html", "https://www.site0.com:8080/a/b")
      full <- Seq(false, true)
      href <- hrefs
    } {
      val crawlBase = UrlOps.parseCrawlBase(pageUrl).serialize
      val fast = UrlOps.validateLink(pageUrl, crawlBase, null, href, sm, ph, ps, rh, ext, full)
      val slow = UrlOps.validateLinkSlow(pageUrl, crawlBase, null, href.trim, sm, ph, ps, rh, ext, full)
      assert(fast == slow, s"mismatch href=$href page=$pageUrl scope=($sm,$ph,$ps,$rh,$ext,$full): fast=$fast slow=$slow")
      checked += 1
    }
    assert(checked > 500)
  }

  test("budget segments mirror joint_segment accumulation (website.rs:2051-2121)") {
    assert(UrlOps.budgetSegments("https://x.com/en/fr").toSeq == Seq("en", "fr"))
    assert(UrlOps.budgetSegments("https://x.com/").toSeq == Seq(""))
    assert(UrlOps.budgetSegments("https://x.com").toSeq == Seq(""))
    assert(UrlOps.budgetSegments("https://x.com/a/").toSeq == Seq("a", ""))
  }
}
