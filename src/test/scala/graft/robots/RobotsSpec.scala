package graft.robots

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the robots parser port (reference
  * `spider/src/packages/robotparser/parser.rs` semantics, incl. quirks).
  */
class RobotsSpec extends AnyFunSuite {

  val basic = Robots.parse(
    """User-agent: *
      |Disallow: /private/
      |Disallow: /exact
      |Allow: /private/open/
      |Crawl-delay: 2.5
      |""".stripMargin)

  test("wildcard entry becomes default; prefix rules with trailing slash") {
    assert(!basic.canFetch("anybot", "https://x.com/private/a"))
    assert(!basic.canFetch("anybot", "/private/deep/nested"))
    assert(basic.canFetch("anybot", "/public"))
  }

  test("first matching rule wins (Allow listed after Disallow loses)") {
    // reference allowance(): FIRST match decides — /private/ comes first
    assert(!basic.canFetch("anybot", "/private/open/x"))
  }

  test("bare path rule is EXACT match, not prefix (parser.rs applies_to quirk)") {
    assert(!basic.canFetch("anybot", "/exact"))
    assert(basic.canFetch("anybot", "/exact/sub")) // NOT blocked — reference quirk
    assert(basic.canFetch("anybot", "/exactly"))
  }

  test("trailing-star rule prefix-matches") {
    val p = Robots.parse("User-agent: *\nDisallow: /tmp*\n")
    assert(!p.canFetch("bot", "/tmp"))
    assert(!p.canFetch("bot", "/tmpfiles/x"))
    assert(p.canFetch("bot", "/tm"))
  }

  test("star rule matches everything") {
    val p = Robots.parse("User-agent: *\nDisallow: *\n")
    assert(!p.canFetch("bot", "/anything"))
  }

  test("empty Disallow is an allow-all rule (RuleLine::new)") {
    val p = Robots.parse("User-agent: *\nDisallow:\n")
    assert(p.canFetch("bot", "/anything"))
  }

  test("per-UA entry: lowercase + version-strip + substring containment") {
    val p = Robots.parse(
      """User-agent: BadBot
        |Allow: /vip/
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /vip/
        |""".stripMargin)
    // Reference can_fetch quirk (parser.rs:571-596): a UA entry can only
    // ALLOW (override the default); its Disallow falls through to the
    // default entry. Blocking is effectively the `*` entry's job.
    assert(p.canFetch("BadBot/1.2", "/vip/x")) // UA entry allows → allowed
    assert(p.canFetch("SuperBadBotXL/9", "/vip/x")) // containment: "superbadbotxl".contains("badbot")
    assert(!p.canFetch("GoodBot", "/vip/x")) // no UA entry → default blocks
    assert(p.canFetch("BadBot/1.2", "/home")) // UA Disallow / → falls to default → allowed (quirk)
  }

  test("UA entry denied still consults default entry (can_fetch quirk)") {
    // entry_allowed returns false both for "no entry" and "entry denied";
    // can_fetch then falls through to the default entry (parser.rs:571-596)
    val p = Robots.parse(
      """User-agent: SpecificBot
        |Disallow: /blocked/
        |
        |User-agent: *
        |Allow: /blocked/
        |Disallow: /other/
        |""".stripMargin)
    // SpecificBot denied on /blocked/ BUT default entry allows it → allowed
    assert(p.canFetch("specificbot", "/blocked/x"))
  }

  test("first default entry wins; duplicates ignored (_add_entry)") {
    val p = Robots.parse(
      """User-agent: *
        |Disallow: /a/
        |
        |User-agent: *
        |Disallow: /b/
        |""".stripMargin)
    assert(!p.canFetch("bot", "/a/x"))
    assert(p.canFetch("bot", "/b/x")) // second default entry dropped
  }

  test("crawl delay parsed as float seconds; request-rate n/m") {
    assert(basic.crawlDelayMs("anybot").contains(2500L))
    val p = Robots.parse("User-agent: *\nRequest-rate: 3/7\nDisallow: /x/\n")
    assert(p.defaultEntry.reqRate.contains((3, 7)))
  }

  test("status mapping: 401/403 disallow_all, other 4xx allow_all, 5xx no entries") {
    assert(!Robots.fromFetch(403, "").canFetch("bot", "/"))
    assert(!Robots.fromFetch(401, "").canFetch("bot", "/"))
    assert(Robots.fromFetch(404, "").canFetch("bot", "/anything"))
    assert(Robots.fromFetch(500, "").canFetch("bot", "/anything")) // empty default → allowed
  }

  test("comments and percent-encoding handled") {
    val p = Robots.parse("User-agent: * # all bots\nDisallow: /a%20b/ # encoded\n")
    assert(!p.canFetch("bot", "/a b/x"))
  }

  test("extract_path strips scheme+host and query") {
    assert(Robots.extractPath("https://x.com/a/b?q=1") == "/a/b")
    assert(Robots.extractPath("http://x.com") == "/")
    assert(Robots.extractPath("/rel/path") == "/rel/path")
  }
}
