package graft.robots

/** robots.txt parser — a faithful port of the reference's semantics
  * (spider-rs/spider `spider/src/packages/robotparser/parser.rs`, default
  * non-regex build):
  *
  *  - parse state machine (states 0/1/2), `#` comments, percent-decoded
  *    values (`parser.rs:416-520`)
  *  - entries with `*` in their user-agents become the single default entry,
  *    FIRST one wins (`_add_entry` `parser.rs:383-393`)
  *  - rule matching `applies_to` (`parser.rs:137-148`): `*` matches all;
  *    `path/` prefix-matches; `path*` prefix-matches; otherwise EXACT match
  *    (a bare `Disallow: /foo` does NOT block `/foo/bar` — reference quirk)
  *  - empty Disallow value ⇒ allow-all rule (`RuleLine::new` `parser.rs:125-130`)
  *  - first matching rule line wins; no rule ⇒ allowed (`allowance`
  *    `parser.rs:195-204`)
  *  - UA matching: lowercased, version-stripped at '/', substring
  *    containment (`parser.rs:168-185`)
  *  - `can_fetch` (`parser.rs:571-596`): allow_all ⇒ true; not-read or
  *    disallow_all ⇒ false; first UA-matching entry decides; **if that
  *    entry disallows, the default entry is STILL consulted** (reference
  *    conflates "no entry matched" with "entry denied" — mirrored);
  *    no entry ⇒ default entry ⇒ allowed
  *  - HTTP status mapping (`read` `parser.rs:341-368`): 401/403 ⇒
  *    disallow_all; other 4xx ⇒ allow_all; 200 ⇒ parse; others ⇒ no entries
  *    (⇒ everything allowed through the empty default)
  *  - `Crawl-delay` (float seconds) and `Request-rate n/m` directives
  *    (`parser.rs:485-520`); crawl delay clamped to ≤60s by the engine
  *    (`website.rs:2524-2528`)
  */
object Robots {

  final case class RuleLine(path: String, allowance: Boolean)

  final case class Entry(
      useragents: Vector[String],
      rulelines: Vector[RuleLine],
      crawlDelayMs: Option[Long],
      reqRate: Option[(Int, Int)]) {

    def isEmpty: Boolean = useragents.isEmpty && rulelines.isEmpty
    def hasWildcardAgent: Boolean = useragents.contains("*")

    /** `ua` must be pre-prepared (lowercased, version-stripped). */
    def appliesToPrepared(ua: String): Boolean =
      useragents.exists(a => a == "*" || ua.contains(a))

    /** First matching rule wins; none ⇒ allowed. `path` is the URL path. */
    def allowance(path: String): Boolean = {
      rulelines.foreach { line =>
        if (ruleApplies(line.path, path)) return line.allowance
      }
      true
    }
  }

  private val EmptyEntry = Entry(Vector.empty, Vector.empty, None, None)

  /** Reference `RuleLine::applies_to` (`parser.rs:137-148`). */
  def ruleApplies(rulePath: String, pathname: String): Boolean = {
    if (rulePath == "*") true
    else if (rulePath.endsWith("/") && pathname.startsWith(rulePath)) true
    else if (rulePath.endsWith("*") && pathname.startsWith(rulePath.dropRight(1))) true
    else pathname == rulePath
  }

  /** Parsed robots policy for one host. */
  final case class Policy(
      entries: Vector[Entry],
      defaultEntry: Entry,
      disallowAll: Boolean,
      allowAll: Boolean,
      read: Boolean) {

    /** Reference `Entry::prepare_useragent` (`parser.rs:168-175`). */
    private def prepareUa(ua: String): String = {
      val slash = ua.indexOf('/')
      (if (slash < 0) ua else ua.substring(0, slash)).toLowerCase(java.util.Locale.ROOT)
    }

    /** Reference `can_fetch` (`parser.rs:571-596`). `url` may be a full URL
      * or a path.
      */
    def canFetch(userAgent: String, url: String): Boolean = {
      if (allowAll) true
      else if (!read || disallowAll) false
      else {
        val path = extractPath(url)
        val ua = prepareUa(userAgent)
        val matched = entries.find(_.appliesToPrepared(ua))
        val entryAllowed = matched.exists(_.allowance(path))
        if (entryAllowed) true
        else if (!defaultEntry.isEmpty) defaultEntry.allowance(path)
        else true
      }
    }

    /** Reference `get_crawl_delay` (`parser.rs:624-652`). Millis. */
    def crawlDelayMs(userAgent: String): Option[Long] = {
      if (!read) return None
      val ua = prepareUa(userAgent)
      entries.find(_.appliesToPrepared(ua)) match {
        case Some(e) => e.crawlDelayMs
        case None => if (!defaultEntry.isEmpty) defaultEntry.crawlDelayMs else None
      }
    }

    /** `Request-rate: n/m` as an inter-request delay of m*1000/n ms —
    * the reference wires it into the rate limiter via `set_rate`
    * (`rate_limiter.rs:142-153`); round 1 parsed but never enforced it.
    */
    def requestRateDelayMs(userAgent: String): Option[Long] = {
      if (!read) return None
      val ua = prepareUa(userAgent)
      val entry = entries.find(_.appliesToPrepared(ua))
        .orElse(if (!defaultEntry.isEmpty) Some(defaultEntry) else None)
      entry.flatMap(_.reqRate).collect { case (n, m) if n > 0 => (m * 1000L) / n }
    }
  }

  val AllowAllPolicy: Policy = Policy(Vector.empty, EmptyEntry, disallowAll = false, allowAll = false, read = true)

  /** Reference `extract_path` (`parser.rs:253-276`): path incl. leading '/',
    * query stripped (fragment NOT handled — callers strip it earlier).
    */
  def extractPath(url: String): String = {
    if (url.isEmpty) return "/"
    val prefix =
      if (url.startsWith("https://")) 8
      else if (url.startsWith("http://")) 7
      else 0
    val slash = url.indexOf('/', prefix)
    if (slash < 0) "/"
    else {
      val q = url.indexOf('?', slash)
      if (q < 0) url.substring(slash) else url.substring(slash, q)
    }
  }

  private def percentDecode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi >= 0 && lo >= 0) { out.write((hi << 4) | lo); i += 3 }
        else { out.write(c.toInt); i += 1 }
      } else {
        val bytes = c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write(bytes, 0, bytes.length); i += 1
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parse robots.txt text (reference `parse` `parser.rs:416-520`). */
  def parse(text: String): Policy = {
    var entries = Vector.empty[Entry]
    var defaultEntry = EmptyEntry

    def addEntry(e: Entry): Unit =
      if (e.hasWildcardAgent) { if (defaultEntry.isEmpty) defaultEntry = e }
      else entries :+= e

    var state = 0
    var uas = Vector.empty[String]
    var rules = Vector.empty[RuleLine]
    var delay: Option[Long] = None
    var rate: Option[(Int, Int)] = None

    def cur = Entry(uas, rules, delay, rate)
    def reset(): Unit = { uas = Vector.empty; rules = Vector.empty; delay = None; rate = None }

    val lines = text.split("\n", -1)
    for (raw <- lines) {
      var ln = raw
      if (ln.isEmpty) {
        if (state == 1) { reset(); state = 0 }
        else if (state == 2) { addEntry(cur); reset(); state = 0 }
      }
      val hash = ln.indexOf('#')
      if (hash >= 0) ln = ln.substring(0, hash)
      ln = ln.trim
      if (ln.nonEmpty) {
        val colon = ln.indexOf(':')
        if (colon >= 0) {
          val key = ln.substring(0, colon).trim
          val value = percentDecode(ln.substring(colon + 1).trim)
          if (key.equalsIgnoreCase("user-agent")) {
            if (state == 2) { addEntry(cur); reset() }
            uas :+= value.toLowerCase(java.util.Locale.ROOT)
            state = 1
          } else if (key.equalsIgnoreCase("disallow")) {
            if (state != 0) {
              // empty Disallow ⇒ allowance=true rule (parser.rs:125-130)
              rules :+= RuleLine(value, allowance = value.isEmpty)
              state = 2
            }
          } else if (key.equalsIgnoreCase("allow")) {
            if (state != 0) { rules :+= RuleLine(value, allowance = true); state = 2 }
          } else if (key.equalsIgnoreCase("crawl-delay")) {
            if (state != 0) {
              try {
                val d = value.toDouble
                if (d >= 0.0 && !d.isInfinite && !d.isNaN) delay = Some((d * 1000.0).toLong)
              } catch { case _: NumberFormatException => }
              state = 2
            }
          } else if (key.equalsIgnoreCase("sitemap")) {
            if (state != 0) state = 2
          } else if (key.equalsIgnoreCase("request-rate")) {
            if (state != 0) {
              val parts = value.split("/")
              if (parts.length == 2)
                try { rate = Some((parts(0).trim.toInt, parts(1).trim.toInt)) }
                catch { case _: NumberFormatException => }
              state = 2
            }
          }
        }
      }
    }
    if (state == 2) addEntry(cur)
    Policy(entries, defaultEntry, disallowAll = false, allowAll = false, read = true)
  }

  /** Reference `read` status handling (`parser.rs:341-368`): build the
    * per-host policy from a fetch result.
    */
  def fromFetch(status: Int, text: String): Policy = status match {
    case 401 | 403 => Policy(Vector.empty, EmptyEntry, disallowAll = true, allowAll = false, read = true)
    case s if s >= 400 && s < 500 => Policy(Vector.empty, EmptyEntry, disallowAll = false, allowAll = true, read = true)
    case 200 => if (text == null || text.isEmpty) AllowAllPolicy else parse(text)
    case _ => Policy(Vector.empty, EmptyEntry, disallowAll = false, allowAll = false, read = true)
  }
}
