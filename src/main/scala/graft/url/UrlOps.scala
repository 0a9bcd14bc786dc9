package graft.url

import org.apache.spark.unsafe.types.UTF8String

/** Pure URL functions of the crawl engine.
  *
  * Re-implements the reference's URL pipeline semantics
  * (spider-rs/spider):
  *  - `convert_abs_path` / `handle_base` — `spider/src/utils/abs.rs:80-146`
  *  - `parse_absolute_url` (root-cleared crawl base) — `abs.rs:36-45`
  *  - `extract_domain` / `url_path` / `score_url` — `spider/src/utils/frontier.rs:163-242`
  *  - `extract_root_domain` (last-two-labels, NOT a public-suffix list) —
  *    `spider/src/page.rs:2939-2955`
  *  - `get_path_from_url` — `spider/src/utils/mod.rs:9156-9169`
  *  - `is_media_asset_path` — `spider/src/utils/media_asset.rs:72-111`
  *  - `is_ignored_extension` — `spider/src/page.rs:1994-2063`
  *  - `relative_directory_url` / `networking_capable` — `page.rs:2803-2815`,
  *    `utils/mod.rs:9191-9197`
  *
  * The RFC 3986 / WHATWG resolution behavior of the Rust `url` crate is
  * reproduced for the http(s) subset the crawler cares about: lowercased
  * scheme/host, default-port stripping, dot-segment removal, empty path →
  * "/", percent-encoding of disallowed bytes, fragment stripping by the
  * caller. All functions are deterministic and allocation-light so they are
  * safe inside Catalyst expressions.
  */
object UrlOps {

  /** Parsed absolute URL. `port == -1` means none/default; `query == null`
    * means absent. `path` always starts with "/" (or is "/").
    */
  final case class Parsed(scheme: String, host: String, port: Int, path: String, query: String) {
    def serialize: String = {
      val sb = new java.lang.StringBuilder(scheme.length + host.length + path.length + 16)
      sb.append(scheme).append("://").append(host)
      if (port >= 0) sb.append(':').append(port)
      sb.append(path)
      if (query != null) sb.append('?').append(query)
      sb.toString
    }
  }

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21)

  /** Schemes the crawler can transfer over (reference `abs.rs:5-10`). */
  private val Protocols = Set("http", "https", "ftp", "ws")

  /** Protocols ignored for crawling (reference `abs.rs:13-27`). */
  private val IgnoredProtocols = Set(
    "file", "sms", "javascript", "data", "whatsapp", "geo", "skype",
    "ssh", "zoommtg", "market", "intent", "mailto", "tel")

  // -------------------------------------------------------------------
  // Percent-encoding (WHATWG path / query percent-encode sets, the
  // behavior of the Rust `url` crate used by the reference).
  // -------------------------------------------------------------------

  private def isPathByteAllowed(b: Int): Boolean =
    b > 0x20 && b < 0x7f && b != '"' && b != '<' && b != '>' && b != '`' &&
      b != '{' && b != '}' && b != '?' && b != '#'

  private def isQueryByteAllowed(b: Int): Boolean =
    b > 0x20 && b < 0x7f && b != '"' && b != '<' && b != '>' && b != '#'

  private val Hex = "0123456789ABCDEF"

  private def percentEncode(s: String, allowed: Int => Boolean): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) { if (s.charAt(i) > 0x7e || !allowed(s.charAt(i))) needs = true; i += 1 }
    if (!needs) return s
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    var j = 0
    while (j < bytes.length) {
      val b = bytes(j) & 0xff
      if (b < 0x80 && allowed(b)) sb.append(b.toChar)
      else sb.append('%').append(Hex.charAt(b >> 4)).append(Hex.charAt(b & 0xf))
      j += 1
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. Input starts with "/". */
  private[url] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = path.length
    while (i < n) {
      val next = path.indexOf('/', i + 1)
      val end = if (next < 0) n else next
      val seg = path.substring(i, end) // includes leading '/'
      seg match {
        case "/." | "/" if end < n => // skip "." segment (and collapse nothing: "/" only occurs as seg for "//")
          if (seg == "/") out += "/"
        case "/." => out += "/" // trailing "/." → "/"
        case "/.." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (end >= n) out += "/" // trailing "/.." leaves a "/"
        case _ => out += seg
      }
      i = end
    }
    val r = out.mkString
    if (r.isEmpty) "/" else r
  }

  /** Strip the fragment ("#..." suffix) if present. */
  private def stripFragment(s: String): String = {
    val h = s.indexOf('#')
    if (h < 0) s else s.substring(0, h)
  }

  /** Parse an absolute hierarchical URL ("scheme://authority/path?query").
    * Returns null on failure. Fragment is dropped.
    */
  def parse(input0: String): Parsed = {
    if (input0 == null) return null
    val input = stripFragment(input0.trim)
    val schemeEnd = input.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = input.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return null
    var rest = input.substring(schemeEnd + 3)
    // authority ends at first '/', '?' (no '#': already stripped)
    var authEnd = rest.length
    var k = 0
    var brk = false
    while (k < rest.length && !brk) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?') { authEnd = k; brk = true }
      k += 1
    }
    var authority = rest.substring(0, authEnd)
    rest = rest.substring(authEnd)
    // drop userinfo
    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1)
    if (authority.isEmpty) return null
    // host[:port]
    var host = authority
    var port = -1
    val colon = authority.lastIndexOf(':')
    if (colon >= 0) {
      val portStr = authority.substring(colon + 1)
      if (portStr.nonEmpty && portStr.forall(_.isDigit)) {
        host = authority.substring(0, colon)
        try { port = portStr.toInt } catch { case _: NumberFormatException => return null }
        if (port > 65535) return null
        if (DefaultPorts.get(scheme).contains(port)) port = -1
      } else if (portStr.isEmpty) {
        host = authority.substring(0, colon) // "host:" — empty port = none
      }
    }
    if (host.isEmpty) return null
    host = host.toLowerCase(java.util.Locale.ROOT)
    // split path / query
    var path = rest
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { path = rest.substring(0, q); query = rest.substring(q + 1) }
    if (path.isEmpty) path = "/"
    path = percentEncode(removeDotSegments(path), isPathByteAllowed)
    if (query != null) query = percentEncode(query, isQueryByteAllowed)
    Parsed(scheme, host, port, path, query)
  }

  /** Reference `parse_absolute_url` (`abs.rs:36-45`): parse then CLEAR the
    * path and query — the crawl base is always the root. Returns null on
    * failure.
    */
  def parseCrawlBase(url: String): Parsed = {
    val p = parse(url)
    if (p == null) null else p.copy(path = "/", query = null)
  }

  /** RFC 3986 §5.2 relative resolution against a parsed base. `ref0` must
    * not be an absolute URL with scheme (callers route those through
    * `parse`). Fragment of the ref is stripped.
    */
  private def resolveRelative(base: Parsed, ref0: String): Parsed = {
    val ref = stripFragment(ref0)
    if (ref.isEmpty) return base
    if (ref.startsWith("//")) {
      // network-path reference: keep scheme
      val p = parse(base.scheme + ":" + ref)
      return if (p == null) base else p
    }
    if (ref.charAt(0) == '/') {
      // absolute-path reference
      var path = ref
      var query: String = null
      val q = ref.indexOf('?')
      if (q >= 0) { path = ref.substring(0, q); query = ref.substring(q + 1) }
      return base.copy(
        path = percentEncode(removeDotSegments(path), isPathByteAllowed),
        query = if (query == null) null else percentEncode(query, isQueryByteAllowed))
    }
    if (ref.charAt(0) == '?') {
      return base.copy(query = percentEncode(ref.substring(1), isQueryByteAllowed))
    }
    // relative-path reference: merge with base path directory
    var rpath = ref
    var query: String = null
    val q = ref.indexOf('?')
    if (q >= 0) { rpath = ref.substring(0, q); query = ref.substring(q + 1) }
    val baseDir = {
      val slash = base.path.lastIndexOf('/')
      if (slash < 0) "/" else base.path.substring(0, slash + 1)
    }
    base.copy(
      path = percentEncode(removeDotSegments(baseDir + rpath), isPathByteAllowed),
      query = if (query == null) null else percentEncode(query, isQueryByteAllowed))
  }

  /** Reference `handle_base` (`abs.rs:80-120`) outcome. */
  private val EARLY = 0; private val EMPTY = 1 // ABSOLUTE handled inline

  private def handleBase(href: String): Either[Int, Parsed] = {
    if (href.isEmpty || href == "#" || href == "javascript:void(0);") return Left(EARLY)
    if (!href.startsWith("/")) {
      val colon = href.indexOf(':')
      if (colon >= 0) {
        val proto = href.substring(0, colon)
        if (IgnoredProtocols.contains(proto)) return Left(EARLY)
        if (Protocols.contains(proto) && href.regionMatches(colon + 1, "//", 0, 2)) {
          val p = parse(href)
          if (p != null) return Right(p)
        }
      }
    }
    Left(EMPTY)
  }

  /** Reference `convert_abs_path` (`abs.rs:125-146`): resolve `href` against
    * `base`. Early-return shapes (empty, "#", ignored protocols,
    * unparseable) yield the base itself — in the crawl that base is already
    * visited, so the net effect is "dropped". Absolute URLs with a scheme
    * not in the crawlable set resolve through the join path and are later
    * dropped by the scheme filter of `validateLink`.
    *
    * Returns the canonical absolute URL string, or null when `base` itself
    * does not parse.
    */
  def convertAbsPath(baseStr: String, href0: String): String = {
    if (baseStr == null || href0 == null) return null
    val base = parse(baseStr)
    if (base == null) return null
    val href = href0.trim
    if (baseStr == href) return base.serialize
    handleBase(href) match {
      case Right(abs)  => abs.serialize
      case Left(EARLY) => base.serialize
      case _ =>
        // join path. An href with its own scheme (e.g. "HTTP://x", "foo:bar")
        // resolves absolutely per RFC 3986; hierarchical crawlable schemes
        // parse, opaque ones serialize as "scheme:rest" and die at the
        // scheme filter.
        val colon = href.indexOf(':')
        val hasScheme = colon > 0 && href.substring(0, colon).forall(c =>
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') &&
          (href.charAt(0).isLetter)
        if (hasScheme && !href.startsWith("/")) {
          val p = parse(href)
          if (p != null) p.serialize
          else stripFragment(href) // opaque non-hierarchical URL; dropped downstream
        } else {
          resolveRelative(base, href).serialize
        }
    }
  }

  /** Reference `relative_directory_url` (`page.rs:2803-2815`): true when the
    * href should resolve against the full page URL rather than the crawl
    * root base.
    */
  def relativeDirectoryUrl(href: String): Boolean = {
    if (href.startsWith("./") || href.startsWith("//") || href.startsWith("../")) true
    else if (networkingCapable(href)) false
    else !href.startsWith("/")
  }

  /** Reference `networking_capable` (`utils/mod.rs:9191-9197`). */
  def networkingCapable(url: String): Boolean =
    url.startsWith("https://") || url.startsWith("http://") ||
      url.startsWith("file://") || url.startsWith("ftp://")

  // -------------------------------------------------------------------
  // Host / path helpers (frontier.rs / mod.rs / page.rs ports)
  // -------------------------------------------------------------------

  /** Reference `extract_domain` (`frontier.rs:189-202`): host of a URL,
    * port stripped; empty string when there is no "://".
    */
  def host(url: String): String = {
    if (url == null) return ""
    val start = url.indexOf("://")
    if (start < 0) return ""
    val after = start + 3
    val slash = url.indexOf('/', after)
    val end = if (slash < 0) url.length else slash
    val auth = url.substring(after, end)
    val colon = auth.indexOf(':')
    if (colon < 0) auth else auth.substring(0, colon)
  }

  /** Reference `url_path` (`frontier.rs:205-222`): path between authority
    * and '?' (then '#'). Returns "/" when the URL has no path, and the
    * input itself when there is no "://" (reference quirk).
    */
  def urlPath(url: String): String = {
    if (url == null) return null
    val start = url.indexOf("://")
    if (start < 0) return url
    val after = start + 3
    val slash = url.indexOf('/', after)
    if (slash < 0) return "/"
    val remaining = url.substring(slash)
    val q = remaining.indexOf('?')
    val end = if (q >= 0) q else { val h = remaining.indexOf('#'); if (h >= 0) h else remaining.length }
    remaining.substring(0, end)
  }

  /** Reference `get_path_from_url` (`utils/mod.rs:9156-9169`): path from the
    * first '/' after "//"; "/" when absent. (Query is NOT stripped here —
    * mirrors the reference, which feeds this to the budget/depth walk.)
    */
  def getPathFromUrl(url: String): String = {
    if (url == null) return "/"
    val dd = url.indexOf("//")
    if (dd < 0) return "/"
    val slash = url.indexOf('/', dd + 2)
    if (slash < 0) "/" else url.substring(slash)
  }

  /** Reference `extract_root_domain` (`page.rs:2939-2955`): last two labels;
    * "example.com" → "example"; "localhost" → "localhost". NOT a PSL.
    */
  def rootDomain(domain: String): String = {
    if (domain == null) return null
    val last = domain.lastIndexOf('.')
    if (last < 0) return domain
    val second = domain.lastIndexOf('.', last - 1)
    if (second >= 0) domain.substring(second + 1) else domain.substring(0, last)
  }

  /** Path segments for the depth/budget walk
    * (`is_over_inner_depth_budget` `website.rs:2009-2028`): the path minus
    * its leading '/', split on '/', INCLUDING empty segments (Rust
    * `"".split('/')` yields one empty item — so "/" has depth 1).
    */
  def budgetSegments(url: String): Array[String] = {
    val path = getPathFromUrl(url)
    val stripped = if (path.startsWith("/")) path.substring(1) else return Array.empty
    // Rust split('/') on "" yields [""]; on "a/" yields ["a",""].
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    var start = 0
    while (i <= stripped.length) {
      if (i == stripped.length || stripped.charAt(i) == '/') {
        out += stripped.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** URL path depth per the reference's depth budget (segment count). */
  def pathDepth(url: String): Int = budgetSegments(url).length

  /** Accumulated budget-key prefixes (`joint_segment.push_str(seg)`,
    * `website.rs:2085-2115`): segments concatenated WITHOUT separator.
    */
  def budgetPrefixesUtf8(url: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val segs = budgetSegments(url.toString)
    val out = new Array[Any](segs.length)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < segs.length) {
      sb.append(segs(i))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // -------------------------------------------------------------------
  // Scoring (frontier.rs:152-185)
  // -------------------------------------------------------------------

  private val HighValue = Array("product", "article", "item", "page")
  private val LowValue = Array("legal", "privacy", "terms", "cookie", "disclaimer")

  private def containsIgnoreAsciiCase(hay: String, needle: String): Boolean = {
    val hn = hay.length; val nn = needle.length
    if (nn > hn) return false
    var i = 0
    while (i <= hn - nn) {
      var j = 0
      var ok = true
      while (j < nn && ok) {
        val h = hay.charAt(i + j); val n = needle.charAt(j)
        if (Character.toLowerCase(h) != Character.toLowerCase(n)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** Reference `score_url` (`frontier.rs:163-185`): base 1000 − 100·depth,
    * +50 per high-value path segment, −200 per low-value, clamped [0,2000].
    */
  def scoreUrl(url: String, depth: Int): Int = {
    val base = 1000 - depth * 100
    val path = urlPath(url)
    var score = base
    var i = 0
    while (i < HighValue.length) { if (containsIgnoreAsciiCase(path, HighValue(i))) score += 50; i += 1 }
    i = 0
    while (i < LowValue.length) { if (containsIgnoreAsciiCase(path, LowValue(i))) score -= 200; i += 1 }
    if (score < 0) 0 else if (score > 2000) 2000 else score
  }

  // -------------------------------------------------------------------
  // Asset classification (media_asset.rs:37-111, page.rs:1994-2063)
  // -------------------------------------------------------------------

  private val MediaExts: Set[String] = Set(
    "jpg", "jpeg", "png", "gif", "svg", "webp", "bmp", "tiff", "tif", "heic", "heif", "ico", "apng", "avif",
    "mp4", "avi", "mov", "wmv", "flv", "mkv", "webm", "m4v", "ogv", "ogx", "mpeg", "ts", "3gp", "3g2",
    "mp3", "wav", "ogg", "aac", "flac", "m4a", "aiff", "cda", "mid", "midi", "oga", "opus", "weba",
    "woff", "woff2", "ttf", "otf", "eot", "swf", "xap",
    "pdf", "eps", "yaml", "yml", "rtf", "txt", "doc", "docx", "csv", "epub", "gz", "ics", "md", "webmanifest",
    "abw", "azw", "odt", "ods", "odp", "ppt", "pptx", "xls", "xlsx", "vsd",
    "arc", "bin", "bz", "bz2", "jar", "mpkg", "rar", "tar", "zip", "7z")

  private val IgnoreExtensions: Set[String] = MediaExts ++ Set(
    "jfif", "pjp", "pjpeg", "psd", "ai", "tga", "xbm", "jxl", "jxr", "cur", "pbm", "pgm", "ppm",
    "cr2", "cr3", "nef", "arw", "dng", "orf", "rw2", "raf", "pef", "srw", "nrw", "kdc", "x3f",
    "mpg", "mpe", "m2v", "mts", "m2ts", "vob", "asf", "rm", "rmvb", "f4v", "divx", "xvid", "dv",
    "wma", "ra", "aif", "aifc", "amr", "au", "snd", "ac3", "dts", "mka", "caf",
    "mobi", "azw3", "kf8", "lit", "chm", "prc", "pdb",
    "xlt", "dot", "pot", "pps", "wri", "wks", "wpd", "wps",
    "xz", "lz", "lzma", "zst", "tgz", "tbz", "tbz2", "txz", "cab",
    "lzh", "lha", "sit", "sitx", "ace", "arj", "cpio", "ar", "s7z", "wim",
    "exe", "msi", "dmg", "iso", "pkg", "deb", "rpm", "apk", "ipa",
    "appx", "appimage", "crx", "xpi", "nupkg", "gem", "whl",
    "vhd", "vmdk", "qcow2", "ova", "vdi",
    "dll", "so", "dylib", "class", "pyc", "pyo",
    "db", "sqlite", "sqlite3", "mdb", "accdb",
    "dwg", "stl", "fbx", "3ds", "blend", "glb", "usdz")

  /** Reference `is_media_asset_path` (`media_asset.rs:72-84`). */
  def isMediaAssetPath(path: String): Boolean = {
    if (path == null) return false
    val dot = path.lastIndexOf('.')
    if (dot < 0 || dot == path.length - 1) return false
    MediaExts.contains(path.substring(dot + 1).toLowerCase(java.util.Locale.ROOT))
  }

  /** Reference `is_media_asset_url` (`media_asset.rs:95-111`). */
  def isMediaAssetUrl(url: String): Boolean = {
    if (url == null) return false
    val afterScheme = { val i = url.indexOf("://"); if (i < 0) url else url.substring(i + 3) }
    val slash = afterScheme.indexOf('/')
    if (slash < 0) return false
    var path = afterScheme.substring(slash)
    val cut = { val q = path.indexOf('?'); val h = path.indexOf('#')
      if (q < 0) h else if (h < 0) q else math.min(q, h) }
    if (cut >= 0) path = path.substring(0, cut)
    isMediaAssetPath(path)
  }

  /** Reference `is_ignored_extension` (`page.rs:2046-2063`): `ext` is the
    * substring after the last dot.
    */
  def isIgnoredExtension(ext: String): Boolean =
    ext != null && ext.nonEmpty && ext.length <= 16 &&
      IgnoreExtensions.contains(ext.toLowerCase(java.util.Locale.ROOT))

  /** Reference `push_link_check` (`page.rs:2902-2929`): block URLs whose
    * path has an ignored asset extension of length ≥ 2 (the reference
    * requires `path_len - dot_pos >= 3`, i.e. ≥2 ext chars).
    */
  def isIgnoredAssetUrl(urlStr: String): Boolean = {
    val path = urlPath(urlStr)
    if (path == null) return false
    val dot = path.lastIndexOf('.')
    if (dot < 0) return false
    if (path.length - dot < 3) return false
    isIgnoredExtension(path.substring(dot + 1))
  }

  // -------------------------------------------------------------------
  // Scope + link validation (page.rs:2736-2991)
  // -------------------------------------------------------------------

  /** Reference `parent_host_match` (`page.rs:2966-2991`). `subMatcher` is
    * empty for exact-host scope; the host (or root domain when `tld`) when
    * subdomain/tld scope is on. `redirectHost` is the re-anchored host after
    * a cross-host seed redirect (`RelativeSelectors` third slot).
    */
  def parentHostMatch(hostName: String, subMatcher: String, parentHost: String, redirectHost: String): Boolean = {
    if (hostName == null || hostName.isEmpty) return false
    if (hostName == parentHost || (redirectHost.nonEmpty && hostName == redirectHost)) return true
    if (subMatcher.isEmpty) return false
    val hostRoot = rootDomain(hostName)
    rootDomain(parentHost) == hostRoot || rootDomain(subMatcher) == hostRoot
  }

  /** True when `s[from..)` is a "clean" URL path: every byte already in the
    * path-allowed set, no percent escapes, no dot segments, no query — i.e.
    * canonicalization is the identity on it. Single scan, no allocation.
    */
  private def isCleanPath(s: String, from: Int): Boolean = {
    var i = from
    val n = s.length
    if (i >= n || s.charAt(i) != '/') return false
    var prev = ' '
    while (i < n) {
      val c = s.charAt(i)
      if (c <= 0x20 || c >= 0x7f || c == '"' || c == '<' || c == '>' || c == '`' ||
        c == '{' || c == '}' || c == '?' || c == '#' || c == '%') return false
      if (c == '.' && (prev == '/' || prev == '.')) return false // any "/." or ".." shape → slow path
      if (c == '/' && prev == '/') return false // empty segment
      prev = c
      i += 1
    }
    true
  }

  /** Authority (host[:port]) of `url` when it is already lowercase with no
    * userinfo and no default port; null otherwise (→ slow path).
    */
  private def cleanAuthority(url: String): String = {
    val start = url.indexOf("://")
    if (start < 0) return null
    val scheme = url.substring(0, start)
    val after = start + 3
    var i = after
    val n = url.length
    while (i < n && url.charAt(i) != '/' && url.charAt(i) != '?' && url.charAt(i) != '#') {
      val c = url.charAt(i)
      if (c == '@' || (c >= 'A' && c <= 'Z')) return null
      i += 1
    }
    val auth = url.substring(after, i)
    if (auth.isEmpty) return null
    val colon = auth.lastIndexOf(':')
    if (colon >= 0) {
      val port = auth.substring(colon + 1)
      if (port.isEmpty || !port.forall(_.isDigit)) return null
      if (DefaultPorts.get(scheme).map(_.toString).contains(port)) return null
    }
    auth
  }

  /** Reference `validate_link` + `push_link` (`page.rs:2736-2850`): resolve
    * `href` against the right base, enforce http(s) + crawl scope, coerce
    * the scheme to the parent scheme. Returns the frontier URL or null.
    *
    * `pageUrl` is the full URL of the page being parsed (reference
    * `original_page`); `crawlBase` the root-cleared crawl base (reference
    * `domain_parsed`); `baseHref` an optional `<base href>` override.
    *
    * Hot path: at 10^10 links the full parse→normalize→serialize chain is
    * allocation-bound, so hrefs that canonicalization would leave unchanged
    * (clean absolute paths on a clean-authority page; already-canonical full
    * URLs) short-circuit to a single concat — bit-identical to the slow
    * path (pinned by UrlOpsSpec property test).
    */
  def validateLink(
      pageUrl: String,
      crawlBase: String,
      baseHref: String,
      href: String,
      subMatcher: String,
      parentHost: String,
      parentScheme: String,
      redirectHost: String,
      externalDomains: Set[String],
      fullResources: Boolean): String = {
    if (href == null) return null
    val h = href.trim

    // scope + asset filter shared by both fast paths (exactly the slow
    // path's checks, without materializing a Parsed)
    def finishFast(auth: String, path: String, pathFrom: Int, scheme: String): String = {
      val colon = auth.indexOf(':')
      val hostName = if (colon < 0) auth else auth.substring(0, colon)
      var can = parentHostMatch(hostName, subMatcher, parentHost, redirectHost)
      if (!can && colon >= 0) can = parentHostMatch(auth, subMatcher, parentHost, redirectHost)
      if (!can && externalDomains.nonEmpty)
        can = externalDomains.contains(hostName) || externalDomains.contains("*")
      if (!can) return null
      if (!fullResources) {
        val dot = path.lastIndexOf('.')
        if (dot >= pathFrom && path.length - dot >= 3 && isIgnoredExtension(path.substring(dot + 1)))
          return null
      }
      if (pathFrom == 0) parentScheme + "://" + auth + path
      else if (scheme == parentScheme) path // path IS the full URL here
      else parentScheme + path.substring(scheme.length)
    }

    if (baseHref == null) {
      // FAST PATH A: clean absolute-path href against a clean-authority base
      if (h.length > 1 && h.charAt(0) == '/' && (h.length < 2 || h.charAt(1) != '/') && isCleanPath(h, 0)) {
        val base = if (crawlBase != null) crawlBase else pageUrl
        val auth = if (base == null) null else cleanAuthority(base)
        val scheme = if (base == null) null else {
          val i = base.indexOf("://"); if (i < 0) null else base.substring(0, i)
        }
        if (auth != null && scheme == "https" || auth != null && scheme == "http")
          return finishFast(auth, h, 0, scheme)
      }
      // FAST PATH B: already-canonical full URL
      if (h.startsWith("https://") || h.startsWith("http://")) {
        val auth = cleanAuthority(h)
        if (auth != null) {
          val schemeEnd = if (h.charAt(4) == 's') 5 else 4
          val pathFrom = schemeEnd + 3 + auth.length
          if (pathFrom < h.length && isCleanPath(h, pathFrom))
            return finishFast(auth, h, pathFrom, h.substring(0, schemeEnd))
        }
      }
    }
    validateLinkSlow(pageUrl, crawlBase, baseHref, h, subMatcher, parentHost,
      parentScheme, redirectHost, externalDomains, fullResources)
  }

  /** The unabridged resolve→parse→normalize→serialize chain (kept callable
    * for the fast-path equivalence property test).
    */
  private[graft] def validateLinkSlow(
      pageUrl: String,
      crawlBase: String,
      baseHref: String,
      h: String,
      subMatcher: String,
      parentHost: String,
      parentScheme: String,
      redirectHost: String,
      externalDomains: Set[String],
      fullResources: Boolean): String = {
    val resolveBase =
      if (baseHref != null && parse(baseHref) != null) baseHref
      else if (relativeDirectoryUrl(h) || crawlBase == null) pageUrl
      else crawlBase
    val absStr = convertAbsPath(resolveBase, h)
    if (absStr == null) return null
    val abs = parse(absStr)
    if (abs == null) return null // opaque scheme (e.g. mailto fell through)
    if (abs.scheme != "http" && abs.scheme != "https") return null
    val hostName = abs.host
    var canProcess = parentHostMatch(hostName, subMatcher, parentHost, redirectHost)
    if (!canProcess && abs.port >= 0) // reference tries "host:port" as the match key
      canProcess = parentHostMatch(hostName + ":" + abs.port, subMatcher, parentHost, redirectHost)
    if (!canProcess && externalDomains.nonEmpty)
      canProcess = externalDomains.contains(hostName.toLowerCase(java.util.Locale.ROOT)) || externalDomains.contains("*")
    if (!canProcess) return null
    // push_link: coerce scheme to parent scheme (page.rs:2844-2848)
    val coerced = if (abs.scheme != parentScheme) abs.copy(scheme = parentScheme) else abs
    // push_link_check: asset-extension filter unless full_resources
    if (!fullResources && isIgnoredAssetUrl(coerced.serialize)) return null
    coerced.serialize
  }

  // -------------------------------------------------------------------
  // UTF8String adapters for codegen'd Catalyst expressions. Static
  // forwarders on this object make `graft.url.UrlOps.xxxUtf8(...)`
  // callable from generated Java.
  // -------------------------------------------------------------------

  def canonUtf8(base: UTF8String, href: UTF8String): UTF8String = {
    val r = convertAbsPath(base.toString, href.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def hostUtf8(url: UTF8String): UTF8String = UTF8String.fromString(host(url.toString))
  def rootDomainUtf8(d: UTF8String): UTF8String = {
    val r = rootDomain(d.toString); if (r == null) null else UTF8String.fromString(r)
  }
  def urlPathUtf8(url: UTF8String): UTF8String = {
    val r = urlPath(url.toString); if (r == null) null else UTF8String.fromString(r)
  }
  def scoreUrlUtf8(url: UTF8String, depth: Int): Int = scoreUrl(url.toString, depth)
  def pathDepthUtf8(url: UTF8String): Int = pathDepth(url.toString)
  def isMediaAssetUtf8(url: UTF8String): Boolean = isMediaAssetUrl(url.toString)
  def isIgnoredAssetUtf8(url: UTF8String): Boolean = isIgnoredAssetUrl(url.toString)

  /** Lowercase with the SAME mapping Spark's `lower()` applies
    * (`UTF8String.toLowerCase`) — engine-side driver code that feeds or
    * probes sets compared against Spark `lower()` columns must use this,
    * never `String.toLowerCase(Locale.ROOT)` (locale-divergent for a few
    * non-ASCII mappings).
    */
  def lowerUtf8(s: String): String = UTF8String.fromString(s).toLowerCase.toString
}
