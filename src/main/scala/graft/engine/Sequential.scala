package graft.engine

import graft.model.{CrawlConfig, FrontierEntry}

/** Driver-side sequential admission — the politeness token-bucket walk and
  * the budget walk, shared VERBATIM by the sequential differential oracle
  * ([[graft.oracle.OracleCrawler]]) and the engine's small-epoch fast path:
  * below `smallEpochThreshold` the engine admits candidates with exactly
  * this code, so the fast path cannot drift from the oracle by
  * construction, while the distributed path is pinned to it by the
  * differential suite.
  *
  * Ordering: every string comparison here uses UTF-8 byte order
  * ([[utf8Ordering]]) — the order Spark's `UTF8String.binaryCompare` gives
  * the distributed path — NOT Java's UTF-16 code-unit order, which ranks
  * BMP characters in [U+E000, U+FFFF] above supplementary characters.
  */
object Sequential {

  /** UTF-8 lexicographic byte order == Unicode code-point order. Surrogate
    * pairs (supplementary code points) must sort ABOVE every BMP char;
    * naive `String.compareTo` (UTF-16 code units) gets that backwards.
    */
  val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val la = a.length; val lb = b.length
      var i = 0
      while (i < la && i < lb) {
        val ca = a.charAt(i); val cb = b.charAt(i)
        if (ca != cb) {
          val cpa =
            if (Character.isHighSurrogate(ca) && i + 1 < la &&
              Character.isLowSurrogate(a.charAt(i + 1))) a.codePointAt(i)
            else ca.toInt
          val cpb =
            if (Character.isHighSurrogate(cb) && i + 1 < lb &&
              Character.isLowSurrogate(b.charAt(i + 1))) b.codePointAt(i)
            else cb.toInt
          return Integer.compare(cpa, cpb)
        }
        i += 1
      }
      Integer.compare(la, lb)
    }
  }

  /** Canonical total order (SURVEY D6): (depth, discovery_seq, host, url). */
  val canonical: Ordering[FrontierEntry] = new Ordering[FrontierEntry] {
    def compare(a: FrontierEntry, b: FrontierEntry): Int = {
      var c = Integer.compare(a.depth, b.depth); if (c != 0) return c
      c = java.lang.Long.compare(a.discovery_seq, b.discovery_seq); if (c != 0) return c
      c = utf8Ordering.compare(a.host, b.host); if (c != 0) return c
      utf8Ordering.compare(a.url, b.url)
    }
  }

  /** Per-host emission order (D5): priority desc, then canonical. */
  val hostOrder: Ordering[FrontierEntry] = new Ordering[FrontierEntry] {
    def compare(a: FrontierEntry, b: FrontierEntry): Int = {
      var c = Integer.compare(b.priority, a.priority); if (c != 0) return c
      c = Integer.compare(a.depth, b.depth); if (c != 0) return c
      c = java.lang.Long.compare(a.discovery_seq, b.discovery_seq); if (c != 0) return c
      utf8Ordering.compare(a.url, b.url)
    }
  }

  /** Canonical key order for (depth, seq, host, url) tuples (signature
    * winners, page presentation order).
    */
  val keyOrder: Ordering[(Int, Long, String, String)] = new Ordering[(Int, Long, String, String)] {
    def compare(a: (Int, Long, String, String), b: (Int, Long, String, String)): Int = {
      var c = Integer.compare(a._1, b._1); if (c != 0) return c
      c = java.lang.Long.compare(a._2, b._2); if (c != 0) return c
      c = utf8Ordering.compare(a._3, b._3); if (c != 0) return c
      utf8Ordering.compare(a._4, b._4)
    }
  }

  /** Link dedup/seq order for (p_depth, p_seq, pos, url) tuples. */
  val linkOrder: Ordering[(Int, Long, Int, String)] = new Ordering[(Int, Long, Int, String)] {
    def compare(a: (Int, Long, Int, String), b: (Int, Long, Int, String)): Int = {
      var c = Integer.compare(a._1, b._1); if (c != 0) return c
      c = java.lang.Long.compare(a._2, b._2); if (c != 0) return c
      c = Integer.compare(a._3, b._3); if (c != 0) return c
      utf8Ordering.compare(a._4, b._4)
    }
  }

  /** Reactive per-host delay override: 429 Retry-After throttle ∨ the
    * clamped latency-EMA auto-throttle delay (reference
    * `rate_limiter.rs:121-137` + `auto_throttle.rs`). ONE formula shared by
    * the engine's distributed ledger broadcast (politenessStateDf), the
    * small-epoch fast path, and the oracle — they must stay bit-identical.
    */
  def reactiveOverrideMs(config: CrawlConfig, throttleMs: Long, ema: Option[Double]): Long = {
    val emaDelay =
      if (!config.autoThrottle) 0L
      else ema.map { e =>
        math.min(config.autoThrottleMaxDelayMs,
          math.max(config.autoThrottleMinDelayMs,
            (e / config.autoThrottleTargetConcurrency).toLong))
      }.getOrElse(0L)
    math.max(throttleMs, emaDelay)
  }

  /** B9 — per-host token-bucket politeness admission, highest priority
    * first (mirrors the engine's distributed rank + integral banking at
    * `CrawlEngine.scala` step 4; reference `rate_limiter.rs:75-186`).
    * EVERY host present banks `avail − used·1000` — a host earning a
    * fractional token per epoch accrues it and admits on a later epoch.
    *
    * @param delayOf    effective per-host delay ms (config ∨ robots
    *                   Crawl-delay ∨ reactive override ∨ auto-throttle EMA)
    * @param getTokens  current banked milli-tokens (None = fresh bucket)
    * @param putTokens  write-back of the rolled-forward bucket
    */
  def politenessAdmit(
      gated: Vector[FrontierEntry], config: CrawlConfig, epoch: Long,
      delayOf: String => Long,
      getTokens: String => Option[Long],
      putTokens: (String, Long) => Unit): (Vector[FrontierEntry], Vector[FrontierEntry]) = {
    val adm = Vector.newBuilder[FrontierEntry]
    val deferred = Vector.newBuilder[FrontierEntry]
    gated.groupBy(_.host).foreach { case (host, es) =>
      val delay = delayOf(host)
      val permits = if (delay == 0) Long.MaxValue / 4 else config.tickMs * 1000L / delay
      val avail = math.min(getTokens(host).getOrElse(1000L) + permits,
        math.max(2000L, permits * 2))
      val quota = math.min(avail / 1000L, config.maxPerHostPerEpoch.toLong)
      val sorted = es.sorted(hostOrder)
      val (a, d) = sorted.splitAt(math.min(quota, Int.MaxValue.toLong).toInt)
      adm ++= a
      deferred ++= d.map(_.copy(not_before = epoch + 1))
      putTokens(host, avail - a.size * 1000L)
    }
    (adm.result(), deferred.result())
  }

  final case class BudgetResult(
      admitted: Vector[FrontierEntry],
      leftover: Vector[FrontierEntry],
      wildcardRemaining: Long,
      pathBudget: Map[String, Long],
      budgetStopped: Boolean)

  /** B7 — budget admission in canonical order: the exact reference walk
    * (`website.rs:2051-2121`): wildcard EXCEEDS at remaining==1 and stops
    * the crawl preserving leftovers (`website.rs:7904-7907`, `extra_links`
    * `website.rs:8700-8712`); per-key decrement over accumulated path
    * segments, outer keys consuming before inner ones reject.
    */
  def budgetAdmit(
      budgetable: Vector[FrontierEntry], config: CrawlConfig,
      wildcardRemaining0: Long, pathBudget0: Map[String, Long]): BudgetResult = {
    import graft.url.UrlOps
    var wildcardRemaining = wildcardRemaining0
    var pathBudget = pathBudget0
    var budgetStopped = false
    if (!config.wildCardBudgeting && pathBudget.isEmpty)
      return BudgetResult(budgetable, Vector.empty, wildcardRemaining, pathBudget, budgetStopped)
    var admitted = Vector.empty[FrontierEntry]
    var leftover = Vector.empty[FrontierEntry]
    val inOrder = budgetable.sorted(canonical)
    val it = inOrder.iterator
    var stopped = false
    while (it.hasNext) {
      val e = it.next()
      if (stopped) leftover :+= e
      else {
        var over = false
        if (config.wildCardBudgeting) {
          if (wildcardRemaining == 1L) { stopped = true; budgetStopped = true; leftover :+= e }
          else wildcardRemaining -= 1
        }
        if (!stopped) {
          if (pathBudget.nonEmpty) {
            val segs = UrlOps.budgetSegments(e.url)
            val sb = new java.lang.StringBuilder()
            var i = 0
            while (i < segs.length && !over) {
              sb.append(segs(i))
              val k = sb.toString
              pathBudget.get(k) match {
                case Some(rem) =>
                  if (rem <= 0) over = true
                  else pathBudget = pathBudget.updated(k, rem - 1)
                case None =>
              }
              i += 1
            }
          }
          if (!over) admitted :+= e
        }
      }
    }
    BudgetResult(admitted, leftover, wildcardRemaining, pathBudget, budgetStopped)
  }
}
