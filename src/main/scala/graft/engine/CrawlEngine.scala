package graft.engine

import graft.model._
import graft.url.UrlOps
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Crawl scope — the reference's `RelativeSelectors` tuple
  * (`spider/src/lib.rs:452-458`): `(sub_matcher, [parent_host, scheme],
  * redirect_domain)`, re-anchored on cross-host seed redirect
  * (`modify_selectors`, `page.rs:4736-4747`).
  */
final case class ScopeState(
    subMatcher: String,
    parentHost: String,
    parentScheme: String,
    redirectHost: String,
    crawlBase: String,
    externalDomains: Set[String],
    fullResources: Boolean)

/** A parsed page plus its validated outgoing links (still scope-filtered
  * candidate URLs, pre-gate). One deserialization of the span array yields
  * content + metadata + links — the Spark analogue of the reference's single
  * streaming HTML pass (`page.rs:4201-4389`).
  */
final case class ParsedPage(
    url: String, final_url: String, host: String, depth: Int,
    discovery_seq: Long, priority: Int, attempt: Int, epoch: Long,
    status: Int, signature: Long,
    title: String, description: String, og_image: String,
    spans: Array[Span], links: Array[String])

final case class CrawlResult(
    pages: DataFrame,
    seen: DataFrame,
    frontierRemainder: DataFrame, // reference `extra_links` (budget stop leftovers)
    metrics: Seq[EpochMetrics],
    epochs: Long)

/** The crawl engine: the reference's `crawl_concurrent_raw` loop
  * (`spider/src/website.rs:7736-8712`) re-founded as a micro-batch frontier
  * loop over DataFrames. Per epoch:
  *
  *   admit(candidates) = politeness ∘ budget ∘ depth ∘ robots ∘ lists ∘ seen
  *   fetch → parse spans → signature-dedup → extract links → append tables
  *
  * Scale design (north rule): the `seen` set is NEVER shuffled — candidates
  * are pre-filtered through a driver-merged Bloom (fast-negative, the
  * reference's `MmapBloom` contract `utils/bloom.rs:54-98`), and the
  * maybe-seen残 subset resolves through a broadcast semi-join against the
  * partitioned seen table. Fetch order is the priority queue realized as
  * repartition(host) + secondary sort (desc priority, depth, discovery_seq,
  * url). Determinism: the canonical total order `(depth, discovery_seq,
  * host, url)` (SURVEY D6) drives budget admission and discovery_seq
  * assignment, making crawls bit-reproducible across parallelism levels.
  */
class CrawlEngine(
    spark: SparkSession,
    config: CrawlConfig,
    fetcher: Fetcher,
    robots: RobotsProvider,
    expectedUrls: Long = 4L * 1000 * 1000,
    checkpoint: Option[Checkpointer] = None,
    /** B11 — user veto on frontier expansion of a fetched page (reference
      * `on_should_crawl_callback` `website.rs:1255`, applied 8646-8654).
      * The page is still recorded; its links are not.
      */
    onShouldCrawl: Option[ParsedPage => Boolean] = None) {
  // deliberately NOT Serializable: closures must capture locals, never
  // `this` (which holds the SparkSession) — accidental capture fails fast.

  import spark.implicits._

  private val P = spark.sparkContext.defaultParallelism
  private val trace = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
  private def timed[T](label: String)(f: => T): T = {
    if (!trace) f else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[trace] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
  }

  // ---------------------------------------------------------------------
  // Deterministic global sequence: range-partition on the sort key, sort
  // within partitions, then zipWithIndex (per-partition imperative logic —
  // the one place an RDD is genuinely needed; a global window would funnel
  // everything through a single partition).
  // ---------------------------------------------------------------------
  private def withGlobalSeq(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
      outName: String, offset: Long): DataFrame = {
    if (df.isEmpty) return df.withColumn(outName, lit(0L))
    val parts = math.max(1, math.min(P, 200))
    val sorted = df.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(outName, LongType, nullable = false)
    val withSeq = timed("zipWithIndex")(sorted.rdd.zipWithIndex())
      .map { case (row, i) => Row.fromSeq(row.toSeq :+ (i + offset)) }
    spark.createDataFrame(withSeq, schema)
  }

  // ---------------------------------------------------------------------
  // Gate terms (SURVEY §2.B)
  // ---------------------------------------------------------------------

  /** B2/B3 — whitelist/blacklist, non-regex semantics: EXACT string match
    * (`lib.rs:433-449` — `Vec<CompactString>::contains`).
    */
  private def listsGate(df: Dataset[FrontierEntry]): Dataset[FrontierEntry] = {
    val wl = config.whitelist.toSet
    val bl = config.blacklist.toSet
    if (wl.isEmpty && bl.isEmpty) df
    else df.filter { e: FrontierEntry =>
      val wOk = wl.isEmpty || wl.contains(e.url)
      val bOk = bl.isEmpty || !bl.contains(e.url)
      wOk && bOk
    }
  }

  /** B4 — robots gate (`is_allowed_robots` `website.rs:1992-2006`). */
  private def robotsGate(df: Dataset[FrontierEntry]): Dataset[FrontierEntry] = {
    if (!config.respectRobotsTxt) return df
    val prov = robots
    val ua = config.userAgent
    df.filter { e: FrontierEntry => prov.policyFor(e.host).canFetch(ua, e.url) }
  }

  /** B6 — depth gate: URL path depth vs depth_distance
    * (`is_over_depth` `website.rs:2124-2126`; distance derivation
    * `determine_limits` `website.rs:14076-14089`: max(depth, seed segments)).
    */
  private def depthGate(df: Dataset[FrontierEntry], depthDistance: Int): Dataset[FrontierEntry] = {
    if (config.depth <= 0) return df
    import graft.url.urlfns._
    df.filter(path_depth(col("url")) <= lit(depthDistance)).as[FrontierEntry]
  }

  // ---------------------------------------------------------------------
  // The crawl
  // ---------------------------------------------------------------------

  /** D9 — cooperative shutdown (reference `handle_process`
    * `website.rs:1823-1852`): graceful, the current epoch completes.
    */
  @volatile private var shutdownRequested = false
  def requestShutdown(): Unit = { shutdownRequested = true }

  /** A8 — `scrape()` = crawl + materialized pages (`website.rs:7326-7378`). */
  def scrape(seedUrls: Seq[String]): Array[graft.model.PageRow] = {
    import spark.implicits._
    crawl(seedUrls).pages.as[graft.model.PageRow].collect()
  }

  /** A6 — sitemap-source crawl (`crawl_sitemap` `website.rs:6994-7028`,
    * recursive walk 12578+): each seed's `/sitemap.xml` joins the seed list;
    * its `<loc>` entries are span-encoded links, so the ordinary parse →
    * gate → frontier machinery ingests them. (The reference chains the
    * sitemap AFTER the crawl; with the gate idempotent over `seen`, seeding
    * upfront yields the same visited set when budgets are off.)
    */
  def crawlSitemap(seedUrls: Seq[String]): CrawlResult = {
    val sitemaps = seedUrls.flatMap { s =>
      val p = UrlOps.parseCrawlBase(s)
      if (p == null) None else Some(p.copy(path = "/sitemap.xml").serialize)
    }
    crawl(seedUrls ++ sitemaps)
  }

  def crawl(seedUrls0: Seq[String], resumeFrom: Option[Checkpointer] = None): CrawlResult = {
    // A2 — glob seed expansion (`features/glob.rs`, `website.rs:3875-3885`)
    val seedUrls = graft.url.Glob.expandSeeds(seedUrls0)
    require(seedUrls.nonEmpty, "need at least one seed")
    val deadline =
      if (config.crawlTimeoutMs > 0) System.nanoTime() + config.crawlTimeoutMs * 1000000L
      else Long.MaxValue

    // --- setup (reference `setup_base` + `setup_selectors`) ---
    val seed0 = UrlOps.parse(seedUrls.head)
    require(seed0 != null, s"unparseable seed ${seedUrls.head}")
    val seedHost = seed0.host
    var scope = ScopeState(
      subMatcher =
        if (config.tld) UrlOps.rootDomain(seedHost)
        else if (config.subdomains) seedHost
        else "",
      parentHost = seedHost,
      parentScheme = seed0.scheme,
      redirectHost = "",
      crawlBase = UrlOps.parseCrawlBase(seedUrls.head).serialize,
      externalDomains = config.externalDomains.map(_.toLowerCase(java.util.Locale.ROOT)),
      fullResources = config.fullResources)

    val depthDistance = math.max(config.depth, UrlOps.budgetSegments(seedUrls.head).length)

    // budget ledger (driver-held, few keys — checkpointed). Keys are the
    // reference's accumulated-segment strings (`website.rs:2051-2121`).
    var wildcardRemaining: Long =
      config.budget.get("*").map(_.toLong).getOrElse(Long.MaxValue)
    var pathBudget: Map[String, Long] =
      (config.budget - "*").map { case (k, v) => (k, v.toLong) }
    var budgetStopped = false

    // --- URL-seen: bloom (fast-negative) + exact table (authoritative).
    // One compact bloom per epoch delta (sized to the delta), broadcast as
    // a group — never one giant filter (SURVEY §7 risk note). ---
    var blooms = Vector.empty[BloomFilter]
    // State tables accumulate as per-epoch DELTAS (each localCheckpointed
    // once) — unioning cached deltas is O(1) per epoch, where re-checkpointing
    // a growing table every epoch would be O(total) per epoch (quadratic).
    var seenDeltas = Vector.empty[DataFrame]
    var sigDeltas = Vector.empty[DataFrame]
    var pageDeltas = Vector.empty[DataFrame]
    val emptySeen = spark.emptyDataset[(String, String)].toDF("url_lower", "url")
    val emptySigs = spark.emptyDataset[Long].toDF("sig")
    val emptyPages = spark.emptyDataset[PageRow].toDF()
    def seen: DataFrame = if (seenDeltas.isEmpty) emptySeen else seenDeltas.reduce(_ unionByName _)
    def signatures: DataFrame = if (sigDeltas.isEmpty) emptySigs else sigDeltas.reduce(_ unionByName _)
    def pages: DataFrame = if (pageDeltas.isEmpty) emptyPages else pageDeltas.reduce(_ unionByName _)
    var seenCount = 0L
    var hostTokens = spark.emptyDataset[(String, Long)].toDF("host", "tokens_milli")
    var seqCounter = 0L
    var epoch = 0L
    val metrics = scala.collection.mutable.ArrayBuffer.empty[EpochMetrics]

    def mergeBloom(urls: DataFrame, deltaCount: Long): Unit = {
      // per-partition blooms (identically sized for this delta) merged on
      // driver into ONE epoch bloom appended to the filter group
      if (deltaCount <= 0) return
      val size = math.max(1024L, deltaCount)
      val parts = urls.select(lower(col("url")).as("u")).as[String]
        .mapPartitions { it =>
          if (it.isEmpty) Iterator.empty
          else {
            val b = BloomFilter.create(size, 0.01)
            it.foreach(b.putString)
            val bos = new java.io.ByteArrayOutputStream()
            b.writeTo(bos)
            Iterator.single(bos.toByteArray)
          }
        }.collect()
      if (parts.nonEmpty) {
        val merged = BloomFilter.readFrom(new java.io.ByteArrayInputStream(parts.head))
        parts.tail.foreach { bytes =>
          merged.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
        }
        blooms :+= merged
      }
    }

    // --- seed establishment (`_crawl_establish` `website.rs:4104-4360`):
    // seeds gated by is_allowed_default only (lists + robots, no budget) ---
    val canonSeeds = seedUrls.flatMap { s =>
      val c = UrlOps.convertAbsPath(s, s); if (c == null) None else Some(c)
    }.distinct
    var frontier: DataFrame = spark.createDataset(canonSeeds.zipWithIndex.map { case (u, i) =>
      FrontierEntry(u, UrlOps.host(u), 0, i.toLong, UrlOps.scoreUrl(u, 0), 0, 0L)
    }).toDF()
    seqCounter = canonSeeds.length.toLong
    frontier = robotsGate(listsGate(frontier.as[FrontierEntry])).toDF()

    val canonicalOrder = Seq(col("depth"), col("discovery_seq"), col("host"), col("url"))

    // --- resume: restore all loop state from the latest committed snapshot
    // (north rule: resumable from checkpoint with per-partition lineage) ---
    resumeFrom.foreach { ck =>
      val e = ck.latestEpoch()
      if (e >= 0) {
        frontier = ck.readTable(e, "frontier").localCheckpoint(true)
        seenDeltas = Vector(ck.readTable(e, "seen").localCheckpoint(true))
        sigDeltas = Vector(ck.readTable(e, "signatures").localCheckpoint(true))
        pageDeltas = Vector(ck.readTable(e, "pages").localCheckpoint(true))
        hostTokens = ck.readTable(e, "host_tokens").localCheckpoint(true)
        seenCount = seenDeltas.head.count()
        blooms = Vector.empty
        mergeBloom(seenDeltas.head.select(col("url")), seenCount)
        val m = ck.readManifest(e)
        def longField(k: String): Option[Long] =
          ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(m).map(_.group(1).toLong)
        def strField(k: String): Option[String] =
          ("\"" + k + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(m).map(_.group(1))
        longField("seq_counter").foreach(seqCounter = _)
        longField("wildcard_remaining").foreach(wildcardRemaining = _)
        "\"path_budget\":\\{([^}]*)\\}".r.findFirstMatchIn(m).foreach { g =>
          val body = g.group(1).trim
          if (body.nonEmpty) pathBudget = body.split(",").map { kv =>
            val Array(k, v) = kv.split(":")
            (k.trim.stripPrefix("\"").stripSuffix("\""), v.trim.toLong)
          }.toMap
        }
        strField("redirect_host").filter(_.nonEmpty)
          .foreach(rh => scope = scope.copy(redirectHost = rh))
        epoch = e + 1
      }
    }

    // --- epoch loop ---
    // fast path: with politeness and retries off, nothing ever carries a
    // not_before hold — the ready set IS the frontier and its count is known
    // from the previous epoch (saves two driver jobs per epoch)
    val holdsPossible = config.delayMs > 0 || config.respectRobotsTxt ||
      config.maxPerHostPerEpoch != Int.MaxValue || config.retryLimit > 0
    var frontierCountPrev = frontier.count()
    var done = frontierCountPrev == 0
    while (!done) {
      // 0. candidates whose politeness/retry holdoff has passed
      val ready = if (holdsPossible) frontier.filter(col("not_before") <= lit(epoch)) else frontier
      val deferredHold = if (holdsPossible) frontier.filter(col("not_before") > lit(epoch))
        else spark.emptyDataset[FrontierEntry].toDF()
      val epochT0 = System.nanoTime()
      val candCount = if (holdsPossible) ready.count() else frontierCountPrev

      if (candCount == 0) {
        // nothing ready this tick — advance logical time only
        epoch += 1
        if (frontier.isEmpty || epoch >= config.maxEpochs ||
          shutdownRequested || System.nanoTime() > deadline) done = true
      } else {
        // 1. B1 visited: bloom fast-negative, broadcast semi-join for the rest;
        //    the big `seen` side is scanned but never shuffled.
        val withLower = ready.withColumn("url_lower", lower(col("url")))
        val bloomB = spark.sparkContext.broadcast(blooms)
        val mightContain = udf((u: String) => bloomB.value.exists(_.mightContainString(u)))
        val definitelyNew = withLower.filter(!mightContain(col("url_lower")))
        val maybeSeen = withLower.filter(mightContain(col("url_lower")))
        val hits = seen.join(broadcast(maybeSeen.select(col("url_lower")).distinct()), Seq("url_lower"), "left_semi")
        val unseen = definitelyNew.unionByName(
          maybeSeen.join(broadcast(hits), Seq("url_lower"), "left_anti"))

        // 2. B8 batch dedup (case-insensitive, keep canonical-min; the
        //    frontier HashSet semantics `website.rs:7810`)
        val dedupW = Window.partitionBy(col("url_lower"))
          .orderBy(canonicalOrder: _*)
        val deduped = unseen
          .withColumn("__rn", row_number().over(dedupW))
          .filter(col("__rn") === 1).drop("__rn")

        // 3. stateless gates: lists, robots, depth
        val gated0 = depthGate(
          robotsGate(listsGate(deduped.drop("url_lower").as[FrontierEntry])), depthDistance).toDF()

        // 4. B9 politeness FIRST: per-host token-bucket quota, highest
        //    priority first (D5 top-k per host); non-admitted stay in the
        //    frontier. (The reference sleeps AFTER gating; a distributed
        //    deferral must re-gate, so politeness runs before the stateful
        //    budget to avoid double-charging deferred candidates.)
        val politenessOn = config.delayMs > 0 || config.respectRobotsTxt ||
          config.maxPerHostPerEpoch != Int.MaxValue
        var polAdmitted = gated0
        var deferred = spark.emptyDataset[FrontierEntry].toDF()
        if (politenessOn) {
          val prov = robots
          val ua = config.userAgent
          val cfgDelay = config.delayMs
          val respectRobots = config.respectRobotsTxt
          val delayUdf = udf((host: String) => {
            val rd = if (respectRobots) prov.crawlDelayMs(host, ua) else 0L
            math.max(cfgDelay, rd)
          })
          val tick = config.tickMs
          val withDelay = polAdmitted.withColumn("__delay", delayUdf(col("host")))
            .join(broadcast(hostTokens), Seq("host"), "left")
          val avail = withDelay.withColumn("__permits",
              when(col("__delay") === 0, lit(Long.MaxValue / 4))
                .otherwise(lit(tick) * 1000L / col("__delay")))
            .withColumn("__avail",
              least(coalesce(col("tokens_milli"), lit(1000L)) + col("__permits"),
                greatest(lit(2000L), col("__permits") * 2)))
            .withColumn("__quota",
              least(col("__avail") / 1000L, lit(config.maxPerHostPerEpoch.toLong)))
          val hw = Window.partitionBy(col("host"))
            .orderBy(col("priority").desc, col("depth"), col("discovery_seq"), col("url"))
          val rankedH = avail.withColumn("__hrn", row_number().over(hw))
          val adm = rankedH.filter(col("__hrn") <= col("__quota"))
          deferred = rankedH.filter(col("__hrn") > col("__quota"))
            .select(col("url"), col("host"), col("depth"), col("discovery_seq"),
              col("priority"), col("attempt"), lit(epoch + 1).as("not_before"))
          // roll the per-host buckets forward
          val consumedPerHost = adm.groupBy(col("host"))
            .agg(count(lit(1)).as("__used"), first(col("__avail")).as("__a"))
            .select(col("host"), (col("__a") - col("__used") * 1000L).as("tokens_milli"))
          val untouched = rankedH.filter(col("__hrn") === 1).filter(col("__quota") === 0)
            .select(col("host"), col("__avail").as("tokens_milli"))
          hostTokens = consumedPerHost.unionByName(untouched)
            .unionByName(hostTokens.join(consumedPerHost.unionByName(untouched),
              Seq("host"), "left_anti"))
            .localCheckpoint(true)
          polAdmitted = adm.select(col("url"), col("host"), col("depth"), col("discovery_seq"),
            col("priority"), col("attempt"), col("not_before"))
        }

        // 5. B7 budget admission in canonical order (deterministic — the
        //    reference decrements counters sequentially; we replay that
        //    order exactly; see SURVEY D6/B7)
        var admitted = polAdmitted
        var budgetLeftover = spark.emptyDataset[FrontierEntry].toDF()
        if (config.wildCardBudgeting || pathBudget.nonEmpty) {
          val ranked = withGlobalSeq(polAdmitted, canonicalOrder, "__grank", 0L).localCheckpoint(true)
          var alive = ranked
          if (config.wildCardBudgeting) {
            // wildcard passes links while budget > 1, then EXCEEDS at ==1
            // (`abs_diff(0)==1` check `website.rs:2060-2070`) — exhaustion
            // stops the whole crawl (`website.rs:7904-7907`), leftovers
            // preserved as extra_links.
            val n = ranked.count()
            val passCount = math.max(0L, wildcardRemaining - 1L)
            if (n > passCount) {
              budgetStopped = true
              // leftover links preserved — reference `extra_links`
              // (`website.rs:8700-8712`)
              budgetLeftover = ranked.filter(col("__grank") >= lit(passCount))
                .drop("__grank")
            }
            alive = alive.filter(col("__grank") < lit(passCount))
            wildcardRemaining -= math.min(n, passCount)
          }
          if (pathBudget.nonEmpty) {
            // per-key window in accumulated-segment order; outer keys consume
            // before inner ones reject (walk order `website.rs:2085-2115`)
            val keys = pathBudget.keys.toSeq.sortBy(_.length)
            val segUdf = udf((url: String) => {
              val segs = UrlOps.budgetSegments(url)
              val acc = new scala.collection.mutable.ArrayBuffer[String](segs.length)
              val sb = new java.lang.StringBuilder()
              segs.foreach { s => sb.append(s); acc += sb.toString }
              acc.toSeq
            })
            var cur = alive.withColumn("__prefixes", segUdf(col("url")))
            for (k <- keys) {
              val rem = pathBudget(k)
              val matches = cur.withColumn("__m", array_contains(col("__prefixes"), k))
              val w = Window.partitionBy(col("__m")).orderBy(col("__grank"))
              val rankedK = matches.withColumn("__krn", row_number().over(w))
              val passed = rankedK.filter(!col("__m") || col("__krn") <= lit(rem))
              val consumed = math.min(rankedK.filter(col("__m")).count(), rem)
              pathBudget = pathBudget.updated(k, rem - consumed)
              cur = passed.drop("__m", "__krn")
            }
            alive = cur.drop("__prefixes")
          }
          admitted = alive.drop("__grank")
        }

        // 6. mark admitted as seen (insert at admission, `insert_link`
        //    `website.rs:1718-1749`); bloom merged from per-partition filters
        val admittedDs = timed("admit_ckpt")(admitted.as[FrontierEntry].localCheckpoint(true))
        val admittedCount = timed("admit_count")(admittedDs.count())
        val newSeen = admittedDs.select(lower(col("url")).as("url_lower"), col("url"))
        timed("bloom")(mergeBloom(admittedDs.select(col("url")).toDF(), admittedCount))

        // 7+9. fetch + parse — priority-queue emission (repartition by host,
        //    secondary sort desc priority/depth/seq/url, north rule D5) then
        //    one-pass span parse, PIPELINED in a single stage and
        //    materialized once. (Epoch 0 splits the stage because the C6
        //    scope re-anchor must read the seed fetch result before link
        //    extraction — `modify_selectors` `page.rs:4736-4747`.)
        // host-hash partitioning WITH salt (north rule D4): a hot host that
        // dominates the frontier would otherwise pin one task; the salt
        // spreads each host over up to 16 tasks while keeping host affinity.
        // Politeness quotas were already enforced upstream, so fetch order
        // within a salt shard is pure priority emission.
        val fetchReady = admittedDs
          .repartition(math.max(1, P), col("host"), pmod(xxhash64(col("url")), lit(16)))
          .sortWithinPartitions(col("priority").desc, col("depth"), col("discovery_seq"), col("url"))
          .as[FrontierEntry]
        val ep = epoch
        val parsed: Dataset[ParsedPage] =
          if (epoch == 0L) {
            val fetched = fetcher.fetch(spark, fetchReady).localCheckpoint(true)
            val ph = scope.parentHost
            val redirHosts = fetched
              .filter(f => f.f_status == 200 && UrlOps.host(f.f_final_url) != ph)
              .map(_.f_final_url).take(1)
            if (redirHosts.nonEmpty) scope = scope.copy(redirectHost = UrlOps.host(redirHosts.head))
            val sc = scope
            fetched.mapPartitions(it => it.map(f => CrawlEngine.parsePage(f, sc, ep)))
              .localCheckpoint(true)
          } else {
            val sc = scope
            timed("fetch_parse")(fetcher.fetch(spark, fetchReady)
              .mapPartitions(it => it.map(f => CrawlEngine.parsePage(f, sc, ep)))
              .localCheckpoint(true))
          }

        // 8. C7 retry ladder: retryable statuses re-queue with backoff and
        //    are REMOVED from seen (`website.rs:8663-8666`); retried rows'
        //    parse output is discarded (lazy filters over the cached parse)
        val isRetryable = (s: org.apache.spark.sql.Column) =>
          (s >= 500 && s =!= 501 && s =!= 505 && s =!= 511) || s === 429 || s === 408
        val isRetried = isRetryable(col("status")) && col("attempt") < config.retryLimit
        val retryDf = parsed.toDF().filter(isRetried)
          .select(col("url"), col("host"), col("depth"), col("discovery_seq"),
            col("priority"), (col("attempt") + 1).as("attempt"),
            // exponential backoff in logical epochs, capped (reference
            // `backoff_delay(attempt, 1s, 60s)` `website.rs:8388-8392`)
            (lit(epoch) + least(pow(lit(2.0), col("attempt") + 1), lit(60.0)).cast(LongType)).as("not_before"))
        // with retries disabled, nothing is ever removed from seen — skip
        // the anti-join and the extra count (delta size == admitted count)
        val seenDelta = if (config.retryLimit > 0)
          newSeen.join(retryDf.select(lower(col("url")).as("url_lower")),
            Seq("url_lower"), "left_anti")
        else newSeen

        // pages delta: lazy projection over the cached parse (no extra job)
        pageDeltas :+= parsed.toDF().filter(!isRetried)
          .select(col("url"), col("final_url"), col("host"), col("depth"),
            col("discovery_seq"), col("epoch"), col("status"), col("signature"),
            col("title"), col("description"), col("og_image"), col("spans"))

        // 10. C5 signature dedup: only the canonical-first page per NEW
        //     signature expands links; seen signatures expand nothing
        //     (`website.rs:8671-8683`)
        var expanding = (onShouldCrawl match {
          case Some(veto) => parsed.filter(veto) // B11: vetoed pages don't expand
          case None => parsed
        }).toDF()
        if (config.normalize) {
          val sigOk = expanding.filter(col("status") === 200 && col("signature") =!= 0L)
          val sigNew = sigOk.join(broadcast(
              signatures.join(broadcast(sigOk.select(col("signature").as("sig")).distinct()),
                Seq("sig"), "left_semi")),
            col("signature") === col("sig"), "left_anti")
          val sigW = Window.partitionBy(col("signature")).orderBy(canonicalOrder: _*)
          val firstPerSig = sigNew.withColumn("__srn", row_number().over(sigW))
            .filter(col("__srn") === 1).drop("__srn", "sig")
          val newSigs = firstPerSig.select(col("signature").as("sig"))
          sigDeltas :+= timed("sig_ckpt")(newSigs.localCheckpoint(true))
          expanding = firstPerSig.unionByName(
            expanding.filter(col("status") === 200 && col("signature") === 0L))
        } else {
          expanding = expanding.filter(col("status") === 200)
        }

        // 11. explode links; assign deterministic discovery_seq in
        //     (parent-canonical-order, span-position) order
        val linksRaw = expanding
          .select(col("depth").as("p_depth"), col("discovery_seq").as("p_seq"),
            posexplode(col("links")).as(Seq("pos", "url")))
          .select(col("url"), (col("p_depth") + 1).as("depth"), col("p_depth"), col("p_seq"), col("pos"))
        val newLinkCount = timed("links_count")(linksRaw.count())
        var newFrontier = spark.emptyDataset[FrontierEntry].toDF()
        if (newLinkCount > 0) {
          val linkDedupW = Window.partitionBy(lower(col("url")))
            .orderBy(col("p_depth"), col("p_seq"), col("pos"), col("url"))
          val uniq = linksRaw.withColumn("__rn", row_number().over(linkDedupW))
            .filter(col("__rn") === 1).drop("__rn")
          val seqd = withGlobalSeq(uniq,
            Seq(col("p_depth"), col("p_seq"), col("pos"), col("url")), "__seq", seqCounter)
          seqCounter += newLinkCount // upper bound; gaps are fine (monotone + deterministic)
          import graft.url.urlfns._
          newFrontier = seqd.select(
            col("url"),
            url_host(col("url")).as("host"),
            col("depth"),
            col("__seq").as("discovery_seq"),
            score_url(col("url"), col("depth")).as("priority"),
            lit(0).as("attempt"),
            lit(0L).as("not_before"))
        }

        // 12. next frontier = politeness-deferred ∪ retries ∪ new links,
        //     case-insensitive-deduped (D1), seen-filtered lazily next epoch
        val nextFrontierAll = deferredHold.unionByName(deferred)
          .unionByName(budgetLeftover)
          .unionByName(retryDf).unionByName(newFrontier)
        val fW = Window.partitionBy(lower(col("url"))).orderBy(canonicalOrder: _*)
        frontier = timed("frontier_ckpt")(nextFrontierAll.withColumn("__rn", row_number().over(fW))
          .filter(col("__rn") === 1).drop("__rn")
          .localCheckpoint(true))

        val seenDeltaCk = timed("seen_ckpt")(seenDelta.localCheckpoint(true))
        seenDeltas :+= seenDeltaCk
        seenCount += (if (config.retryLimit > 0) seenDeltaCk.count() else admittedCount)
        val frontierCount = frontier.count()
        frontierCountPrev = frontierCount

        metrics += EpochMetrics(epoch, candCount, admittedCount, admittedCount,
          newLinkCount, frontierCount, seenCount, budgetStopped,
          (System.nanoTime() - epochT0) / 1000000L)

        checkpoint.foreach(_.commit(epoch, frontier, seen, signatures, hostTokens, pages,
          seqCounter, wildcardRemaining, pathBudget, scope, metrics.toSeq))

        epoch += 1
        done = budgetStopped || frontierCount == 0 || epoch >= config.maxEpochs ||
          shutdownRequested || System.nanoTime() > deadline
      }
    }

    CrawlResult(pages, seen, frontier, metrics.toSeq, epoch)
  }
}

object CrawlEngine {

  /** Resume a checkpointed crawl: restores frontier/seen/signatures/host
    * state/pages + driver ledger from the latest committed snapshot and
    * continues the epoch loop (kill-and-restart produces tables identical
    * to an uninterrupted run — ResumeSpec).
    */
  def resume(spark: SparkSession, config: CrawlConfig, fetcher: Fetcher,
      robots: RobotsProvider, ck: Checkpointer, seedUrls: Seq[String],
      expectedUrls: Long = 4L * 1000 * 1000): CrawlResult =
    new CrawlEngine(spark, config, fetcher, robots, expectedUrls, Some(ck))
      .crawl(seedUrls, Some(ck))

  /** Normalized-content signature — the reference hashes `normalize_html`
    * output (markup minus volatile attrs/links, `utils/mod.rs:9221-9300`);
    * the span-native analogue hashes the ordered text content (links and
    * media refs excluded, matching the href-stripping). Exact function is
    * ours to define (SURVEY C4); FNV-1a 64 over the joined text.
    */
  def signatureOf(spans: Array[Span]): Long = {
    if (spans == null || spans.isEmpty) return 0L
    val textKinds = Set("text", "title", "meta_description")
    var h = 0xcbf29ce484222325L
    var any = false
    val sorted = spans.sortBy(_.offset)
    var i = 0
    while (i < sorted.length) {
      val s = sorted(i)
      if (s.text != null && textKinds.contains(s.kind)) {
        any = true
        val bytes = s.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var j = 0
        while (j < bytes.length) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
        h ^= 0x1eL; h *= 0x100000001b3L // span separator
      }
      i += 1
    }
    if (any) h else 0L
  }

  /** Media/script span kinds that become frontier candidates only with
    * `full_resources` (reference adds `script[src],link[href]`
    * `page.rs:4276-4311`; media srcs stay out of the frontier by the
    * asset-extension filter anyway).
    */
  private val ResourceKinds = Set("image", "video", "audio", "script", "stylesheet", "og_image")

  /** One-pass parse of a fetched document: metadata + signature + validated
    * links (C1/C2/C3/C4 fused, like the reference's single rewriter pass).
    */
  def parsePage(f: FetchResult, scope: ScopeState, epoch: Long): ParsedPage = {
    val spans = if (f.f_spans == null) Array.empty[Span] else f.f_spans
    var title: String = null
    var desc: String = null
    var og: String = null
    var baseHref: String = null
    val sorted = spans.sortBy(_.offset)
    var i = 0
    while (i < sorted.length) {
      val s = sorted(i)
      s.kind match {
        case "title" => if (title == null) title = s.text
        case "meta_description" => if (desc == null) desc = s.text
        case "og_image" => if (og == null) og = s.media_ref
        case "base" => if (baseHref == null) baseHref = s.media_ref
        case _ =>
      }
      i += 1
    }
    val links = scala.collection.mutable.ArrayBuffer.empty[String]
    if (f.f_status == 200) {
      // "/"-rooted hrefs resolve against the PAGE's own root (the reference
      // resolves against `domain_parsed`, its single crawl root — identical
      // for single-host crawls; for multi-host/external-domain crawls the
      // per-page root is the only correct generalization).
      val pageRoot = {
        val p = UrlOps.parseCrawlBase(f.f_final_url)
        if (p == null) scope.crawlBase else p.serialize
      }
      i = 0
      while (i < sorted.length) {
        val s = sorted(i)
        val isLink = s.kind == "link" || (scope.fullResources && ResourceKinds.contains(s.kind))
        if (isLink && s.media_ref != null) {
          val v = UrlOps.validateLink(
            pageUrl = f.f_final_url, crawlBase = pageRoot, baseHref = baseHref,
            href = s.media_ref, subMatcher = scope.subMatcher, parentHost = scope.parentHost,
            parentScheme = scope.parentScheme, redirectHost = scope.redirectHost,
            externalDomains = scope.externalDomains, fullResources = scope.fullResources)
          if (v != null) links += v
        }
        i += 1
      }
    }
    val sig = signatureOf(spans)
    ParsedPage(f.url, f.f_final_url, f.host, f.depth, f.discovery_seq, f.priority,
      f.attempt, epoch, f.f_status, sig, title, desc, og, spans, links.distinct.toArray)
  }
}
