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
    charset: String, etag: String,
    spans: Array[Span], links: Array[String],
    retry_after_ms: Long, latency_ms: Long,
    /** `<sitemapindex>` locs (span kind "sitemap") — the recursive sitemap
      * walk's next level (reference `SiteMapEntity::SiteMap`,
      * `website.rs:12748-12753`); empty for ordinary pages. */
    sitemap_links: Array[String] = Array.empty)

/** C7 — pluggable retry strategy (reference `retry_strategy.rs:24-70`: a
  * user hook deciding per attempt whether/how to retry; the fetch-profile
  * switching half of the directive lives behind the Fetcher seam). Column
  * methods run on the hot path (codegen'd); the scalar methods are the
  * sequential-oracle mirror and MUST stay consistent with them.
  */
trait RetryPolicy extends Serializable {
  def maxAttempts: Int
  def isRetryable(status: org.apache.spark.sql.Column): org.apache.spark.sql.Column
  def backoffEpochs(attempt: org.apache.spark.sql.Column): org.apache.spark.sql.Column
  def isRetryableStatus(status: Int): Boolean
  def backoffEpochsOf(attempt: Int): Long
}

/** The reference's built-in ladder: retryable 5xx/429/408, exponential
  * backoff capped at 60 (`backoff_delay(attempt, 1s, 60s)`
  * `website.rs:8388-8392`).
  */
final class DefaultRetryPolicy(limit: Int) extends RetryPolicy {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  override def maxAttempts: Int = limit
  override def isRetryable(s: Column): Column =
    (s >= 500 && s =!= 501 && s =!= 505 && s =!= 511) || s === 429 || s === 408
  override def backoffEpochs(attempt: Column): Column =
    least(pow(lit(2.0), attempt + 1), lit(60.0)).cast(org.apache.spark.sql.types.LongType)
  override def isRetryableStatus(s: Int): Boolean =
    (s >= 500 && s != 501 && s != 505 && s != 511) || s == 429 || s == 408
  override def backoffEpochsOf(attempt: Int): Long =
    math.min(math.pow(2.0, attempt + 1).toLong, 60L)
}

final case class CrawlResult(
    pages: DataFrame,
    seen: DataFrame,
    frontierRemainder: DataFrame, // reference `extra_links` (budget stop leftovers)
    metrics: Seq[EpochMetrics],
    epochs: Long,
    // B11 side outputs (reference `on_robots_blocked` `website.rs:1980-1982`,
    // `blocked_crawl` `page.rs:2446`): one row per blocked URL with
    // reason ∈ {robots, veto} and the epoch it was blocked in. Populated
    // only under `trackBlocked` (empty otherwise); EpochMetrics counts are
    // the per-epoch aggregates of this table.
    blocked: DataFrame)

/** The crawl engine: the reference's `crawl_concurrent_raw` loop
  * (`spider/src/website.rs:7736-8712`) re-founded as a micro-batch frontier
  * loop over DataFrames. Per epoch:
  *
  *   admit(candidates) = politeness ∘ budget ∘ depth ∘ robots ∘ lists ∘ seen
  *   fetch → parse spans → signature-dedup → extract links → append tables
  *
  * Scale design (north rule): the `seen` set is NEVER re-shuffled and
  * never broadcast — candidates are pre-filtered through a driver-merged
  * Bloom group (fast-negative, the reference's `MmapBloom` contract
  * `utils/bloom.rs:54-98`), and the maybe-seen residue shuffles to the
  * hash-partitioned seen store where a per-partition exact set answers
  * membership authoritatively. Fetch order is the priority queue realized as
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
    onShouldCrawl: Option[ParsedPage => Boolean] = None,
    /** C7 — pluggable retry strategy; None = the reference's built-in
      * ladder driven by `config.retryLimit`.
      */
    retryPolicy: Option[RetryPolicy] = None,
    /** Per-link rewrite hook applied at link-find time, before gating
      * (reference `on_link_find_callback` `website.rs:1253`, applied
      * 4067/4318/5873 — the URL inserted into the frontier/seen set is the
      * REWRITTEN one). Runs executor-side inside the parse pass — must be
      * serializable and pure.
      */
    onLinkFind: Option[String => String] = None,
    /** Driver-side hook invoked after each completed epoch (monitoring /
      * deterministic mid-crawl control in tests).
      */
    onEpoch: Option[Long => Unit] = None) {
  // deliberately NOT Serializable: closures must capture locals, never
  // `this` (which holds the SparkSession) — accidental capture fails fast.

  import spark.implicits._

  /** Partition count for the engine's explicit exchanges — follows the
    * session's `spark.sql.shuffle.partitions` (the knob a cluster operator
    * already sizes) rather than core count: oversized tasks build
    * multi-million-key aggregation hash maps whose working set thrashes
    * the shared cache; more, smaller partitions keep per-task state
    * cache-resident and let AQE coalesce where they're too fine.
    */
  private def P = math.max(spark.sessionState.conf.numShufflePartitions,
    spark.sparkContext.defaultParallelism)
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[CrawlEngine])
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
    // InternalRow end-to-end (same rationale as the link-seq path): the old
    // Dataset.rdd + zipWithIndex + createDataFrame bridge deserialized and
    // re-encoded every row; count + JoinedRow stamp touch zero row bytes,
    // and the two jobs share the sort shuffle via the stable RDD instance
    val sortedRdd = org.apache.spark.sql.GraftSqlBridge.internalRdd(sorted)
    val counts = timed("grank_count")(sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single((i, n))
    }.collect().sortBy(_._1).map(_._2))
    val offsets = counts.scanLeft(offset)(_ + _)
    val withSeq = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var k = offsets(i)
      val cell = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { r =>
        cell.update(0, k); k += 1
        joined(r, cell): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark, withSeq, schema)
  }

  // ---------------------------------------------------------------------
  // Gate terms (SURVEY §2.B)
  // ---------------------------------------------------------------------

  /** B2/B3 — whitelist/blacklist as codegen'd column predicates (round 1
    * used a typed lambda that deserialized every row). Non-regex semantics:
    * EXACT string match (`lib.rs:433-449` — `Vec<CompactString>::contains`);
    * `listsAreRegex` switches to the reference's `regex` feature build
    * (RegexSet::is_match — unanchored search, `lib.rs:433-440`).
    */
  private def listsGate(df: Dataset[FrontierEntry]): Dataset[FrontierEntry] = {
    val wl = config.whitelist
    val bl = config.blacklist
    if (wl.isEmpty && bl.isEmpty) return df
    def matches(patterns: Seq[String]): org.apache.spark.sql.Column =
      if (config.listsAreRegex) patterns.map(p => col("url").rlike(p)).reduce(_ || _)
      else col("url").isInCollection(patterns)
    var cond: org.apache.spark.sql.Column = lit(true)
    if (wl.nonEmpty) cond = cond && matches(wl)
    if (bl.nonEmpty) cond = cond && !matches(bl)
    df.filter(cond)
  }

  /** B4 — robots gate as a codegen expression
    * (`is_allowed_robots` `website.rs:1992-2006`).
    */
  private def robotsGate(df: Dataset[FrontierEntry]): Dataset[FrontierEntry] = {
    if (!config.respectRobotsTxt) return df
    df.filter(enginefns.robots_can_fetch(col("host"), col("url"), robots, config.userAgent))
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

  /** D9 — pause/resume (reference handle value 1, `website.rs:1839-1846`):
    * the loop spins between epochs until resumed; logical time is frozen.
    */
  @volatile private var pauseRequested = false
  def pause(): Unit = { pauseRequested = true }
  def unpause(): Unit = { pauseRequested = false }
  def isPaused: Boolean = pauseRequested

  /** A-side mid-crawl URL injection — the reference's `channel_queue` +
    * `dequeue` (`website.rs:1324`, `7528-7562`): queued URLs join the next
    * epoch's frontier and pass the full gate (seen/lists/robots/depth).
    * Unlike the reference's `is_allowed_budgetless` dequeue check, budget
    * admission applies normally (one consistent budget ledger).
    */
  private val inbox = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def enqueue(url: String): Unit = { if (url != null) inbox.add(url) }

  private val retry: RetryPolicy =
    retryPolicy.getOrElse(new DefaultRetryPolicy(config.retryLimit))

  /** Access-ordered LRU map capped at [[CrawlEngine.lruHostCap]] hosts (the
    * reference caps its per-domain limiter maps the same way,
    * `rate_limiter.rs` MAX_ENTRIES / `auto_throttle.rs` MAX_ENTRIES).
    */
  private def lruMap[V](): java.util.LinkedHashMap[String, V] =
    new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
        size() > CrawlEngine.lruHostCap
    }

  private def topHotHosts(widths: Iterable[(String, Int)]): Map[String, Int] =
    CrawlEngine.topHotHosts(widths)

  /** A8 — `scrape()` = crawl + materialized pages (`website.rs:7326-7378`). */
  def scrape(seedUrls: Seq[String]): Array[graft.model.PageRow] = {
    import spark.implicits._
    crawl(seedUrls).pages.as[graft.model.PageRow].collect()
  }

  /** A6 — crawl with the sitemap CHAINED AFTER it (reference `crawl()` =
    * `crawl_concurrent` then `sitemap_crawl_chain`, `website.rs:6974-6976`;
    * recursive `<sitemapindex>` walk `website.rs:12578+`): the main crawl
    * spends budget first; each seed's `/sitemap.xml` is then walked —
    * budgetless for the sitemap docs themselves, budget-gated for their
    * entries, recursing into nested sitemap indexes. Entry pages are
    * recorded but their links never expand. One deviation, documented:
    * with `normalize` on, the reference also drops duplicate-signature
    * ENTRY pages from its output; here signature dedup only ever gates
    * expansion, so chain-phase entry pages are always recorded.
    */
  def crawlWithSitemap(seedUrls: Seq[String]): CrawlResult =
    crawl(seedUrls, sitemapChain = true)

  /** A6 — sitemap-ONLY walk, aligned with the reference's `crawl_sitemap()`
    * (`website.rs:6994-7028`): walks each seed's `/sitemap.xml` (recursing
    * into `<sitemapindex>` locs) and fetches the listed entries INSTEAD of
    * running the link crawl — seed pages are never fetched and no page's
    * links expand.
    */
  def crawlSitemap(seedUrls: Seq[String]): CrawlResult =
    crawl(seedUrls, sitemapOnly = true)

  def crawl(seedUrls0: Seq[String], resumeFrom: Option[Checkpointer] = None,
      sitemapChain: Boolean = false, sitemapOnly: Boolean = false): CrawlResult = {
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
    // a group — never one giant filter (SURVEY §7 risk note). Held as
    // serialized bytes; executors deserialize lazily via BloomGroup. ---
    var blooms = Vector.empty[Array[Byte]]
    // B1 authoritative URL-seen store — the north rule's PARTITIONED
    // membership check: (url_lower, url) pairs hash-partitioned ONCE and
    // probed by shuffling only the epoch's maybe-seen candidates to the
    // matching partitions, where a per-partition exact hash set answers
    // membership (exact ⊃ the north star's per-partition cuckoo filter —
    // same contract, authoritative). The seen side is NEVER re-shuffled
    // and NEVER broadcast (round 2 broadcast the maybe-seen set AND its
    // hits — both epoch-sized, a driver round-trip pair per epoch that a
    // 10^10 frontier cannot afford). Deltas append co-partitioned through
    // a partitioner-aware union; every k epochs the chain is
    // localCheckpoint-compacted — distributed, lineage-flat, no driver
    // funnel. Partition count sizes each partition's set to executor
    // memory at the target scale.
    val seenPartitioner = new org.apache.spark.HashPartitioner(math.max(P, 16))
    var seenRdd: org.apache.spark.rdd.RDD[(String, String)] =
      spark.sparkContext.emptyRDD[(String, String)].partitionBy(seenPartitioner)
    var seenRddEpochs = 0 // deltas since last compaction
    var seenBase: Option[org.apache.spark.rdd.RDD[(String, String)]] = None
    // C5 signature store — same co-partitioned shape as the seen store:
    // 64-bit signatures hash-partitioned once, probed by shuffling only
    // the epoch's candidate signatures, deltas unioned partitioner-aware
    var sigRdd: org.apache.spark.rdd.RDD[(Long, Boolean)] =
      spark.sparkContext.emptyRDD[(Long, Boolean)].partitionBy(seenPartitioner)
    var sigRddEpochs = 0
    var sigBase: Option[org.apache.spark.rdd.RDD[(Long, Boolean)]] = None
    // O(residue) membership probes (round-3 verdict #1): per-partition
    // SORTED key arrays built from the store ONCE (lazily, then again per
    // compaction) and persisted — each epoch's gate probes (cached array ∪
    // small since-compaction delta set) instead of rebuilding a hash set
    // from the ENTIRE store every epoch (O(|seen|)/epoch at 10^10 URLs).
    // Sorted array + binary search over a HashSet: same contract, ~2-4x
    // less resident memory. The probe is a SNAPSHOT of the store at build
    // time; `seenDeltaRdd`/`sigDeltaRdd` carry every key appended since —
    // a key present in both sides answers identically, so build timing
    // can lag appends without a correctness window.
    var seenProbe: org.apache.spark.rdd.RDD[Array[String]] = null
    var seenDeltaRdd: org.apache.spark.rdd.RDD[(String, String)] =
      spark.sparkContext.emptyRDD[(String, String)].partitionBy(seenPartitioner)
    def seenProbeRdd(): org.apache.spark.rdd.RDD[Array[String]] = {
      if (seenProbe == null)
        seenProbe = seenRdd.mapPartitions({ it =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) buf += it.next()._1
          val arr = buf.toArray
          java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
          Iterator.single(arr)
        }, preservesPartitioning = true)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      seenProbe
    }
    def resetSeenProbe(): Unit = {
      if (seenProbe != null) { try seenProbe.unpersist(false) catch { case _: Throwable => } }
      seenProbe = null
      seenDeltaRdd = spark.sparkContext.emptyRDD[(String, String)].partitionBy(seenPartitioner)
    }
    var sigProbe: org.apache.spark.rdd.RDD[Array[Long]] = null
    var sigDeltaRdd: org.apache.spark.rdd.RDD[(Long, Boolean)] =
      spark.sparkContext.emptyRDD[(Long, Boolean)].partitionBy(seenPartitioner)
    def sigProbeRdd(): org.apache.spark.rdd.RDD[Array[Long]] = {
      if (sigProbe == null)
        sigProbe = sigRdd.mapPartitions({ it =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (it.hasNext) buf += it.next()._1
          val arr = buf.toArray
          java.util.Arrays.sort(arr)
          Iterator.single(arr)
        }, preservesPartitioning = true)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sigProbe
    }
    def resetSigProbe(): Unit = {
      if (sigProbe != null) { try sigProbe.unpersist(false) catch { case _: Throwable => } }
      sigProbe = null
      sigDeltaRdd = spark.sparkContext.emptyRDD[(Long, Boolean)].partitionBy(seenPartitioner)
    }
    var sigWinnerCaches = Vector.empty[DataFrame]
    // persisted admitted sets backing the lazy seen deltas (released at
    // compaction)
    var admittedCaches = Vector.empty[Dataset[FrontierEntry]]
    // per-epoch page-delta sink (A7): parquet under a crawl-scoped temp dir
    // (a real deployment points this at the output table's location);
    // deleted on JVM exit
    val pagesSink = {
      val dir = java.nio.file.Files.createTempDirectory("graft-pages-").toAbsolutePath
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => }
      }))
      dir.toString
    }
    // blocked-row side sink (B11 parity): same per-epoch-delta/one-relation
    // pattern as the page sink — blocked URLs are data-scale on a robots-
    // heavy crawl, so they must never accumulate on the driver. The small
    // path's rows (bounded per epoch by the threshold) buffer driver-side
    // and spill to the sink past a fixed cap; distributed epochs write
    // deltas directly.
    lazy val blockedSink = {
      val dir = java.nio.file.Files.createTempDirectory("graft-blocked-").toAbsolutePath
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => }
      }))
      dir.toString
    }
    var blockedWritten = false
    var blockedDeltaN = 0
    val blockedBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def sinkBlockedDelta(df: DataFrame, tag: String): Long = {
      blockedDeltaN += 1
      val dir = s"$blockedSink/delta_${blockedDeltaN}_$tag"
      df.write.mode("overwrite").parquet(dir)
      blockedWritten = true
      spark.read.schema(CrawlEngine.blockedSchema).parquet(dir).count()
    }
    def flushBlockedBuf(): Unit = if (blockedBuf.nonEmpty) {
      import spark.implicits._
      blockedDeltaN += 1
      blockedBuf.toSeq.toDF("url", "reason", "epoch")
        .coalesce(1).write.mode("overwrite").parquet(s"$blockedSink/delta_${blockedDeltaN}_buf")
      blockedWritten = true
      blockedBuf.clear()
    }
    def blockedDf: DataFrame = {
      flushBlockedBuf()
      if (!blockedWritten)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], CrawlEngine.blockedSchema)
      else spark.read.schema(CrawlEngine.blockedSchema)
        .option("recursiveFileLookup", "true").parquet(blockedSink)
    }
    val emptySeen = spark.emptyDataset[(String, String)].toDF("url_lower", "url")
    val emptySigs = spark.emptyDataset[Long].toDF("sig")
    val emptyPages = spark.emptyDataset[PageRow].toDF()
    val seenSchema = emptySeen.schema
    def seen: DataFrame =
      spark.createDataFrame(seenRdd.map(kv => Row(kv._1, kv._2)), seenSchema)
    val sigSchema = emptySigs.schema
    def signatures: DataFrame =
      spark.createDataFrame(sigRdd.map(kv => Row(kv._1)), sigSchema)
    // The pages view is ONE relation over the sink directory (never a
    // per-epoch union: a thousand-epoch crawl would otherwise build a
    // thousand-way union plan whose canonicalization alone OOMs the driver)
    var pagesWritten = false
    var restoredPages: Option[DataFrame] = None // resume-injected prior pages
    // Small-epoch page-delta buffer: tiny epochs append their parsed pages
    // here and flush to ONE parquet delta per `pageBufCap` rows instead of
    // paying a Spark write job per epoch (a toy crawl of 40 epochs paid 40
    // jobs for a few hundred rows total). Every reader of the sink flushes
    // first (`def pages`), so the view is always complete; `epoch` rides in
    // the rows, so multi-epoch deltas are exact. Bounded by the cap.
    val pageBuf = scala.collection.mutable.ArrayBuffer.empty[ParsedPage]
    var pageBufN = 0
    def flushPageBuf(): Unit = if (pageBuf.nonEmpty) {
      pageBufN += 1
      spark.createDataset(pageBuf.toIndexedSeq).coalesce(1)
        .write.option("compression", "none")
        .option("parquet.enable.dictionary", "false")
        .parquet(s"$pagesSink/buf_$pageBufN")
      pagesWritten = true
      pageBuf.clear()
    }
    val pageCols = Seq(col("url"), col("final_url"), col("host"), col("depth"),
      col("discovery_seq"), col("epoch"), col("status"), col("signature"),
      col("title"), col("description"), col("og_image"), col("charset"),
      col("etag"), col("spans"))
    def pages: DataFrame = {
      flushPageBuf()
      val retriedCol = retry.isRetryable(col("status")) && col("attempt") < retry.maxAttempts
      val fresh =
        if (!pagesWritten) emptyPages
        else spark.read.schema(CrawlEngine.parsedSchema)
          .option("recursiveFileLookup", "true").parquet(pagesSink)
          .filter(!retriedCol).select(pageCols: _*)
      restoredPages.map(_.unionByName(fresh)).getOrElse(fresh)
    }
    var seenCount = 0L
    // per-host token buckets, driver-held in an access-ordered LRU map
    // capped at 100k hosts — the reference holds its per-domain limiter
    // buckets exactly this way (`rate_limiter.rs` MAX_ENTRIES); an evicted
    // host re-creates a fresh full bucket, like an evicted DashMap entry.
    // Round 2 kept this as a DataFrame rolled forward with a
    // localCheckpoint per epoch — a full driver job + broadcast exchange
    // for what is a bounded driver-side ledger.
    val hostTokensMap = lruMap[java.lang.Long]()
    def hostTokensDf(): DataFrame = {
      import scala.jdk.CollectionConverters._
      val rows = hostTokensMap.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue.longValue))
      if (rows.isEmpty) spark.emptyDataset[(String, Long)].toDF("host", "tokens_milli")
      else spark.createDataset(rows).toDF("host", "tokens_milli")
    }
    var seqCounter = 0L
    var epoch = 0L
    val metrics = scala.collection.mutable.ArrayBuffer.empty[EpochMetrics]

    def mergeBloomParts(parts: Array[Array[Byte]]): Unit = {
      if (parts.isEmpty) return
      val merged = BloomFilter.readFrom(new java.io.ByteArrayInputStream(parts.head))
      parts.tail.foreach { bytes =>
        merged.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
      }
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos)
      blooms :+= bos.toByteArray
    }

    // Fused admit statistics: the fetch exchange's OWN map-side scan feeds
    // a per-task (count, bloom shard, locally-hot hosts) accumulator entry
    // — rounds 1-3 paid a DEDICATED job here (one extra full scan of the
    // admitted set per epoch, which also forced the columnar cache build
    // ahead of fetch; verdict r3 flagged it as a negative-scaling phase).
    // Tasks may re-execute (fetcher-side re-evaluation, speculation, AQE):
    // entries carry their partition id and the driver keeps ONE per
    // partition; bloom inserts are idempotent set-unions anyway. Bloom
    // sizing uses the candidate-count upper bound (>= admitted count) so
    // shards stay merge-compatible without a pre-count; keys are
    // UTF8String lowercase — bit-identical to the Spark `lower()` the
    // probe side applies, read zero-copy off the UnsafeRow.
    // D4 skew: a host holding share s of the epoch's admitted rows gets a
    // salt width ~4sP (min 16 preserves cold-host affinity for connection
    // reuse at the fetch seam). Since the stats now ride the fetch scan,
    // the widths steer the NEXT epoch's salting — hot hosts persist
    // across steady-state epochs (the skew bench pins this holds).
    // Hosts are emitted from a partition only when locally hot (>= 1/8 of
    // the partition), so the accumulated map stays tiny at any host
    // cardinality.
    var hotHostWidths: Map[String, Int] = Map.empty
    type AdmitStat = (Int, Long, Array[Byte], Array[(String, Long)])
    // partition count of the stats map stage — drainAdmitStats compares the
    // flushed entries against it to DETECT a Fetcher that violated the
    // full-consumption contract (see the Fetcher trait doc): a missing
    // shard would let already-seen URLs pass the bloom as definitely-new
    // and bypass the exact probe, so detection falls back to a dedicated
    // rebuild scan of the persisted admitted set.
    var admitStatsParts = 0
    def withAdmitStats(df: DataFrame, expectedUpper: Long,
        acc: org.apache.spark.util.CollectionAccumulator[AdmitStat]): DataFrame = {
      val size = math.max(1024L, expectedUpper)
      val urlIdx = df.schema.fieldIndex("url")
      val hostIdx = df.schema.fieldIndex("host")
      // same lazy toRdd the mapInternal below wraps — no extra planning
      admitStatsParts =
        org.apache.spark.sql.GraftSqlBridge.internalRdd(df).getNumPartitions
      org.apache.spark.sql.GraftSqlBridge.mapInternal(df, df.schema) { (_, it) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // rebind captures as lambda-body locals: Spark's ClosureCleaner
        // zeroes captured fields it only sees referenced from the nested
        // anonymous class (a captured `size` arrives as 0 without this)
        val sz = size; val ui = urlIdx; val hi = hostIdx; val a = acc
        new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
          private var bloom: BloomFilter = null
          private val hostCounts = new java.util.HashMap[String, Long]()
          private var n = 0L
          private var flushed = false
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !flushed) {
              flushed = true
              // empty partitions flush too (null shard): the drain counts
              // flushed pids against the stage's partition count to detect
              // partial consumption, so every EXHAUSTED partition must
              // report — a partition abandoned mid-iteration never gets
              // here, which is exactly the signal
              val shard: Array[Byte] = if (n == 0) null else {
                val bos = new java.io.ByteArrayOutputStream()
                bloom.writeTo(bos)
                bos.toByteArray
              }
              import scala.jdk.CollectionConverters._
              val hot = hostCounts.asScala
                .filter { case (_, c) => c * 8 >= n && c >= 32 }.toArray
              a.add((pid, n, shard, hot))
            }
            h
          }
          override def next(): org.apache.spark.sql.catalyst.InternalRow = {
            val r = it.next()
            if (bloom == null) bloom = BloomFilter.create(sz, 0.01)
            bloom.putBinary(r.getUTF8String(ui).toLowerCase.getBytes)
            hostCounts.merge(r.getUTF8String(hi).toString, 1L, (x, y) => x + y)
            n += 1
            r
          }
        }
      }
    }
    def drainAdmitStats(
        acc: org.apache.spark.util.CollectionAccumulator[AdmitStat],
        admittedDs: Dataset[FrontierEntry], expectedUpper: Long): Long = {
      import scala.jdk.CollectionConverters._
      val seenPids = new java.util.HashSet[Int]()
      var uniqParts = acc.value.asScala.filter(e => seenPids.add(e._1)).toVector
      if (uniqParts.size < admitStatsParts) {
        // Fetcher contract violation (the fetch never fully executed the
        // admitted scan — sampled, limited, or served from a detached
        // plan): the ride-along stats are incomplete, and a missing bloom
        // shard would silently re-admit already-seen URLs next epoch.
        // Self-heal with a dedicated rebuild scan of the PERSISTED
        // admitted set (one extra job, only on violating epochs) and use
        // its shards/counts exclusively.
        log.warn(s"epoch $epoch: admit stats incomplete " +
          s"(${uniqParts.size}/$admitStatsParts partitions reported) — " +
          "the Fetcher did not fully consume the admitted set; rebuilding " +
          "bloom/count/salt stats with a dedicated scan")
        val size = math.max(1024L, expectedUpper)
        uniqParts = admittedDs.mapPartitions { it =>
          val bloom = BloomFilter.create(size, 0.01)
          val hostCounts = new java.util.HashMap[String, Long]()
          var n = 0L
          it.foreach { e =>
            bloom.putBinary(org.apache.spark.unsafe.types.UTF8String
              .fromString(e.url).toLowerCase.getBytes)
            hostCounts.merge(e.host, 1L, (x, y) => x + y)
            n += 1
          }
          if (n == 0) Iterator.empty
          else {
            val bos = new java.io.ByteArrayOutputStream()
            bloom.writeTo(bos)
            val hot = hostCounts.asScala
              .filter { case (_, c) => c * 8 >= n && c >= 32 }.toArray
            Iterator.single((org.apache.spark.TaskContext.getPartitionId(),
              n, bos.toByteArray, hot))
          }
        }(org.apache.spark.sql.Encoders.kryo[AdmitStat]).collect().toVector
      }
      mergeBloomParts(uniqParts.iterator.map(_._3).filter(_ != null).toArray)
      val total = uniqParts.iterator.map(_._2).sum
      val pNow = P
      hotHostWidths =
        if (total <= 0) Map.empty
        else topHotHosts(uniqParts.iterator.flatMap(_._4).toSeq.groupBy(_._1)
          .map { case (h, cs) => (h, cs.map(_._2).sum) }
          .map { case (h, c) => (h, math.ceil(c.toDouble / total * 4 * pNow).toInt) }
          .filter(_._2 > 16))
      total
    }

    // resume/compaction path: rebuild one bloom from the seen store (a
    // distributed scan — each partition builds its shard, driver ORs them)
    def bloomFromSeen(urlLower: org.apache.spark.rdd.RDD[String], expected: Long): Unit = {
      if (expected <= 0) return
      val size = math.max(1024L, expected)
      val parts = urlLower.mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val b = BloomFilter.create(size, 0.01)
          it.foreach(u => b.putBinary(org.apache.spark.unsafe.types.UTF8String.fromString(u).getBytes))
          val bos = new java.io.ByteArrayOutputStream()
          b.writeTo(bos)
          Iterator.single(bos.toByteArray)
        }
      }.collect()
      mergeBloomParts(parts)
    }

    // --- seed establishment (`_crawl_establish` `website.rs:4104-4360`):
    // seeds gated by is_allowed_default only (lists + robots, no budget).
    // Case-insensitive dedup keep-first establishes the frontier invariant
    // "unique by lower(url)" that every later epoch maintains (B8's batch
    // dedup is thereby structural — no per-epoch window shuffle needed). ---
    val seedSeen = scala.collection.mutable.Set.empty[String]
    val canonSeeds = seedUrls.flatMap { s =>
      val c = UrlOps.convertAbsPath(s, s); if (c == null) None else Some(c)
    }.filter(u => seedSeen.add(UrlOps.lowerUtf8(u)))
    val seedEntries = canonSeeds.zipWithIndex.map { case (u, i) =>
      FrontierEntry(u, UrlOps.host(u), 0, i.toLong, UrlOps.scoreUrl(u, 0), 0, 0L)
    }.toVector
    seqCounter = canonSeeds.length.toLong

    // ------------------------------------------------------------------
    // Small-epoch fast path state: while every epoch stays under
    // `smallEpochThreshold` candidates, the WHOLE admission pipeline
    // (gates, politeness, budget, links, frontier roll) runs driver-side
    // with the Sequential module — the same code the differential oracle
    // runs — and only fetch + the page sink touch Spark. The frontier
    // lives in `frontierLocal`; driver mirrors of the seen/signature
    // membership make the gate job-free. A distributed epoch (candCount
    // over the threshold) materializes the frontier, drops the mirrors
    // permanently, and every later epoch runs the distributed path.
    // At toy scale (the reference's own test crawls) an epoch otherwise
    // pays ~10 driver round-trips for <=dozens of rows of actual work.
    // ------------------------------------------------------------------
    var frontierLocal: Option[Vector[FrontierEntry]] = None
    var driverSeen: java.util.HashSet[String] = new java.util.HashSet[String]()
    var driverSigs: java.util.HashSet[java.lang.Long] = new java.util.HashSet[java.lang.Long]()
    def dropMirrors(): Unit = { driverSeen = null; driverSigs = null }
    def listedLocal(patterns: Seq[String], url: String): Boolean =
      if (config.listsAreRegex) patterns.exists(p => p.r.findFirstIn(url).isDefined)
      else patterns.contains(url)
    // is_allowed_default driver-side (lists + robots) — same policy objects
    // the distributed gate's codegen expressions consult
    def gateDefaultLocal(e: FrontierEntry): Boolean =
      (config.whitelist.isEmpty || listedLocal(config.whitelist, e.url)) &&
        (config.blacklist.isEmpty || !listedLocal(config.blacklist, e.url)) &&
        (!config.respectRobotsTxt ||
          robots.policyFor(e.host).canFetch(config.userAgent, e.url))
    var frontier: DataFrame = null
    if (config.smallEpochThreshold > 0) {
      frontierLocal = Some(seedEntries.filter(gateDefaultLocal))
      frontier = spark.emptyDataset[FrontierEntry].toDF() // unused while local
    } else {
      dropMirrors()
      frontier = robotsGate(listsGate(
        spark.createDataset(seedEntries).as[FrontierEntry])).toDF()
    }
    def frontierDf: DataFrame = frontierLocal match {
      case Some(v) =>
        if (v.isEmpty) spark.emptyDataset[FrontierEntry].toDF()
        else spark.createDataset(v).toDF()
      case None => frontier
    }

    // A6 chain state: lowercased canonical URLs of every sitemap DOCUMENT
    // (seed /sitemap.xml + recursively discovered <sitemapindex> locs) —
    // drives budget exemption and the chain's expansion rule. Bounded by
    // sitemap count, never by page count. Persisted in the checkpoint
    // manifest so a chain-phase kill resumes mid-chain.
    var chainStarted = false
    val chainSitemapLower = scala.collection.mutable.Set.empty[String]
    // page-advertised sitemaps (rel=sitemap spans) found during the main
    // crawl — injected into the chain alongside the seeds' configured
    // sitemap URL (lower-key -> first canonical URL, deterministic order)
    val discoveredSitemaps = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def seedSitemapUrls: Seq[String] = {
      val smPath =
        if (config.sitemapUrl.startsWith("/")) config.sitemapUrl else "/" + config.sitemapUrl
      seedUrls.flatMap { s =>
        val p = UrlOps.parseCrawlBase(s)
        if (p == null) None else Some(p.copy(path = smPath).serialize)
      }.flatMap(u => Option(UrlOps.convertAbsPath(u, u)))
    }

    if (sitemapOnly) {
      // A6 — sitemap-ONLY walk (reference `crawl_sitemap()`,
      // `website.rs:6994-7028`): the link crawl never runs — the chain
      // starts immediately from each seed's /sitemap.xml; seed pages are
      // never fetched. Scope/budget/robots setup still derives from the
      // seeds themselves.
      chainStarted = true
      val smSeen = scala.collection.mutable.Set.empty[String]
      val canonSms = seedSitemapUrls.filter(u => smSeen.add(UrlOps.lowerUtf8(u)))
      chainSitemapLower ++= canonSms.map(UrlOps.lowerUtf8)
      val smEntries = canonSms.zipWithIndex.map { case (u, i) =>
        FrontierEntry(u, UrlOps.host(u), 0, i.toLong, UrlOps.scoreUrl(u, 0), 0, 0L)
      }.toVector
      seqCounter = canonSms.length.toLong
      if (frontierLocal.isDefined) frontierLocal = Some(smEntries.filter(gateDefaultLocal))
      else frontier = robotsGate(listsGate(
        spark.createDataset(smEntries).as[FrontierEntry])).toDF()
    }

    val canonicalOrder = Seq(col("depth"), col("discovery_seq"), col("host"), col("url"))

    // --- resume: restore all loop state from the latest committed snapshot
    // (north rule: resumable from checkpoint with per-partition lineage) ---
    resumeFrom.foreach { ck =>
      val e = ck.latestEpoch()
      if (e >= 0) {
        // restored state is distributed-only: the local-frontier fast path
        // and its membership mirrors never survive a restart
        frontierLocal = None
        dropMirrors()
        frontier = ck.readTable(e, "frontier").localCheckpoint(true)
        seenRdd = ck.readTable(e, "seen").rdd
          .map(r => (r.getString(0), r.getString(1)))
          .partitionBy(seenPartitioner)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        seenBase = Some(seenRdd)
        sigRdd = ck.readTable(e, "signatures").rdd.map(r => (r.getLong(0), true))
          .partitionBy(seenPartitioner)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sigBase = Some(sigRdd)
        restoredPages = Some(ck.readTable(e, "pages").localCheckpoint(true))
        ck.readTable(e, "host_tokens").collect()
          .foreach(r => hostTokensMap.put(r.getString(0), Long.box(r.getLong(1))))
        seenCount = seenRdd.count()
        blooms = Vector.empty
        bloomFromSeen(seenRdd.map(_._1), seenCount)
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
        // chain lineage: a kill during the sitemap chain resumes mid-chain
        // (chain rules re-arm from the manifest's sitemap-doc set; parsed
        // as JSON quoted strings — URLs may contain ',' and ']')
        val (ckChainStarted, ckChainSms) = Checkpointer.chainState(m)
        if (ckChainStarted) {
          chainStarted = true
          chainSitemapLower ++= ckChainSms
        }
        // pre-chain rel=sitemap discoveries: restore in manifest order
        // (insertion order) so the chain seeds' injection order — and the
        // sitemap docs' discovery_seq — match the unkilled run exactly
        Checkpointer.discoveredSitemaps(m).foreach { u =>
          val k = UrlOps.lowerUtf8(u)
          if (!discoveredSitemaps.contains(k)) discoveredSitemaps.put(k, u)
        }
        epoch = e + 1
      }
    }

    // --- epoch loop ---
    // fast paths, all statically known from config:
    //  - holdsPossible: politeness/retries may set not_before holds — only
    //    then does the ready split + count need a job
    //  - carryover: any stream besides new links can re-enter the frontier
    //    (holds, politeness deferrals, budget leftovers, retries) — only
    //    then does the end-of-epoch union need a dedup window; otherwise the
    //    next frontier IS the (already unique) new-link set
    val politenessPossible = config.delayMs > 0 || config.respectRobotsTxt ||
      config.maxPerHostPerEpoch != Int.MaxValue
    val holdsPossible = politenessPossible || retry.maxAttempts > 0
    val carryover = holdsPossible || config.wildCardBudgeting || (config.budget - "*").nonEmpty
    // reactive per-host politeness state (LRU-capped like the reference's
    // DashMap limiters): 429/Retry-After delay overrides + latency EMAs
    val throttleOverrideMs = lruMap[java.lang.Long]()
    val latencyEma = lruMap[java.lang.Double]()
    /** ONE broadcast row per host carrying ALL driver-ledger politeness
      * state (reactive delay override ∨ auto-throttle EMA delay, and the
      * banked token bucket) — a single join in the gate instead of two.
      */
    def politenessStateDf(): DataFrame = {
      import scala.jdk.CollectionConverters._
      val hosts = (throttleOverrideMs.keySet.asScala ++ latencyEma.keySet.asScala ++
        hostTokensMap.keySet.asScala).toSet.toSeq
      val rows = hosts.map { h =>
        val ov = Sequential.reactiveOverrideMs(config,
          Option(throttleOverrideMs.get(h)).map(_.longValue).getOrElse(0L),
          Option(latencyEma.get(h)).map(_.doubleValue))
        val tokens = Option(hostTokensMap.get(h)).map(_.longValue).getOrElse(1000L)
        (h, ov, tokens)
      }
      if (rows.isEmpty)
        spark.emptyDataset[(String, Long, Long)].toDF("host", "override_ms", "tokens_milli")
      else spark.createDataset(rows).toDF("host", "override_ms", "tokens_milli")
    }
    // driver-side not_before histogram of the frontier, refreshed by the
    // SAME job that counts it: per-epoch readiness (`candCount`) then needs
    // NO job at all — a politeness-paced crawl's empty ticks (hosts banking
    // fractional tokens) advance logical time for free
    var readyHist: Map[Long, Long] = Map.empty
    def histOf(df: DataFrame): Map[Long, Long] =
      df.groupBy(col("not_before")).agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    if (frontierLocal.isEmpty) readyHist = histOf(frontier)
    var frontierCountPrev = frontierLocal.map(_.size.toLong).getOrElse(readyHist.values.sum)
    var done = frontierCountPrev == 0
    var epochCache: Option[DataFrame] = None // politeness rank cache, per epoch

    // tiny-epoch membership probes against the distributed stores — the
    // mirror-dropped fallback: ONE job over <= threshold keys
    def probeSeenPresent(keys: Seq[String]): Set[String] =
      if (keys.isEmpty) Set.empty
      else spark.sparkContext.parallelize(keys, 1).map(k => (k, ()))
        .partitionBy(seenPartitioner)
        .zipPartitions(seenProbeRdd(), seenDeltaRdd) { (cit, pit, dit) =>
          val base: Array[AnyRef] =
            if (pit.hasNext) pit.next().asInstanceOf[Array[AnyRef]] else new Array[AnyRef](0)
          var delta: java.util.HashSet[String] = null
          while (dit.hasNext) {
            if (delta == null) delta = new java.util.HashSet[String]()
            delta.add(dit.next()._1)
          }
          cit.collect { case (k, _)
            if java.util.Arrays.binarySearch(base, k) >= 0 ||
              (delta != null && delta.contains(k)) => k }
        }.collect().toSet
    def probeSigsPresent(sigs: Set[Long]): Set[Long] =
      if (sigs.isEmpty) Set.empty
      else spark.sparkContext.parallelize(sigs.toSeq, 1).map(k => (k, ()))
        .partitionBy(seenPartitioner)
        .zipPartitions(sigProbeRdd(), sigDeltaRdd) { (cit, pit, dit) =>
          val base = if (pit.hasNext) pit.next() else Array.emptyLongArray
          var delta: java.util.HashSet[java.lang.Long] = null
          while (dit.hasNext) {
            if (delta == null) delta = new java.util.HashSet[java.lang.Long]()
            delta.add(Long.box(dit.next()._1))
          }
          cit.collect { case (k, _)
            if java.util.Arrays.binarySearch(base, k) >= 0 ||
              (delta != null && delta.contains(Long.box(k))) => k }
        }.collect().toSet

    // state hygiene for long crawls: every k epochs fold the
    // co-partitioned delta chains flat (localCheckpoint — distributed,
    // partitioner preserved, no driver funnel), refresh the probe
    // snapshots, and rebuild the bloom group only when its generation
    // count exceeds the documented FP bound — per-epoch gate cost stays
    // flat over thousands of epochs while compaction itself is O(delta)
    // for most windows
    def compactStores(): Unit = {
      timed("seen_compact") {
        val c = seenRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.localCheckpoint()
        c.count()
        seenBase.foreach(b => try b.unpersist(false) catch { case _: Throwable => })
        seenBase = Some(c)
        seenRdd = c
        seenRddEpochs = 0
      }
      // probe snapshot refresh: next gate lazily rebuilds the sorted
      // per-partition arrays from the compacted store; the delta chain
      // resets to empty (its keys are in the compacted store now)
      resetSeenProbe()
      // generation blooms (round-3 verdict #5): the per-epoch delta
      // blooms keep serving — the full O(|seen|) rebuild runs only when
      // the generation count exceeds bloomMaxGenerations (group FP
      // estimate 1-(1-0.01)^k; a false positive costs one exact-probe
      // shuffle row, never correctness)
      if (blooms.size > config.bloomMaxGenerations) {
        blooms = Vector.empty
        bloomFromSeen(seenRdd.map(_._1), math.max(1L, seenCount))
      }
      admittedCaches.foreach(d => try d.unpersist(false) catch { case _: Throwable => })
      admittedCaches = Vector.empty
      if (sigRddEpochs > 0) {
        timed("sig_compact") {
          val c = sigRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          c.localCheckpoint()
          c.count()
          sigBase.foreach(b => try b.unpersist(false) catch { case _: Throwable => })
          sigBase = Some(c)
          sigRdd = c
          sigRddEpochs = 0
        }
        resetSigProbe()
        sigWinnerCaches.foreach(d => try d.unpersist(false) catch { case _: Throwable => })
        sigWinnerCaches = Vector.empty
      }
    }

    // ---- full driver-side epoch (see the fast-path comment at the
    // frontierLocal declaration): admission runs through the Sequential
    // module — the exact code the differential oracle runs — fetch goes
    // through the Fetcher seam, parsing through the shared pure
    // parsePage, pages to the same parquet sink. Two Spark jobs per
    // epoch (fetch-collect + sink write), zero when nothing is admitted.
    def smallEpoch(all: Vector[FrontierEntry], candCount: Long, epochT0: Long): Unit = {
      import java.nio.charset.StandardCharsets
      val (readyV, heldV) = all.partition(_.not_before <= epoch)
      // B1 seen gate: driver mirror, else one tiny probe job. (B8 batch
      // dedup is structural — the local frontier is unique by lower(url)
      // by construction, like the distributed one.)
      val unseenV =
        if (driverSeen != null) readyV.filterNot(e => driverSeen.contains(UrlOps.lowerUtf8(e.url)))
        else {
          val present = probeSeenPresent(readyV.map(e => UrlOps.lowerUtf8(e.url)))
          readyV.filterNot(e => present.contains(UrlOps.lowerUtf8(e.url)))
        }
      // B2/B3/B4/B6 stateless gates; robots-blocked candidates counted for
      // the blocked side output (reference on_robots_blocked) — free here
      val listsPassV = unseenV.filter(e =>
        (config.whitelist.isEmpty || listedLocal(config.whitelist, e.url)) &&
          (config.blacklist.isEmpty || !listedLocal(config.blacklist, e.url)))
      val (robotsPassV, robotsBlockedV) =
        if (!config.respectRobotsTxt) (listsPassV, Vector.empty[FrontierEntry])
        else listsPassV.partition(e => robots.policyFor(e.host).canFetch(config.userAgent, e.url))
      val robotsBlockedCount = robotsBlockedV.size.toLong
      if (config.trackBlocked && robotsBlockedV.nonEmpty) {
        robotsBlockedV.foreach(e => blockedBuf += ((e.url, "robots", epoch.toLong)))
        if (blockedBuf.size >= CrawlEngine.blockedBufCap) flushBlockedBuf()
      }
      val gated0 = robotsPassV.filter { e =>
        config.depth <= 0 || UrlOps.pathDepth(e.url) <= depthDistance
      }
      // B9 politeness (shared walk — identical ledgers to the distributed
      // politenessStateDf computation)
      var polAdmitted = gated0
      var deferredV = Vector.empty[FrontierEntry]
      if (politenessPossible) {
        def delayOf(host: String): Long = {
          val rd = if (config.respectRobotsTxt) robots.politenessDelayMs(host, config.userAgent) else 0L
          math.max(math.max(config.delayMs, rd),
            Sequential.reactiveOverrideMs(config,
              Option(throttleOverrideMs.get(host)).map(_.longValue).getOrElse(0L),
              Option(latencyEma.get(host)).map(_.doubleValue)))
        }
        val (a, d) = Sequential.politenessAdmit(gated0, config, epoch, delayOf,
          h => Option(hostTokensMap.get(h)).map(_.longValue),
          (h, t) => hostTokensMap.put(h, Long.box(t)))
        polAdmitted = a; deferredV = d
      }
      // B7 budget (shared walk); chain-phase sitemap docs budget-exempt
      val (smExemptV, budgetableV) =
        if (chainStarted && chainSitemapLower.nonEmpty)
          polAdmitted.partition(e => chainSitemapLower.contains(UrlOps.lowerUtf8(e.url)))
        else (Vector.empty[FrontierEntry], polAdmitted)
      val br = Sequential.budgetAdmit(budgetableV, config, wildcardRemaining, pathBudget)
      wildcardRemaining = br.wildcardRemaining
      pathBudget = br.pathBudget
      if (br.budgetStopped) budgetStopped = true
      val admittedV = br.admitted ++ smExemptV
      val admittedCount = admittedV.size.toLong
      // bloom delta — keeps the broadcast group valid for a later
      // distributed epoch (same 1% FPP sizing rule as the fused builder)
      if (admittedV.nonEmpty) {
        val b = BloomFilter.create(math.max(1024L, candCount), 0.01)
        admittedV.foreach(e =>
          b.putBinary(UrlOps.lowerUtf8(e.url).getBytes(StandardCharsets.UTF_8)))
        val bos = new java.io.ByteArrayOutputStream()
        b.writeTo(bos)
        blooms :+= bos.toByteArray
      }
      // D4 salt hints for the NEXT epoch — free here, and crucial at the
      // small->distributed handoff: the first big epoch of a hot-host
      // crawl would otherwise fetch 50% of its rows through the default
      // 16-way spread (the distributed stats ride the fetch scan and so
      // always lag one epoch)
      hotHostWidths =
        if (admittedV.isEmpty) Map.empty
        else {
          val total = admittedV.size.toDouble
          val pNow = P
          topHotHosts(admittedV.groupBy(_.host)
            .map { case (h, es) => (h, math.ceil(es.size / total * 4 * pNow).toInt) }
            .filter(_._2 > 16))
        }
      // A3 fetch through the seam with D5 emission order (priority
      // emission, or host round-robin interleave when configured —
      // reference `UrlFrontier::pop` frontier.rs:78-121); results are
      // restored to admission order afterwards so the epoch-0 re-anchor
      // scan is deterministic
      val fetchOrderedV =
        if (config.roundRobin)
          admittedV.groupBy(_.host).values.toVector
            .flatMap(es => es.sorted(Sequential.hostOrder).zipWithIndex.map(_.swap))
            .sorted(Ordering.Tuple2(implicitly[Ordering[Int]], Sequential.hostOrder))
            .map(_._2)
        else admittedV.sorted(Sequential.hostOrder)
      val fetched0: Array[FetchResult] =
        if (admittedV.isEmpty) Array.empty
        else fetcher.fetchLocal(fetchOrderedV) match {
          // driver-local fast path (identical per-row semantics by the
          // Fetcher contract): a tiny epoch skips the fetch job entirely
          case Some(rs) => rs.toArray
          case None => fetcher.fetch(spark, spark.createDataset(fetchOrderedV)).collect()
        }
      val pos = admittedV.iterator.map(_.url).zipWithIndex.toMap
      val fetched = fetched0.sortBy(f => pos.getOrElse(f.url, Int.MaxValue))
      // B9 reactive signals: 429 Retry-After override + bucket drain;
      // latency EMA for the auto-throttle
      if (politenessPossible) {
        fetched.filter(f => f.f_status == 429 && f.f_retry_after_ms > 0)
          .groupBy(_.host).foreach { case (h, fs) =>
            throttleOverrideMs.put(h, Long.box(fs.map(_.f_retry_after_ms).max))
            hostTokensMap.put(h, Long.box(0L))
          }
        if (config.autoThrottle) {
          fetched.filter(_.f_latency_ms > 0).groupBy(_.host).foreach { case (h, fs) =>
            val avg = fs.map(_.f_latency_ms.toDouble).sum / fs.size
            val prev = latencyEma.get(h)
            latencyEma.put(h, Double.box(
              if (prev == null) avg
              else prev.doubleValue + config.autoThrottleAlpha * (avg - prev.doubleValue)))
          }
        }
      }
      // C7 retry ladder; retried URLs leave the seen set
      val (toRetry, keep) = fetched.partition(f =>
        retry.isRetryableStatus(f.f_status) && f.attempt < retry.maxAttempts)
      val retryV = toRetry.map(f => FrontierEntry(f.url, f.host, f.depth, f.discovery_seq,
        f.priority, f.attempt + 1, epoch + retry.backoffEpochsOf(f.attempt))).toVector
      val retriedLower = toRetry.iterator.map(f => UrlOps.lowerUtf8(f.url)).toSet
      val seenDeltaV = admittedV.iterator.map(e => (UrlOps.lowerUtf8(e.url), e.url))
        .filterNot(kv => retriedLower.contains(kv._1)).toVector
      if (driverSeen != null) {
        seenDeltaV.foreach(kv => driverSeen.add(kv._1))
        if (driverSeen.size > CrawlEngine.mirrorCap) dropMirrors()
      }
      seenCount += seenDeltaV.size
      if (seenDeltaV.nonEmpty) {
        val d = spark.sparkContext.parallelize(seenDeltaV, 1).partitionBy(seenPartitioner)
        seenRdd = spark.sparkContext.union(seenRdd, d)
        seenDeltaRdd = spark.sparkContext.union(seenDeltaRdd, d)
        seenRddEpochs += 1
      }
      // C6 scope re-anchor on epoch-0 cross-host redirect (canonical-min
      // winner, shared with the distributed path and the oracle)
      if (epoch == 0L) {
        val cands = keep.filter(f =>
          f.f_status == 200 && UrlOps.host(f.f_final_url) != scope.parentHost)
        if (cands.nonEmpty) {
          val w = cands.minBy(f => (f.depth, f.discovery_seq, f.host, f.url))(Sequential.keyOrder)
          scope = scope.copy(redirectHost = UrlOps.host(w.f_final_url))
        }
      }
      // C1-C4/C8 parse (shared pure function) + A7 page-sink delta
      val lrw = onLinkFind.orNull
      val sc = scope
      val ep = epoch
      val parsedV = keep.map(f => CrawlEngine.parsePage(f, sc, ep, lrw))
      if (parsedV.nonEmpty) {
        // buffered sink delta (one write job per pageBufCap rows, not per
        // epoch); every pages-view read flushes first
        pageBuf ++= parsedV
        if (pageBuf.size >= CrawlEngine.pageBufCap) flushPageBuf()
      }
      // B11 veto gates expansion of ordinary pages; chain-phase sitemap
      // docs bypass it (the reference parses sitemaps outside the page
      // veto channel)
      val afterVeto = onShouldCrawl match {
        case Some(veto) => parsedV.filter(veto)
        case None => parsedV
      }
      val vetoedCount = (parsedV.length - afterVeto.length).toLong
      if (config.trackBlocked && vetoedCount > 0) {
        val veto = onShouldCrawl.get
        parsedV.filterNot(veto).foreach(p => blockedBuf += ((p.url, "veto", epoch.toLong)))
        if (blockedBuf.size >= CrawlEngine.blockedBufCap) flushBlockedBuf()
      }
      if (sitemapChain && !chainStarted)
        CrawlEngine.accumulateDiscoveredSitemaps(discoveredSitemaps,
          parsedV.iterator.flatMap(_.sitemap_links).toSeq)
      var expandingV: Seq[ParsedPage] = Vector.empty
      if (chainStarted) {
        val smDocs = parsedV.filter(p =>
          p.status == 200 && chainSitemapLower.contains(UrlOps.lowerUtf8(p.url)))
        expandingV = smDocs.map(p => p.copy(links = p.links ++ p.sitemap_links)).toVector
        smDocs.flatMap(_.sitemap_links).foreach(u => chainSitemapLower += UrlOps.lowerUtf8(u))
      } else if (config.normalize) {
        // C5 signature dedup: canonical-first page per NEW signature
        val ok = afterVeto.filter(p => p.status == 200 && p.signature != 0L)
        val perSig = ok.groupBy(_.signature).map { case (s, ps) =>
          s -> ps.minBy(p => (p.depth, p.discovery_seq, p.host, p.url))(Sequential.keyOrder)
        }
        val newSigs: Set[Long] =
          if (driverSigs != null) perSig.keySet.filter(s => !driverSigs.contains(Long.box(s))).toSet
          else perSig.keySet.toSet -- probeSigsPresent(perSig.keySet.toSet)
        expandingV = newSigs.toVector.sorted.map(perSig) ++
          afterVeto.filter(p => p.status == 200 && p.signature == 0L)
        if (driverSigs != null) newSigs.foreach(s => driverSigs.add(Long.box(s)))
        if (newSigs.nonEmpty) {
          val d = spark.sparkContext.parallelize(newSigs.toSeq.map((_, true)), 1)
            .partitionBy(seenPartitioner)
          sigRdd = spark.sparkContext.union(sigRdd, d)
          sigDeltaRdd = spark.sparkContext.union(sigDeltaRdd, d)
          sigRddEpochs += 1
        }
      } else expandingV = afterVeto.filter(_.status == 200).toVector
      // C2/D1 links: explode, ci-dedup keep canonical-min, seen-filter
      // (r6: links to already-seen URLs are dropped BEFORE seq assignment —
      // mirrors the distributed path and the oracle; seq values compact but
      // canonical order is preserved), global seq
      val linksRaw = expandingV.flatMap(p =>
        p.links.zipWithIndex.map { case (u, idx) => (p.depth, p.discovery_seq, idx, u) })
      val uniq0 = linksRaw.groupBy(t => UrlOps.lowerUtf8(t._4)).values
        .map(_.min(Sequential.linkOrder)).toVector
      val uniq = {
        if (driverSeen != null) uniq0.filterNot(t => driverSeen.contains(UrlOps.lowerUtf8(t._4)))
        else {
          val present = probeSeenPresent(uniq0.map(t => UrlOps.lowerUtf8(t._4)))
          uniq0.filterNot(t => present.contains(UrlOps.lowerUtf8(t._4)))
        }
      }.sorted(Sequential.linkOrder)
      val newFrontierV = uniq.zipWithIndex.map { case ((pd, _, _, u), i) =>
        FrontierEntry(u, UrlOps.host(u), pd + 1, seqCounter + i,
          UrlOps.scoreUrl(u, pd + 1), 0, 0L)
      }
      seqCounter += uniq.size.toLong
      // D1 next frontier, case-insensitive dedup keep canonical-min
      frontierLocal = Some(CrawlEngine.dedupCanonicalMinLocal(
        heldV ++ deferredV ++ br.leftover ++ retryV ++ newFrontierV))
      val frontierCount = frontierLocal.get.size.toLong
      frontierCountPrev = frontierCount
      // store hygiene: with the mirrors gone the per-epoch probe jobs walk
      // the delta chains — compact on the usual cadence. With mirrors live
      // the chains stay lazy, but lineage and bloom generations still grow
      // one layer per epoch, so compact on a COARSER cadence (the fold is a
      // couple of tiny jobs every ~2x32 epochs — bounded lineage without
      // re-paying the per-epoch fixed costs this path exists to avoid)
      val smallCadence =
        if (driverSeen == null) math.max(2, config.stateCompactionEpochs)
        else math.max(32, config.stateCompactionEpochs)
      if (seenRddEpochs >= smallCadence) compactStores()
      metrics += EpochMetrics(epoch, candCount, admittedCount, admittedCount,
        uniq.size.toLong, frontierCount, seenCount, budgetStopped,
        (System.nanoTime() - epochT0) / 1000000L, robotsBlockedCount, vetoedCount)
      checkpoint.foreach(_.commit(epoch, frontierDf, seen, signatures, hostTokensDf(), pages,
        seqCounter, wildcardRemaining, pathBudget, scope, metrics.toSeq,
        chainStarted, chainSitemapLower.toSeq.sorted, discoveredSitemaps.values.toSeq))
      epoch += 1
      onEpoch.foreach(f => f(epoch - 1))
      done = budgetStopped || frontierCount == 0 || epoch >= config.maxEpochs ||
        shutdownRequested || System.nanoTime() > deadline
    }

    var crawling = true
    while (crawling) {
    while (!done) {
      // D9 pause (reference `handle_process` value 1, `website.rs:1839-1846`):
      // wall-clock wait between epochs; logical time frozen
      while (pauseRequested && !shutdownRequested && System.nanoTime() < deadline)
        Thread.sleep(20)

      // mid-crawl URL injection: drain the inbox into the frontier
      // (reference `dequeue`, `website.rs:7528-7562`)
      if (!inbox.isEmpty) {
        val drained = Iterator.continually(inbox.poll()).takeWhile(_ != null)
          .flatMap(u => Option(UrlOps.convertAbsPath(u, u))).toVector.distinct
        if (drained.nonEmpty) {
          val injectedV = drained.zipWithIndex.map { case (u, i) =>
            FrontierEntry(u, UrlOps.host(u), 0, seqCounter + i, UrlOps.scoreUrl(u, 0), 0, 0L)
          }.toVector
          seqCounter += drained.length
          // restore the frontier's unique-by-lower(url) invariant
          frontierLocal match {
            case Some(v) =>
              frontierLocal = Some(CrawlEngine.dedupCanonicalMinLocal(v ++ injectedV))
              frontierCountPrev = frontierLocal.get.size.toLong
            case None =>
              frontier = CrawlEngine.dedupCanonicalMin(
                frontier.unionByName(spark.createDataset(injectedV).toDF()))
                .localCheckpoint(true)
              readyHist = histOf(frontier)
              frontierCountPrev = readyHist.values.sum
          }
        }
      }

      // 0. candidates whose politeness/retry holdoff has passed
      val epochT0 = System.nanoTime()
      val candCount = frontierLocal match {
        case Some(v) =>
          if (holdsPossible) v.count(_.not_before <= epoch).toLong else v.size.toLong
        case None =>
          if (holdsPossible) readyHist.iterator.filter(_._1 <= epoch).map(_._2).sum
          else frontierCountPrev
      }

      if (candCount == 0) {
        // nothing ready this tick — advance logical time only
        epoch += 1
        onEpoch.foreach(f => f(epoch - 1))
        val frontierEmpty = frontierLocal.map(_.isEmpty).getOrElse(frontier.isEmpty)
        if (frontierEmpty || epoch >= config.maxEpochs ||
          shutdownRequested || System.nanoTime() > deadline) done = true
      } else if (frontierLocal.isDefined && candCount <= config.smallEpochThreshold)
        timed("epoch_total") {
        smallEpoch(frontierLocal.get, candCount, epochT0)
      } else timed("epoch_total") {
        if (frontierLocal.isDefined) {
          // candidate volume outgrew the fast path: materialize the
          // frontier and fall through to the distributed pipeline — the
          // driver mirrors go stale from here on, permanently
          frontier = spark.createDataset(frontierLocal.get).toDF().localCheckpoint(true)
          frontierLocal = None
          dropMirrors()
          readyHist = histOf(frontier)
          frontierCountPrev = readyHist.values.sum
        }
        val ready = if (holdsPossible) frontier.filter(col("not_before") <= lit(epoch)) else frontier
        val deferredHold = if (holdsPossible) frontier.filter(col("not_before") > lit(epoch))
          else spark.emptyDataset[FrontierEntry].toDF()
        // 1. B1 visited: bloom fast-negative (codegen expression over the
        //    broadcast filter group — no UDF on the hot path); the
        //    maybe-seen residue shuffles to the seen store's partitions
        //    where a per-partition exact set answers membership. The seen
        //    side is scanned in place — never re-shuffled, never broadcast.
        val withLower = ready.withColumn("url_lower", lower(col("url")))
        val bloomGroup = timed("bloom_bcast")(new BloomGroup(spark.sparkContext.broadcast(blooms)))
        val mightContain = enginefns.bloom_might_contain(col("url_lower"), bloomGroup)
        val definitelyNew = withLower.filter(!mightContain)
        val maybeSeen = withLower.filter(mightContain)
        val lowerIdx = withLower.schema.fieldIndex("url_lower")
        // co-partitioned exact probe (the round-4 A/B retired the round-2
        // broadcast gate: co-partition won at BOTH parallelism levels).
        // InternalRow through the probe shuffle (r6): `Dataset.rdd` built a
        // GenericRow per candidate and Java-serialized the object graph;
        // UnsafeRow.copy ships compact row bytes instead.
        val unseen = {
          val unseenMaybe = org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark,
            org.apache.spark.sql.GraftSqlBridge.internalRdd(maybeSeen)
              .map(r => (r.getUTF8String(lowerIdx).toString, r.copy()))
              .partitionBy(seenPartitioner)
              .zipPartitions(seenProbeRdd(), seenDeltaRdd) { (cit, pit, dit) =>
                val base: Array[AnyRef] =
                  if (pit.hasNext) pit.next().asInstanceOf[Array[AnyRef]]
                  else new Array[AnyRef](0)
                var delta: java.util.HashSet[String] = null
                while (dit.hasNext) {
                  if (delta == null) delta = new java.util.HashSet[String]()
                  delta.add(dit.next()._1)
                }
                cit.collect { case (k, r)
                  if java.util.Arrays.binarySearch(base, k) < 0 &&
                    (delta == null || !delta.contains(k)) => r }
              },
            withLower.schema)
          definitelyNew.unionByName(unseenMaybe)
        }

        // 2. B8 batch dedup (case-insensitive keep canonical-min, the
        //    frontier HashSet semantics `website.rs:7810`) is STRUCTURAL:
        //    the frontier is unique by lower(url) by construction (seeds
        //    ci-deduped, link agg keyed by lower(url), carryover union
        //    window), so the per-epoch dedup window round 1 ran here is a
        //    no-op shuffle — removed.

        // 3. stateless gates: lists, robots, depth. The robots-blocked side
        // output (reference on_robots_blocked) is opt-in here: the blocked
        // complement re-executes the lazy gate prefix once more, writing
        // its rows as a parquet delta (never a driver collect — blocked
        // URLs are data-scale on a robots-heavy crawl); the metric count
        // reads back the delta's footers
        val listsPass = listsGate(unseen.drop("url_lower").as[FrontierEntry])
        val robotsPass = robotsGate(listsPass)
        val robotsBlockedCount =
          if (config.trackBlocked && config.respectRobotsTxt) {
            val blockedRows = listsPass
              .filter(!enginefns.robots_can_fetch(col("host"), col("url"), robots, config.userAgent))
              .select(col("url"), lit("robots").as("reason"), lit(epoch.toLong).as("epoch"))
            sinkBlockedDelta(blockedRows, "robots")
          } else 0L
        val gated0 = depthGate(robotsPass, depthDistance).toDF()

        // 4. B9 politeness FIRST: per-host token-bucket quota, highest
        //    priority first (D5 top-k per host); non-admitted stay in the
        //    frontier. (The reference sleeps AFTER gating; a distributed
        //    deferral must re-gate, so politeness runs before the stateful
        //    budget to avoid double-charging deferred candidates.)
        val politenessOn = politenessPossible
        var polAdmitted = gated0
        var deferred = spark.emptyDataset[FrontierEntry].toDF()
        if (politenessOn) {
          // per-host effective delay (all codegen'd, no UDF):
          //   static config delay
          //   ∨ robots Crawl-delay ∨ Request-rate (expression; B9 + missing #4)
          //   ∨ reactive override (429 Retry-After throttle ∨ auto-throttle
          //     EMA; reference rate_limiter.rs:121-153 + auto_throttle.rs)
          var delayCol: org.apache.spark.sql.Column = lit(config.delayMs)
          if (config.respectRobotsTxt)
            delayCol = greatest(delayCol,
              enginefns.robots_delay_ms(col("host"), robots, config.userAgent))
          val tick = config.tickMs
          val withDelay = polAdmitted
            .join(broadcast(politenessStateDf()), Seq("host"), "left")
            .withColumn("__delay", greatest(delayCol, coalesce(col("override_ms"), lit(0L))))
            .drop("override_ms")
          // floor division: the sequential mirror banks INTEGRAL
          // milli-tokens (Long division); Spark `/` is double division and
          // would bank fractional permits that drift from the oracle at
          // non-divisible delays (e.g. 333.33/epoch vs 333)
          val avail = withDelay.withColumn("__permits",
              when(col("__delay") === 0, lit(Long.MaxValue / 4))
                .otherwise(floor(lit(tick) * 1000L / col("__delay"))))
            .withColumn("__avail",
              least(coalesce(col("tokens_milli"), lit(1000L)) + col("__permits"),
                greatest(lit(2000L), col("__permits") * 2)))
            // floor to integral admission (Spark `/` is double division;
            // the sequential mirror uses Long division — they must agree
            // for hosts whose effective delay exceeds tickMs, i.e. quota<1)
            .withColumn("__quota",
              least(floor(col("__avail") / lit(1000L)), lit(config.maxPerHostPerEpoch.toLong)))
          val hw = Window.partitionBy(col("host"))
            .orderBy(col("priority").desc, col("depth"), col("discovery_seq"), col("url"))
          // cache the ranked gate+politeness output: hostTokens, admitted,
          // and deferred all derive from it — without the cache the whole
          // gate DAG (bloom + seen joins + windows) recomputes 3-4x/epoch
          val rankedH = avail.withColumn("__hrn", row_number().over(hw))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          epochCache = Some(rankedH)
          val adm = rankedH.filter(col("__hrn") <= col("__quota"))
          deferred = rankedH.filter(col("__hrn") > col("__quota"))
            .select(col("url"), col("host"), col("depth"), col("discovery_seq"),
              col("priority"), col("attempt"), lit(epoch + 1).as("not_before"))
          // roll the per-host buckets forward: EVERY host present this epoch
          // banks `__avail − used·1000` (the bucket accrues even when it
          // admits nothing — a host at delay > tickMs earns a fractional
          // token per epoch and must bank it to admit on a later epoch;
          // round 2 persisted only admitting or quota==0 hosts, starving
          // sub-1-token-per-epoch hosts forever). ONE aggregate collect
          // updates the driver ledger (this also populates the rankedH
          // cache for every later consumer this epoch), BOUNDED at the
          // ledger's LRU capacity by per-epoch traffic (round-4 verdict
          // #2: the unbounded roll shipped one row per host per epoch —
          // millions of rows/epoch on a wide politeness-on crawl).
          // KNOWN RESIDUAL past the cap (r5 advice): a host already
          // resident in the LRU ledger that falls outside the top-traffic
          // cap this epoch keeps its stale (un-debited) balance instead of
          // being evicted-and-refreshed; with > lruHostCap (100k) distinct
          // hosts in ONE epoch it can over-admit by its stale tokens on a
          // later epoch. The reference's capped DashMap limiters drop
          // per-host state past their MAX_ENTRIES the same way; bounded
          // politeness error, never correctness of the page set.
          timed("tokens_roll")(rankedH.groupBy(col("host")).agg(
              max(col("__avail")).as("__a"),
              sum(when(col("__hrn") <= col("__quota"), 1L).otherwise(0L)).as("__used"),
              count(lit(1)).as("__n"))
            .orderBy(col("__n").desc, col("host")).limit(CrawlEngine.lruHostCap)
            .collect()
            .foreach(r => hostTokensMap.put(r.getString(0),
              Long.box(r.getLong(1) - r.getLong(2) * 1000L))))
          polAdmitted = adm.select(col("url"), col("host"), col("depth"), col("discovery_seq"),
            col("priority"), col("attempt"), col("not_before"))
        }

        // 5. B7 budget admission in canonical order (deterministic — the
        //    reference decrements counters sequentially; we replay that
        //    order exactly; see SURVEY D6/B7)
        var admitted = polAdmitted
        var budgetLeftover = spark.emptyDataset[FrontierEntry].toDF()
        if (config.wildCardBudgeting || pathBudget.nonEmpty) {
          // chain phase: the sitemap DOCUMENTS are admitted budgetless
          // (`is_allowed_budgetless`, `website.rs:11716-11722`); their
          // entries consume budget normally
          val smExempt = chainStarted && chainSitemapLower.nonEmpty
          val exemptCond =
            if (smExempt) lower(col("url")).isInCollection(chainSitemapLower.toSeq) else lit(false)
          val budgeted = if (smExempt) polAdmitted.filter(!exemptCond) else polAdmitted
          val ranked = withGlobalSeq(budgeted, canonicalOrder, "__grank", 0L).localCheckpoint(true)
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
            // per-key admission in accumulated-segment order; outer keys
            // consume before inner ones reject (walk order
            // `website.rs:2085-2115`). No window: round 2 partitioned a
            // row_number window on a BOOLEAN match flag, funnelling every
            // matching candidate in the epoch through one task. Instead the
            // rem-th match's global cutoff rank is derived from
            // per-partition match counts (partitions are __grank ranges,
            // courtesy of withGlobalSeq's range partitioning) plus one
            // boundary-partition scan — admission is then a pure filter.
            val keys = pathBudget.keys.toSeq.sortBy(_.length)
            var cur = alive.withColumn("__prefixes", graft.url.urlfns.budget_prefixes(col("url")))
            for (k <- keys) {
              val rem = pathBudget(k)
              val matches = cur.withColumn("__m", array_contains(col("__prefixes"), k))
              // InternalRow scans: two primitive columns, no Row bridge
              val flags = org.apache.spark.sql.GraftSqlBridge
                .internalRdd(matches.select(col("__m"), col("__grank")))
              val perPart = flags.mapPartitionsWithIndex { (i, it) =>
                var n = 0L
                it.foreach(r => if (r.getBoolean(0)) n += 1)
                Iterator.single((i, n))
              }.collect().sortBy(_._1).map(_._2)
              val total = perPart.sum
              if (total <= rem) {
                pathBudget = pathBudget.updated(k, rem - total)
                cur = matches.drop("__m")
              } else {
                val cums = perPart.scanLeft(0L)(_ + _) // cums(p) = matches before partition p
                val pStar = cums.indexWhere(_ > rem) - 1 // partition holding the first rejected match
                val allowance = rem - cums(pStar)
                val cutoff = flags.mapPartitionsWithIndex { (i, it) =>
                  if (i != pStar) Iterator.empty
                  else {
                    var seen = 0L
                    it.flatMap { r =>
                      if (!r.getBoolean(0)) None
                      else { seen += 1; if (seen == allowance + 1) Some(r.getLong(1)) else None }
                    }
                  }
                }.collect().head // one job; take(1) would probe partitions incrementally
                pathBudget = pathBudget.updated(k, 0L)
                cur = matches.filter(!col("__m") || col("__grank") < lit(cutoff)).drop("__m")
              }
            }
            alive = cur.drop("__prefixes")
          }
          admitted =
            if (smExempt) alive.drop("__grank").unionByName(polAdmitted.filter(exemptCond))
            else alive.drop("__grank")
        }

        // 6. mark admitted as seen (insert at admission, `insert_link`
        //    `website.rs:1718-1749`). The persisted admitted set doubles as
        //    the seen-delta backing store; the bloom/count/hot-host stats
        //    ride the fetch job's own scan (withAdmitStats) — no dedicated
        //    job at all.
        val admittedDs = admitted.as[FrontierEntry]
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val admitAcc = spark.sparkContext
          .collectionAccumulator[AdmitStat]("graft.admitStats")
        val newSeen = admittedDs.select(lower(col("url")).as("url_lower"), col("url"))

        // 7+9. fetch + parse — priority-queue emission (repartition by host,
        //    secondary sort desc priority/depth/seq/url, north rule D5) then
        //    one-pass span parse, PIPELINED in a single stage and
        //    materialized once. (Epoch 0 splits the stage because the C6
        //    scope re-anchor must read the seed fetch result before link
        //    extraction — `modify_selectors` `page.rs:4736-4747`.)
        // host-hash partitioning WITH salt (north rule D4): a hot host that
        // dominates the frontier would otherwise pin one task; the salt
        // width scales with the host's admitted share this epoch (see
        // admitCountAndBloom) — cold hosts keep a 16-way spread (affinity),
        // hot hosts fan out toward 4P.
        // Politeness quotas were already enforced upstream, so fetch order
        // within a salt shard is pure priority emission — unless
        // `roundRobin` (D5, reference `UrlFrontier::pop` frontier.rs:78-121):
        // then hosts interleave (every host's k-th URL precedes any host's
        // (k+1)-th within a shard).
        val fetchReady = timed("fetch_plan") {
          val base =
            if (config.roundRobin) {
              val rrW = Window.partitionBy(col("host"))
                .orderBy(col("priority").desc, col("depth"), col("discovery_seq"), col("url"))
              admittedDs.withColumn("__rr", row_number().over(rrW))
            } else admittedDs.toDF().withColumn("__rr", lit(0))
          val saltWidth: org.apache.spark.sql.Column =
            if (hotHostWidths.isEmpty) lit(16L)
            else hotHostWidths.foldLeft(`when`(lit(false), lit(16L))) {
              case (acc, (h, w)) => acc.when(col("host") === lit(h), lit(w.toLong))
            }.otherwise(lit(16L))
          withAdmitStats(base, candCount, admitAcc)
            .repartition(math.max(1, P), col("host"), pmod(xxhash64(col("url")), saltWidth))
            .sortWithinPartitions(col("__rr"), col("priority").desc, col("depth"),
              col("discovery_seq"), col("url"))
            .drop("__rr")
            .as[FrontierEntry]
        }
        // Pages SINK to parquet per epoch (A7, north rule: parsed documents
        // land in tables, never in executor memory). Round 1 localCheckpointed
        // every full ParsedPage (spans + links, multiple KB each) through the
        // block manager — at 10^6 pages/epoch that is gigabytes of live heap
        // objects and the single biggest stall. Every downstream consumer
        // (retry filter, signature dedup, link explode, pages view) is a
        // COLUMN-PRUNED scan of the delta file instead.
        val ep = epoch
        val parsedPath = s"$pagesSink/epoch=$epoch"
        if (epoch == 0L) {
          val fetched = fetcher.fetch(spark, fetchReady).localCheckpoint(true) // seeds: tiny
          val ph = scope.parentHost
          // canonical-min winner — identical on the distributed path, the
          // fast path, and the oracle (partition order would not be)
          val redirHosts = fetched
            .filter(f => f.f_status == 200 && UrlOps.host(f.f_final_url) != ph)
            .orderBy(col("depth"), col("discovery_seq"), col("host"), col("url"))
            .map(_.f_final_url).take(1)
          if (redirHosts.nonEmpty) scope = scope.copy(redirectHost = UrlOps.host(redirHosts.head))
          val sc = scope
          val lrw = onLinkFind.orNull
          fetched.mapPartitions(it => it.map(f => CrawlEngine.parsePage(f, sc, ep, lrw)))
            .write.parquet(parsedPath)
        } else {
          val sc = scope
          val lrw = onLinkFind.orNull
          // delta files are transient working state (read back once, column-
          // pruned); skip the codec — on node-local disk the compression CPU
          // costs more than the bytes it saves
          timed("fetch_parse")(fetcher.fetch(spark, fetchReady)
            .mapPartitions(it => it.map(f => CrawlEngine.parsePage(f, sc, ep, lrw)))
            .write.option("compression", "none")
            .option("parquet.enable.dictionary", "false")
            .parquet(parsedPath))
        }
        val parsed: Dataset[ParsedPage] = timed("parsed_read")(
          spark.read.schema(CrawlEngine.parsedSchema).parquet(parsedPath).as[ParsedPage])
        // the fetch job has materialized — collect the ride-along stats
        // (delta count, bloom shards, next epoch's hot-host salt widths)
        val admittedCount =
          timed("admit_drain")(drainAdmitStats(admitAcc, admittedDs, candCount))

        // reactive throttling (B9): 429 Retry-After reduces the host's rate
        // (reference `DomainRateLimiter::throttle` rate_limiter.rs:121-137 —
        // delay := Retry-After, bucket drained); latency EMA feeds the
        // auto-throttle (auto_throttle.rs: delay ≈ ema/target_concurrency)
        if (politenessOn) {
          // ONE per-host aggregate feeds both reactive signals. Collected
          // rows are BOUNDED (round-3 verdict #8): with auto-throttle off,
          // only hosts that actually returned a 429 reach the driver; with
          // it on, the collect caps at the ledger's LRU capacity by
          // per-epoch traffic (hosts beyond it would be evicted anyway)
          def sigAgg(base: DataFrame) = base.groupBy(col("host")).agg(
            max(when(col("status") === 429, col("retry_after_ms")).otherwise(lit(0L))).as("__ra"),
            avg(when(col("latency_ms") > 0, col("latency_ms").cast("double"))).as("__l"),
            count(lit(1)).as("__n"))
          val throttled = parsed.toDF().filter(col("status") === 429 && col("retry_after_ms") > 0)
          // EMA rows capped by top traffic; 429 overrides NEVER capped (a
          // throttling host must be honored regardless of rank). A host
          // past the cap contributes ONLY its Retry-After override: its
          // available aggregate averages latency over 429 rows alone,
          // which diverges from the all-rows average in-cap hosts and the
          // oracle use — so beyond-cap hosts skip the EMA update entirely
          // (round-4 advice) rather than feed it a biased sample.
          val emaRows: Array[Row] =
            if (!config.autoThrottle) Array.empty
            else sigAgg(parsed.toDF())
              .orderBy(col("__n").desc, col("host")).limit(CrawlEngine.lruHostCap).collect()
          val haveEma = emaRows.iterator.map(_.getString(0)).toSet
          val signals = emaRows ++ sigAgg(throttled).collect()
            .filterNot(r => haveEma.contains(r.getString(0)))
          val drained = signals.filter(_.getLong(1) > 0)
          drained.foreach { r =>
            throttleOverrideMs.put(r.getString(0), Long.box(r.getLong(1)))
            hostTokensMap.put(r.getString(0), Long.box(0L)) // bucket drained
          }
          if (config.autoThrottle) {
            val alpha = config.autoThrottleAlpha
            emaRows.filter(!_.isNullAt(2)).foreach { r =>
              val h = r.getString(0); val l = r.getDouble(2)
              val prev = latencyEma.get(h)
              val next = if (prev == null) l else prev.doubleValue + alpha * (l - prev.doubleValue)
              latencyEma.put(h, Double.box(next))
            }
          }
        }

        // 8. C7 retry ladder (pluggable RetryPolicy; default = the
        //    reference's 5xx/429/408 + capped exponential backoff ladder,
        //    `website.rs:8388-8392`): retryable statuses re-queue with
        //    backoff and are REMOVED from seen (`website.rs:8663-8666`)
        val isRetried = retry.isRetryable(col("status")) && col("attempt") < retry.maxAttempts
        val retryDf = parsed.toDF().filter(isRetried)
          .select(col("url"), col("host"), col("depth"), col("discovery_seq"),
            col("priority"), (col("attempt") + 1).as("attempt"),
            (lit(epoch) + retry.backoffEpochs(col("attempt"))).as("not_before"))
        // with retries disabled, nothing is ever removed from seen — skip
        // the anti-join and the extra count (delta size == admitted count)
        val seenDelta = if (retry.maxAttempts > 0)
          newSeen.join(retryDf.select(lower(col("url")).as("url_lower")),
            Seq("url_lower"), "left_anti")
        else newSeen

        // pages delta already sits in the sink (the pages view reads the
        // whole directory and re-applies the retried filter)
        pagesWritten = true

        // append the epoch's seen delta CO-PARTITIONED, BEFORE link
        // processing (r6): the link pipeline's seen-filter must observe the
        // COMPLETE seen set including this epoch's admissions (minus
        // retried), exactly like the next epoch's gate would. Map side runs
        // once (shuffle files reused by every later probe), union is
        // partitioner-aware (no data movement of the base).
        val deltaRdd = if (retry.maxAttempts > 0) {
          val seenDeltaCk = timed("seen_ckpt")(seenDelta.localCheckpoint(true))
          seenCount += seenDeltaCk.count()
          // every consumer of the admitted cache (bloom, fetch, seen delta)
          // has materialized — release it NOW (leaving one cached plan per
          // epoch alive OOMs the driver on multi-hundred-epoch crawls)
          admittedDs.unpersist(false)
          seenDeltaCk.rdd.map(r => (r.getString(0), r.getString(1)))
        } else {
          // lazy delta over the persisted admitted set — zero extra jobs
          seenCount += admittedCount
          admittedCaches :+= admittedDs
          timed("seen_reroot")(seenDelta.rdd).map(r => (r.getString(0), r.getString(1)))
        }
        val seenDeltaPart = deltaRdd.partitionBy(seenPartitioner)
        seenRdd = spark.sparkContext.union(seenRdd, seenDeltaPart)
        seenDeltaRdd = spark.sparkContext.union(seenDeltaRdd, seenDeltaPart)
        seenRddEpochs += 1

        // 10. C5 signature dedup: only the canonical-first page per NEW
        //     signature expands links; seen signatures expand nothing
        //     (`website.rs:8671-8683`). Winners are computed as a SKINNY
        //     hash-aggregate (map-side partial) — full page rows (spans,
        //     links) never shuffle for signature dedup; the winner set
        //     semi-joins back (AQE picks broadcast when small).
        var expanding = (onShouldCrawl match {
          case Some(veto) => parsed.filter(veto) // B11: vetoed pages don't expand
          case None => parsed
        }).toDF()
        val vetoedCount =
          if (config.trackBlocked && onShouldCrawl.isDefined) {
            // rows over NON-retried pages only, matching the fast path
            // (a retried page re-parses on its retry epoch); written as a
            // parquet delta, counted from the delta
            val live = !(retry.isRetryable(col("status")) && col("attempt") < retry.maxAttempts)
            val veto = onShouldCrawl.get
            val vetoedRows = parsed.filter(live).filter(p => !veto(p))
              .toDF().select(col("url"), lit("veto").as("reason"), lit(epoch.toLong).as("epoch"))
            sinkBlockedDelta(vetoedRows, "veto")
          } else 0L
        if (sitemapChain && !chainStarted) {
          // rel=sitemap auto-discovery (one tiny extra job per epoch,
          // only when the caller requested the chain; ads are distinct
          // sitemap DOCS, so the collect is bounded by the cap).
          // Case-insensitive keep-first (min = UTF-8-first variant per
          // lowercase key) BEFORE the cap, so the truncation applies the
          // same rule as accumulateDiscoveredSitemaps and the small path —
          // a >cap advertised set with case-duplicate URLs previously
          // could truncate to a different set than the oracle (r5 advice).
          val ads = parsed.toDF()
            .select(explode(col("sitemap_links")).as("__u"))
            .groupBy(lower(col("__u")).as("__k")).agg(min(col("__u")).as("__u"))
            .orderBy(col("__u")).limit(CrawlEngine.maxDiscoveredSitemaps)
            .select(col("__u")).as[String].collect()
          CrawlEngine.accumulateDiscoveredSitemaps(discoveredSitemaps, ads.toSeq)
        }
        if (chainStarted) {
          // chain phase: ONLY sitemap docs expand — their <loc> entries
          // plus recursive <sitemapindex> locs; entry pages are recorded
          // but never expanded ("does not re-crawl the links of the pages
          // found on the sitemap", `website.rs:11601`). The sitemap XML
          // bypasses BOTH signature dedup AND the B11 veto (the reference
          // parses sitemaps outside the page channel — the veto governs
          // page-link expansion only), so expansion derives from `parsed`,
          // not the veto-filtered stream — mirroring the oracle.
          val isSm = lower(col("url")).isInCollection(chainSitemapLower.toSeq)
          val nested = parsed.toDF().filter(isSm)
            .select(explode(col("sitemap_links")).as("u")).as[String].collect()
          expanding = parsed.toDF().filter(col("status") === 200 && isSm)
            .withColumn("links", concat(col("links"), col("sitemap_links")))
          chainSitemapLower ++= nested.map(UrlOps.lowerUtf8)
        } else if (config.normalize) {
          val sigOk = expanding.filter(col("status") === 200 && col("signature") =!= 0L)
          val sigKey = struct(col("depth"), col("discovery_seq"), col("host"), col("url"))
          val cands = sigOk.select(col("signature"), sigKey.as("__k"))
            .groupBy(col("signature")).agg(min(col("__k")).as("__k"))
          // probe the co-partitioned signature store: only the epoch's
          // candidate signatures shuffle; the store is scanned in place
          // (round 2 broadcast the candidate set AND its hits)
          val candsSchema = cands.schema
          // InternalRow probe shuffle (r6) — same rationale as the seen gate
          val newWinners = timed("sig_reroot")(
            org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark,
              org.apache.spark.sql.GraftSqlBridge.internalRdd(cands)
                .map(r => (r.getLong(0), r.copy()))
                .partitionBy(seenPartitioner)
                .zipPartitions(sigProbeRdd(), sigDeltaRdd) { (cit, pit, dit) =>
                  val base = if (pit.hasNext) pit.next() else Array.emptyLongArray
                  var delta: java.util.HashSet[java.lang.Long] = null
                  while (dit.hasNext) {
                    if (delta == null) delta = new java.util.HashSet[java.lang.Long]()
                    delta.add(Long.box(dit.next()._1))
                  }
                  cit.collect { case (k, r)
                    if java.util.Arrays.binarySearch(base, k) < 0 &&
                      (delta == null || !delta.contains(Long.box(k))) => r }
                }, candsSchema)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          sigWinnerCaches :+= newWinners
          val firstPerSig = sigOk.withColumn("__k", sigKey)
            .join(newWinners, Seq("signature", "__k"), "left_semi").drop("__k")
          // delta append: lazy over the persisted winners, partitioner-aware;
          // ONE shuffled instance feeds both the store and the probe delta
          val sigDeltaPart = newWinners.rdd.map(r => (r.getLong(0), true))
            .partitionBy(seenPartitioner)
          sigRdd = spark.sparkContext.union(sigRdd, sigDeltaPart)
          sigDeltaRdd = spark.sparkContext.union(sigDeltaRdd, sigDeltaPart)
          sigRddEpochs += 1
          expanding = firstPerSig.unionByName(
            expanding.filter(col("status") === 200 && col("signature") === 0L))
        } else {
          expanding = expanding.filter(col("status") === 200)
        }

        // 11. explode links; case-insensitive dedup as a map-side-combining
        //     hash aggregate keyed by lower(url) keeping the canonical-min
        //     (p_depth, p_seq, pos, url) — replaces round 1's window over
        //     every raw link row (full shuffle, no combine). Then (r6)
        //     SEEN-FILTER the deduped set — bloom fast-negative split, exact
        //     co-partitioned probe for the residue — BEFORE the range sort:
        //     at steady-state fanout most link targets are already seen, so
        //     the canonical sort/seq machinery, the frontier checkpoint, and
        //     the next epoch's gate previously all carried rows whose only
        //     fate was to be discarded by that gate (round-5 verdict #1: the
        //     links phase was the N->4N scale-killer at 1.04x). The epoch's
        //     own seen delta was appended above and drainAdmitStats already
        //     merged this epoch's bloom shards, so the filter sees exactly
        //     the seen set the next epoch's gate would. Then assign
        //     deterministic discovery_seq by global sort over the SURVIVORS
        //     (seq values compact vs pre-r6 but every pairwise canonical
        //     order relation is preserved — admission decisions and page
        //     rows are unchanged; oracle + small path mirror this).
        val linksRaw = timed("links_plan")(expanding
          .select(col("depth").as("p_depth"), col("discovery_seq").as("p_seq"),
            posexplode(col("links")).as(Seq("pos", "url"))))
        val uniq0 = linksRaw
          .groupBy(lower(col("url")).as("__lu"))
          .agg(min(struct(col("p_depth"), col("p_seq"), col("pos"), col("url"))).as("__m"))
          .select(col("__m.p_depth").as("p_depth"), col("__m.p_seq").as("p_seq"),
            col("__m.pos").as("pos"), col("__m.url").as("url"))
        val sortCols = Seq(col("p_depth"), col("p_seq"), col("pos"), col("url"))
        val parts = math.max(1, math.min(P, 200))
        var newFrontier = spark.emptyDataset[FrontierEntry].toDF()
        var newLinkCount = 0L
        var uniqCk: Option[DataFrame] = None
        if (config.smallEpochThreshold > 0 && admittedCount <= config.smallEpochThreshold) {
          // tiny epoch: dedup output is at most admitted×fanout rows —
          // dedup + canonical order + seq assignment complete in ONE
          // driver job plus one tiny probe (identical order to the
          // distributed path; the two-pass range machinery costs ~4 driver
          // barriers that dwarf milliseconds of actual work at this size)
          val rows0 = timed("links_seq")(uniq0.collect())
            .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3)))
          val present = probeSeenPresent(rows0.map(t => UrlOps.lowerUtf8(t._4)).toSeq)
          val rows = rows0.filterNot(t => present.contains(UrlOps.lowerUtf8(t._4)))
            .sorted(Sequential.linkOrder) // UTF-8 byte order = the distributed path's UTF8String order
          newLinkCount = rows.length
          if (rows.nonEmpty) {
            val entries = rows.zipWithIndex.map { case ((pd, _, _, u), i) =>
              FrontierEntry(u, UrlOps.host(u), pd + 1, seqCounter + i,
                UrlOps.scoreUrl(u, pd + 1), 0, 0L)
            }
            newFrontier = spark.createDataset(entries.toIndexedSeq).toDF()
          }
        } else {
        // persist the deduped link set BEFORE the seen split + range
        // exchange: both the bloom split's two consumers and the range
        // partitioner's sampling job would otherwise recompute the whole
        // explode+aggregate upstream (the epoch's widest pipeline); the
        // deduped set is ~fanout× smaller
        val uniqP = uniq0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        uniqCk = Some(uniqP)
        // InternalRow end-to-end (round-3 verdict #2, extended by the r6
        // seen split): `Dataset.rdd` would deserialize every link row to a
        // GenericRow (two String allocs) and Java-serialize the object
        // graph through the probe shuffle — `toRdd` + UnsafeRow.copy ships
        // compact row bytes, and the count/seq jobs reuse the same stable
        // RDD instance (shuffle files reused).
        val sortedRdd = timed("links_tordd") {
          val withLu = uniqP.withColumn("__lu", lower(col("url")))
          val linkBloom = new BloomGroup(spark.sparkContext.broadcast(blooms))
          val mightContain = enginefns.bloom_might_contain(col("__lu"), linkBloom)
          val definitelyNew = withLu.filter(!mightContain)
          val maybeSeenLinks = withLu.filter(mightContain)
          val luIdx = withLu.schema.fieldIndex("__lu")
          val unseenMaybe = org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark,
            org.apache.spark.sql.GraftSqlBridge.internalRdd(maybeSeenLinks)
              .map(r => (r.getUTF8String(luIdx).toString, r.copy()))
              .partitionBy(seenPartitioner)
              .zipPartitions(seenProbeRdd(), seenDeltaRdd) { (cit, pit, dit) =>
                val base: Array[AnyRef] =
                  if (pit.hasNext) pit.next().asInstanceOf[Array[AnyRef]]
                  else new Array[AnyRef](0)
                var delta: java.util.HashSet[String] = null
                while (dit.hasNext) {
                  if (delta == null) delta = new java.util.HashSet[String]()
                  delta.add(dit.next()._1)
                }
                cit.collect { case (k, r)
                  if java.util.Arrays.binarySearch(base, k) < 0 &&
                    (delta == null || !delta.contains(k)) => r }
              },
            withLu.schema)
          val survivors = definitelyNew.unionByName(unseenMaybe).drop("__lu")
          val sorted = survivors
            .repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
          org.apache.spark.sql.GraftSqlBridge.internalRdd(sorted) // stable instance: shuffle reused by the frontier job
        }
        val partCounts = timed("links_seq")(sortedRdd.mapPartitionsWithIndex { (i, it) =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single((i, n))
        }.collect().sortBy(_._1).map(_._2))
        newLinkCount = partCounts.sum
        if (newLinkCount > 0) {
          val offsets = partCounts.scanLeft(seqCounter)(_ + _)
          // survivors schema == the deduped link schema (the __lu split
          // column is dropped before the range sort)
          val schema = uniqP.schema.add("__seq", LongType, nullable = false)
          val withSeq = sortedRdd.mapPartitionsWithIndex { (i, it) =>
            var k = offsets(i)
            val seqCell = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
            val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
            // rows are consumed one-at-a-time by the downstream codegen
            // projection, so reusing the Joined/seq cells is safe
            it.map { r =>
              seqCell.update(0, k); k += 1
              joined(r, seqCell): org.apache.spark.sql.catalyst.InternalRow
            }
          }
          val seqd = org.apache.spark.sql.GraftSqlBridge
            .internalCreateDataFrame(spark, withSeq, schema)
          import graft.url.urlfns._
          newFrontier = seqd.select(
            col("url"),
            url_host(col("url")).as("host"),
            (col("p_depth") + 1).as("depth"),
            col("__seq").as("discovery_seq"),
            score_url(col("url"), col("p_depth") + 1).as("priority"),
            lit(0).as("attempt"),
            lit(0L).as("not_before"))
        }
        }
        seqCounter += newLinkCount

        // 12. next frontier = politeness-deferred ∪ retries ∪ new links,
        //     case-insensitive-deduped (D1) as a map-side-combining hash
        //     aggregate keeping the canonical-min row (struct-min over the
        //     canonical-order-prefixed struct — a window would shuffle and
        //     sort every row; the aggregate combines duplicates before the
        //     exchange). New links are already seen-filtered (r6), so the
        //     next epoch's gate probes only carryover entries and bloom
        //     false positives. Without carryover streams the new-link set
        //     IS the next frontier (already unique) — no dedup, no count job.
        frontier =
          if (carryover) {
            val nextFrontierAll = deferredHold.unionByName(deferred)
              .unionByName(budgetLeftover)
              .unionByName(retryDf).unionByName(newFrontier)
            timed("frontier_ckpt")(CrawlEngine.dedupCanonicalMin(nextFrontierAll)
              .localCheckpoint(true))
          } else timed("frontier_ckpt")(newFrontier.localCheckpoint(true))
        uniqCk.foreach(_.unpersist(false)) // frontier materialized — release the link cache
        readyHist = if (carryover) histOf(frontier) else Map(0L -> newLinkCount)
        val frontierCount = readyHist.values.sum
        frontierCountPrev = frontierCount

        if (seenRddEpochs >= math.max(2, config.stateCompactionEpochs)) compactStores()

        metrics += EpochMetrics(epoch, candCount, admittedCount, admittedCount,
          newLinkCount, frontierCount, seenCount, budgetStopped,
          (System.nanoTime() - epochT0) / 1000000L, robotsBlockedCount, vetoedCount)

        checkpoint.foreach(_.commit(epoch, frontier, seen, signatures, hostTokensDf(), pages,
          seqCounter, wildcardRemaining, pathBudget, scope, metrics.toSeq,
          chainStarted, chainSitemapLower.toSeq.sorted, discoveredSitemaps.values.toSeq))

        epochCache.foreach(_.unpersist(false))
        epochCache = None
        epoch += 1
        onEpoch.foreach(f => f(epoch - 1))
        done = budgetStopped || frontierCount == 0 || epoch >= config.maxEpochs ||
          shutdownRequested || System.nanoTime() > deadline
      }
    }

    // --- A6: sitemap CHAINED AFTER the crawl (reference `crawl()` runs
    // `crawl_concurrent` then `sitemap_crawl_chain`, `website.rs:6974-6976`)
    // — under a budget the crawl spends first and an exhausted wildcard
    // skips the chain entirely (`is_over_wild_budget`, `website.rs:11654`).
    // Each seed's /sitemap.xml is injected through the inbox (full gate:
    // seen/lists/robots — `is_allowed_budgetless`); chain epochs then run
    // under the ordinary loop with two rule changes keyed off
    // `chainSitemapLower`: sitemap docs are budget-exempt, and ONLY sitemap
    // docs expand (urlset entries + recursive sitemapindex locs).
    if (sitemapChain && !chainStarted && !budgetStopped && !shutdownRequested &&
        System.nanoTime() < deadline && epoch < config.maxEpochs) {
      chainStarted = true
      // seeds' configured sitemap URL + page-advertised discoveries, in
      // deterministic order; canonicalized, stored lowercased with the
      // SAME mapping the Spark lower() probes apply (UTF8String.toLowerCase)
      val sms = {
        val dedup = scala.collection.mutable.Set.empty[String]
        (seedSitemapUrls ++ discoveredSitemaps.values)
          .filter(u => dedup.add(UrlOps.lowerUtf8(u)))
      }
      if (sms.nonEmpty) {
        chainSitemapLower ++= sms.map(UrlOps.lowerUtf8)
        sms.foreach(inbox.add)
        done = false
      } else crawling = false
    } else crawling = false
    }

    val finalPages = // the sitemap XML itself is parsed, never emitted as a page
      if (chainSitemapLower.isEmpty) pages
      else pages.filter(!lower(col("url")).isInCollection(chainSitemapLower.toSeq))
    CrawlResult(finalPages, seen, frontierDf, metrics.toSeq, epoch, blockedDf)
  }
}

object CrawlEngine {

  /** Cap on the driver-side seen/signature mirrors of the small-epoch fast
    * path; past it the mirrors drop and the gate falls back to tiny probe
    * jobs against the distributed stores. A var so the fallback is testable
    * at toy scale.
    */
  @volatile private[engine] var mirrorCap: Int = 1 << 20

  /** Capacity of every driver-side per-host ledger (token buckets, 429
    * overrides, latency EMAs) AND the cap on each ledger's per-epoch
    * feeding collect: rows beyond it (ranked by per-epoch traffic) would
    * be evicted on insert anyway, so capping the collect bounds driver
    * traffic at any host cardinality without changing ledger contents.
    * A var so the cap + eviction path is testable at toy scale.
    */
  @volatile private[engine] var lruHostCap: Int = 100000

  /** Cap on sitemap auto-discovery (bounds the per-epoch distributed
    * collect and the driver-side set; distinct sitemap DOCUMENTS, never
    * pages, so 10k covers any real site fleet).
    */
  private[engine] val maxDiscoveredSitemaps = 10000

  /** A6 — sitemap auto-discovery accumulation (reference `link[rel=
    * sitemap]`, `website.rs:12512`): page-advertised sitemap URLs join the
    * chain. ONE deterministic rule shared verbatim by both engine paths
    * and the oracle — per epoch the advertised set is UTF-8-sorted before
    * case-insensitive keep-first insertion, so injection order (and hence
    * the sitemap docs' discovery_seq) never depends on fetch iteration
    * order.
    */
  private[graft] def accumulateDiscoveredSitemaps(
      acc: scala.collection.mutable.LinkedHashMap[String, String],
      epochLinks: Seq[String]): Unit = {
    epochLinks.distinct.sorted(Sequential.utf8Ordering).foreach { u =>
      val k = graft.url.UrlOps.lowerUtf8(u)
      if (acc.size < maxDiscoveredSitemaps && !acc.contains(k)) acc.put(k, u)
    }
  }

  /** D4 — deterministic hot-host salt selection: keep the 64 WIDEST hints
    * (width desc, host asc tiebreak). A bare `.take(64)` on the unordered
    * Map kept a hash-iteration-arbitrary 64 whenever more qualified, so
    * which hosts got salted was stable per run but not the hottest
    * (round-4 verdict #6 — perf skew, never correctness).
    */
  private[engine] def topHotHosts(widths: Iterable[(String, Int)]): Map[String, Int] =
    widths.toSeq.sortBy { case (h, w) => (-w, h) }.take(64).toMap

  /** Driver-side mirror of [[dedupCanonicalMin]]: case-insensitive frontier
    * dedup keeping the canonical-min entry, keyed by the same
    * UTF8String-lowercase mapping the distributed aggregate's `lower()`
    * applies.
    */
  def dedupCanonicalMinLocal(frontier: Vector[graft.model.FrontierEntry]): Vector[graft.model.FrontierEntry] =
    frontier.groupBy(e => graft.url.UrlOps.lowerUtf8(e.url)).values
      .map(_.min(Sequential.canonical)).toVector

  /** Static ParsedPage schema — handed to every delta read so no per-epoch
    * footer-inference job runs.
    */
  val parsedSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[ParsedPage].schema

  /** Schema of the blocked side-output table (B11 parity). */
  val blockedSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("url", StringType), StructField("reason", StringType),
      StructField("epoch", LongType)))
  }

  /** Small-path blocked rows buffer driver-side up to this many rows, then
    * spill to the parquet sink (keeps the fast path at its usual job count
    * while bounding driver memory on long trackBlocked crawls).
    */
  private[engine] val blockedBufCap = 65536

  /** Small-path parsed pages buffer driver-side up to this many rows before
    * flushing one parquet delta — tiny epochs stop paying a write job each
    * (r6). Rows are full ParsedPages (spans included), so the cap bounds
    * driver memory; any pages-view read flushes first.
    */
  private[engine] val pageBufCap = 16384

  /** Case-insensitive frontier dedup keeping the canonical-min row
    * (depth, discovery_seq, host, url) — a map-side-combining hash
    * aggregate: struct comparison is lexicographic field-by-field and
    * discovery_seq is globally unique, so the min struct IS the
    * canonical-min entry with its own remaining fields attached.
    */
  def dedupCanonicalMin(frontier: DataFrame): DataFrame =
    frontier
      .groupBy(lower(col("url")).as("__lu"))
      .agg(min(struct(col("depth"), col("discovery_seq"), col("host"), col("url"),
        col("priority"), col("attempt"), col("not_before"))).as("__m"))
      .select(col("__m.url").as("url"), col("__m.host").as("host"),
        col("__m.depth").as("depth"), col("__m.discovery_seq").as("discovery_seq"),
        col("__m.priority").as("priority"), col("__m.attempt").as("attempt"),
        col("__m.not_before").as("not_before"))

  /** Resume a checkpointed crawl: restores frontier/seen/signatures/host
    * state/pages + driver ledger from the latest committed snapshot and
    * continues the epoch loop (kill-and-restart produces tables identical
    * to an uninterrupted run — ResumeSpec).
    */
  def resume(spark: SparkSession, config: CrawlConfig, fetcher: Fetcher,
      robots: RobotsProvider, ck: Checkpointer, seedUrls: Seq[String],
      expectedUrls: Long = 4L * 1000 * 1000,
      sitemapChain: Boolean = false, sitemapOnly: Boolean = false): CrawlResult =
    new CrawlEngine(spark, config, fetcher, robots, expectedUrls, Some(ck))
      .crawl(seedUrls, Some(ck), sitemapChain = sitemapChain, sitemapOnly = sitemapOnly)

  /** Normalized-content signature — the reference hashes `normalize_html`
    * output (markup minus volatile attrs/links, `utils/mod.rs:9221-9300`);
    * the span-native analogue hashes the ordered text content (links and
    * media refs excluded, matching the href-stripping). Exact function is
    * ours to define (SURVEY C4); FNV-1a 64 over the joined text.
    */
  def signatureOf(spans: Array[Span]): Long = {
    if (spans == null || spans.isEmpty) return 0L
    signatureOfSorted(spans.sortBy(_.offset))
  }

  /** [[signatureOf]] over an already offset-sorted span array — parsePage
    * sorts once and shares the array (sortBy is stable, so the hash is
    * identical to sorting again).
    */
  private def signatureOfSorted(sorted: Array[Span]): Long = {
    if (sorted == null || sorted.isEmpty) return 0L
    val textKinds = Set("text", "title", "meta_description")
    var h = 0xcbf29ce484222325L
    var any = false
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
  def parsePage(f: FetchResult, scope: ScopeState, epoch: Long,
      linkRewrite: String => String = null): ParsedPage = {
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
    val smLinks = scala.collection.mutable.ArrayBuffer.empty[String]
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
        val isSitemap = s.kind == "sitemap"
        if ((isLink || isSitemap) && s.media_ref != null) {
          val v = UrlOps.validateLink(
            pageUrl = f.f_final_url, crawlBase = pageRoot, baseHref = baseHref,
            href = s.media_ref, subMatcher = scope.subMatcher, parentHost = scope.parentHost,
            parentScheme = scope.parentScheme, redirectHost = scope.redirectHost,
            externalDomains = scope.externalDomains, fullResources = scope.fullResources)
          if (v != null) {
            if (isSitemap) smLinks += v
            else links += (if (linkRewrite == null) v else linkRewrite(v))
          }
        }
        i += 1
      }
    }
    val sig = signatureOfSorted(sorted)
    ParsedPage(f.url, f.f_final_url, f.host, f.depth, f.discovery_seq, f.priority,
      f.attempt, epoch, f.f_status, sig, title, desc, og, f.f_charset, f.f_etag,
      spans, links.distinct.toArray,
      f.f_retry_after_ms, f.f_latency_ms, smLinks.distinct.toArray)
  }
}
