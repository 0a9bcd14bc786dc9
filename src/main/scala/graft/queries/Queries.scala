package graft.queries

import graft.functions.{Dedup, Multimodal, Similarity, TextFunctions}
import graft.url.urlfns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's query surface over the driver testdata — one entry per
  * operator family of SURVEY §2, each re-expressed relationally so the
  * DuckDB oracle can verify it, plus the training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal).
  *
  * Conventions: every computed column is aliased identically in the Spark
  * plan and the oracle SQL; float outputs are rounded; outputs avoid
  * nondeterministic row content (ranks get total tie-breaks).
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Synthesized URL over documents — the crawl-shaped test column. Mixed
    * case + fragment exercise canonicalization; first path segment rotates
    * through score/budget-relevant names.
    */
  private def urlified(docs: DataFrame): DataFrame = {
    val seg = element_at(
      array(lit("products"), lit("legal"), lit("en"), lit("docs"), lit("article"), lit("items")),
      (pmod(col("doc_id"), lit(6)) + 1).cast("int"))
    docs.withColumn("raw_url",
      concat(lit("https://WWW.Site"), pmod(col("doc_id"), lit(20)), lit(".com/"),
        seg, lit("/d"), col("doc_id"), lit(".html#frag")))
  }

  // ---------------------------------------------------------------- //
  // Relational core (joins/aggs/windows — D1-D7 shapes)
  // ---------------------------------------------------------------- //

  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  def q3RevenueTopK(spark: SparkSession, dir: String): DataFrame = {
    // no broadcast hint: orders is NOT a small side at sf >= 1 — let AQE
    // pick the join strategy from runtime stats
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def qOrderPriority(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** LEFT ANTI — the URL-seen workhorse (B1/D2). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))

  def qSemiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))

  /** Per-key top-k window — the politeness quota shape (B9/D5). */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    t(spark, dir, "events")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("user_id"), col("event_id"), col("rnk"))
  }

  def qDistinctCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))

  // ---------------------------------------------------------------- //
  // Crawl-shaped operators over synthesized URLs (B/C/E ops)
  // ---------------------------------------------------------------- //

  /** C1 canonicalization via the custom Catalyst expression; oracle computes
    * the expected canonical form independently in SQL.
    */
  def cUrlCanon(spark: SparkSession, dir: String): DataFrame =
    urlified(t(spark, dir, "documents"))
      .select(col("doc_id"),
        canonicalize_url(col("raw_url"), col("raw_url")).as("canon_url"),
        url_host(canonicalize_url(col("raw_url"), col("raw_url"))).as("host"))

  /** B1: candidates minus seen (anti-join on url). */
  def bSeenAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val u = urlified(t(spark, dir, "documents"))
    val cands = u.filter(pmod(col("doc_id"), lit(3)) === 0).select(col("doc_id"), col("raw_url"))
    val seen = u.filter(pmod(col("doc_id"), lit(2)) === 0).select(col("raw_url"))
    cands.join(seen, Seq("raw_url"), "left_anti").select(col("doc_id"))
  }

  /** B6: path-depth gate via the path_depth expression; oracle counts '/'. */
  def bDepthGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("url", concat(lit("https://site.com"),
        expr("repeat('/s', cast(doc_id % 5 as int))"), lit("/d"), col("doc_id")))
    docs.select(col("doc_id"), path_depth(col("url")).as("depth"))
      .filter(col("depth") <= 3)
  }

  /** B8: case-insensitive batch dedup, keep min id. */
  def bBatchDedup(spark: SparkSession, dir: String): DataFrame = {
    val u = t(spark, dir, "documents")
      .withColumn("url",
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("HTTPS://SITE.COM/P"), pmod(col("doc_id"), lit(100))))
          .otherwise(concat(lit("https://site.com/p"), pmod(col("doc_id"), lit(100)))))
    u.groupBy(lower(col("url")).as("url_lower"))
      .agg(min(col("doc_id")).as("first_id"), count(lit(1)).as("n_variants"))
  }

  /** B7: per-prefix budget admission via windowed row_number. */
  def bBudgetQuota(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    t(spark, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("source"), col("doc_id"), col("rn"))
  }

  /** B9: per-host politeness quota (top-k per host by priority). */
  def bPolitenessQuota(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").withColumn("host", pmod(col("doc_id"), lit(40)))
    val w = Window.partitionBy(col("host")).orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("host"), col("doc_id"), col("rn"))
  }

  /** B10: asset-extension filter via the is_ignored_asset expression. */
  def bAssetFilter(spark: SparkSession, dir: String): DataFrame = {
    val ext = element_at(array(lit(".html"), lit(".png"), lit(".php"), lit(".pdf"),
      lit(""), lit(".zip"), lit(".htm"), lit(".mp4")), (pmod(col("doc_id"), lit(8)) + 1).cast("int"))
    t(spark, dir, "documents")
      .withColumn("url", concat(lit("https://site.com/f"), col("doc_id"), ext))
      .filter(!is_ignored_asset(col("url")))
      .select(col("doc_id"), col("url"))
  }

  /** E: score_url via the custom expression; oracle replays the formula. */
  def dPriorityScore(spark: SparkSession, dir: String): DataFrame =
    urlified(t(spark, dir, "documents"))
      .select(col("doc_id"),
        score_url(canonicalize_url(col("raw_url"), col("raw_url")),
          pmod(col("doc_id"), lit(5)).cast("int")).as("score"))

  // ---------------------------------------------------------------- //
  // Text analysis (training-data ops)
  // ---------------------------------------------------------------- //

  def tTokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.tokenEstimate(col("text")).as("n_tokens_bpe"))

  def tQuality(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.qualityFeatures(t(spark, dir, "documents"), col("text"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"), col("quality_score"))

  def tLangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.stopwordHits(col("text"), "the").as("en_hits"),
        TextFunctions.stopwordHits(col("text"), "le").as("fr_hits"))

  def tFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), md5(lower(col("text"))).as("fp"))

  // ---------------------------------------------------------------- //
  // Dedup family
  // ---------------------------------------------------------------- //

  def dExactClasses(spark: SparkSession, dir: String): DataFrame = {
    // synthesize exact dups: key on text modulo a coarse bucket so classes exist
    val docs = t(spark, dir, "documents")
      .withColumn("content_key", substring(col("text"), 1, 40))
    Dedup.exactClasses(docs, col("doc_id"), col("content_key"))
  }

  def dMinhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, threshold = 0.4)

  def dSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleN = 2, maxHamming = 3)

  def dNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    // EXACT threshold similarity join (prefix-filtered inverted index,
    // recall 1.0) — every pair with 3-gram Jaccard >= 0.5, no blocking
    // approximation, so the DuckDB oracle is a brute-force cross join.
    // 0.5 is the realistic near-dup bar AND keeps the prefix filter strong
    // (prefix length (1-t)·|S|+1; at 0.2 the filter would index 80% of
    // every document — low thresholds are inherently quadratic-ish for ANY
    // exact algorithm)
    Dedup.jaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleN = 3, threshold = 0.5)

  def dEmbeddingNearDups(spark: SparkSession, dir: String): DataFrame =
    // testdata embeddings are loosely clustered (same-label max cosine ≈0.47)
    // — 0.3 marks the near-dup tail without flooding. 4 tables × 2^4
    // buckets suit the 500-5000-row test corpus; at scale pass
    // planes = Similarity.planesFor(n).
    Dedup.embeddingNearDups(t(spark, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.3, tables = 4, planes = 4, dim = 64)

  // ---------------------------------------------------------------- //
  // Similarity search
  // ---------------------------------------------------------------- //

  def sAnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", k = 5)
  }

  def sAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.lshTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", k = 5,
      tables = 4, planes = 3, dim = 64)
  }

  def eCentroids(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(element_at(col("embedding"), 1)), 4).as("c0"),
        round(avg(element_at(col("embedding"), 2)), 4).as("c1"))

  // ---------------------------------------------------------------- //
  // Streaming-shaped (tumbling window agg; true readStream in spec)
  // ---------------------------------------------------------------- //

  def stTumblingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  // ---------------------------------------------------------------- //
  // Crawl end-to-end (engine; rows-only check — not SQL-expressible)
  // ---------------------------------------------------------------- //

  def crawlBasic(spark: SparkSession, dir: String): DataFrame = {
    import graft.corpus.CorpusParams
    import graft.engine.{CorpusRobots, CrawlEngine, GenerativeFetcher}
    import graft.model.CrawlConfig
    val params = CorpusParams(hosts = 2, pagesPerHost = 40)
    val engine = new CrawlEngine(spark, CrawlConfig(maxEpochs = 20),
      new GenerativeFetcher(params), new CorpusRobots(params), expectedUrls = 10000)
    engine.crawl(Seq("https://www.site0.com/")).pages
      .select(col("url"), col("depth"), col("status"), col("signature"))
  }

  /** crawl_throttle scenario — shared by the query, `Drive oracledump`, and
    * CrawlPinSpec so the three can never drift. 429s every 4th page with
    * Retry-After 2s at tick 1s puts the host at 0.5 tokens/epoch after the
    * first drain: the reactive-politeness path (reference
    * `rate_limiter.rs:121-137`) that round 2's driver queries never
    * exercised. `epoch` is part of the pinned output so the driver verifies
    * PACING, not just the final page set.
    */
  object ThrottleScenario {
    import graft.corpus.CorpusParams
    import graft.model.CrawlConfig
    val params: CorpusParams =
      CorpusParams(hosts = 1, pagesPerHost = 10, rateLimitEvery = 4, retryAfterMs = 2000L)
    val config: CrawlConfig =
      CrawlConfig(delayMs = 100, tickMs = 1000, retryLimit = 1, maxEpochs = 120)
    val seeds: Seq[String] = Seq("https://www.site0.com/")
  }

  /** crawl_sitemap scenario — the A6 chain (sitemap AFTER the crawl,
    * recursive index walk) under the driver oracle: orphan pages are
    * reachable only via /sitemap.xml or the nested /sitemap-deep.xml, so
    * the pinned page set proves both chain phases ran and in the right
    * order. Shared by the query, `Drive oracledump`, and CrawlPinSpec.
    */
  object SitemapScenario {
    import graft.corpus.CorpusParams
    import graft.model.CrawlConfig
    val params: CorpusParams =
      CorpusParams(hosts = 1, pagesPerHost = 40, fanout = 2, orphanEvery = 5)
    val config: CrawlConfig = CrawlConfig(maxEpochs = 40)
    val seeds: Seq[String] = Seq("https://www.site0.com/")
  }

  def crawlSitemapQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.{CorpusRobots, CrawlEngine, GenerativeFetcher}
    val s = SitemapScenario
    val engine = new CrawlEngine(spark, s.config,
      new GenerativeFetcher(s.params), new CorpusRobots(s.params), expectedUrls = 10000)
    engine.crawlWithSitemap(s.seeds).pages
      .select(col("url"), col("depth"), col("status"))
  }

  /** Sitemap-ONLY walk (reference `crawl_sitemap()`, `website.rs:6994-7028`)
    * on the SitemapScenario corpus: entries come exclusively from
    * /sitemap.xml + the nested /sitemap-deep.xml; no page's links expand
    * and the seed page itself is fetched only if a sitemap lists it.
    */
  def crawlSitemapOnlyQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.{CorpusRobots, CrawlEngine, GenerativeFetcher}
    val s = SitemapScenario
    val engine = new CrawlEngine(spark, s.config,
      new GenerativeFetcher(s.params), new CorpusRobots(s.params), expectedUrls = 10000)
    engine.crawlSitemap(s.seeds).pages
      .select(col("url"), col("depth"), col("status"))
  }

  def crawlThrottle(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.{CorpusRobots, CrawlEngine, GenerativeFetcher}
    val s = ThrottleScenario
    val engine = new CrawlEngine(spark, s.config,
      new GenerativeFetcher(s.params), new CorpusRobots(s.params), expectedUrls = 10000)
    engine.crawl(s.seeds).pages
      .select(col("url"), col("depth"), col("status"), col("epoch"))
  }

  /** crawl_blocked scenario — the B11 side-output TABLE under the driver
    * oracle: site1's robots disallows /legal/ (robots rows) and the veto
    * suppresses /docs/ pages (veto rows). No retryable statuses in the
    * corpus, so fast/distributed/oracle attribute identical epochs. Shared
    * by the query, `Drive oracledump`, and CrawlPinSpec.
    */
  object BlockedScenario {
    import graft.corpus.CorpusParams
    import graft.model.CrawlConfig
    val params: CorpusParams = CorpusParams(hosts = 2, pagesPerHost = 40)
    val config: CrawlConfig =
      CrawlConfig(respectRobotsTxt = true, maxEpochs = 30, trackBlocked = true)
    val seeds: Seq[String] = Seq("https://www.site1.com/")
    val veto: graft.engine.ParsedPage => Boolean = p => !p.url.contains("/docs/")
  }

  def crawlBlocked(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.{CorpusRobots, CrawlEngine, GenerativeFetcher}
    val s = BlockedScenario
    val engine = new CrawlEngine(spark, s.config,
      new GenerativeFetcher(s.params), new CorpusRobots(s.params), expectedUrls = 10000,
      onShouldCrawl = Some(s.veto))
    engine.crawl(s.seeds).blocked.select(col("url"), col("reason"), col("epoch"))
  }

  def crawlBudget(spark: SparkSession, dir: String): DataFrame = {
    import graft.corpus.CorpusParams
    import graft.engine.{CorpusRobots, CrawlEngine, GenerativeFetcher}
    import graft.model.CrawlConfig
    val params = CorpusParams(hosts = 2, pagesPerHost = 60)
    val engine = new CrawlEngine(spark,
      CrawlConfig(budget = Map("*" -> 12, "en" -> 3), maxEpochs = 20),
      new GenerativeFetcher(params), new CorpusRobots(params), expectedUrls = 10000)
    engine.crawl(Seq("https://www.site0.com/")).pages
      .select(col("url"), col("depth"), col("status"))
  }

  // ---------------------------------------------------------------- //
  // Multimodal plumbing (stubbed decode; rows-only)
  // ---------------------------------------------------------------- //

  def mMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(t(spark, dir, "documents"))
    Multimodal.resizePlan(
      Multimodal.decodeAndExtract(spark, media).toDF(), maxDim = 512)
      .select(col("media_id"), col("kind"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("out_width"), col("out_height"))
  }
}
