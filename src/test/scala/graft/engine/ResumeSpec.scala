package graft.engine

import graft.corpus.CorpusParams
import graft.model.CrawlConfig
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Checkpoint/resume: snapshots commit atomically with lineage + metrics;
  * a crawl killed after epoch k and resumed from the snapshot produces the
  * same final tables as an uninterrupted run (FIXTURES §5 `resume`).
  */
class ResumeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("snapshots commit atomically with manifest lineage + metrics") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft_ckpt").toString
    val params = CorpusParams(hosts = 2, pagesPerHost = 30)
    val ck = new Checkpointer(spark, dir, every = 1)
    val engine = new CrawlEngine(spark, CrawlConfig(maxEpochs = 20),
      new GenerativeFetcher(params), new CorpusRobots(params),
      expectedUrls = 10000, checkpoint = Some(ck))
    val res = engine.crawl(Seq("https://www.site0.com/"))
    val last = ck.latestEpoch()
    assert(last >= 0 && last == res.epochs - 1)
    val manifest = ck.readManifest(last)
    assert(manifest.contains("\"lineage\"") && manifest.contains("\"metrics\""))
    assert(manifest.contains("\"seq_counter\""))
    // committed tables equal the in-memory result
    val snapPages = ck.readTable(last, "pages").count()
    assert(snapPages == res.pages.count())
    val snapSeen = ck.readTable(last, "seen").count()
    assert(snapSeen == res.seen.count())
  }

  test("resume from epoch-k snapshot reproduces the uninterrupted crawl") {
    spark.sparkContext.setLogLevel("ERROR")
    val params = CorpusParams(hosts = 2, pagesPerHost = 40)
    val cfg = CrawlConfig(maxEpochs = 20)
    // uninterrupted run
    val full = new CrawlEngine(spark, cfg, new GenerativeFetcher(params),
      new CorpusRobots(params), expectedUrls = 10000)
      .crawl(Seq("https://www.site0.com/"))
    // interrupted run: checkpoint every epoch, stop after 2 epochs
    val dir = Files.createTempDirectory("graft_ckpt2").toString
    val ck = new Checkpointer(spark, dir, every = 1)
    new CrawlEngine(spark, cfg.copy(maxEpochs = 2), new GenerativeFetcher(params),
      new CorpusRobots(params), expectedUrls = 10000, checkpoint = Some(ck))
      .crawl(Seq("https://www.site0.com/"))
    assert(ck.latestEpoch() == 1)
    // resume and finish
    val resumed = CrawlEngine.resume(spark, cfg, new GenerativeFetcher(params),
      new CorpusRobots(params), ck, Seq("https://www.site0.com/"), expectedUrls = 10000)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("url", "depth", "discovery_seq", "status", "signature")
        .collect().map(_.toSeq).toSet
    assert(key(resumed.pages) == key(full.pages),
      s"resumed=${resumed.pages.count()} full=${full.pages.count()}")
    val fullSeen = full.seen.select("url_lower").collect().map(_.getString(0)).toSet
    val resSeen = resumed.seen.select("url_lower").collect().map(_.getString(0)).toSet
    assert(fullSeen == resSeen)
  }

  test("kill DURING the sitemap chain resumes mid-chain (chain lineage in the manifest)") {
    spark.sparkContext.setLogLevel("ERROR")
    val params = CorpusParams(hosts = 2, pagesPerHost = 90, fanout = 2, orphanEvery = 5)
    val cfg = CrawlConfig(maxEpochs = 60)
    def eng(c: CrawlConfig, ck: Option[Checkpointer] = None) =
      new CrawlEngine(spark, c, new GenerativeFetcher(params), new CorpusRobots(params),
        expectedUrls = 10000, checkpoint = ck)
    // main-phase length = epochs of the SAME crawl without the chain
    val mainEpochs = eng(cfg).crawl(Seq("https://www.site0.com/")).epochs
    val full = eng(cfg).crawl(Seq("https://www.site0.com/"), sitemapChain = true)
    assert(full.epochs > mainEpochs + 1, "chain phase too short to interrupt")
    // interrupt two epochs INTO the chain phase
    val dir = Files.createTempDirectory("graft_ckpt4").toString
    val ck = new Checkpointer(spark, dir, every = 1)
    eng(cfg.copy(maxEpochs = mainEpochs.toInt + 2), Some(ck))
      .crawl(Seq("https://www.site0.com/"), sitemapChain = true)
    val manifest = ck.readManifest(ck.latestEpoch())
    assert(manifest.contains("\"chain_started\":true"),
      "interrupted run never entered the chain phase")
    assert(manifest.contains("sitemap"), "chain sitemap set missing from manifest")
    val resumed = CrawlEngine.resume(spark, cfg, new GenerativeFetcher(params),
      new CorpusRobots(params), ck, Seq("https://www.site0.com/"),
      expectedUrls = 10000, sitemapChain = true)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("url", "depth", "discovery_seq", "status", "signature")
        .collect().map(_.toSeq).toSet
    assert(key(resumed.pages) == key(full.pages),
      s"resumed=${resumed.pages.count()} full=${full.pages.count()}")
    val fullSeen = full.seen.select("url_lower").collect().map(_.getString(0)).toSet
    val resSeen = resumed.seen.select("url_lower").collect().map(_.getString(0)).toSet
    assert(fullSeen == resSeen)
  }

  test("kill BEFORE the chain keeps rel=sitemap discoveries (discovered_sitemaps lineage)") {
    spark.sparkContext.setLogLevel("ERROR")
    // sitemap at an UNCONFIGURED path, advertised only by the root page's
    // rel=sitemap span: killing after discovery but before the chain must
    // preserve the discovery in the manifest, or the resumed chain walks
    // only the (404ing) default /sitemap.xml and loses the orphan pages
    val params = CorpusParams(hosts = 2, pagesPerHost = 90, fanout = 2, orphanEvery = 5,
      sitemapPath = "/wp-sitemap.xml", advertiseSitemap = true)
    val cfg = CrawlConfig(maxEpochs = 60)
    def eng(c: CrawlConfig, ck: Option[Checkpointer] = None) =
      new CrawlEngine(spark, c, new GenerativeFetcher(params), new CorpusRobots(params),
        expectedUrls = 10000, checkpoint = ck)
    val full = eng(cfg).crawl(Seq("https://www.site0.com/"), sitemapChain = true)
    assert(full.pages.collect().exists(_.getString(0).endsWith(graft.corpus.CorpusGen.pagePath(12L))),
      "orphan page unreached even uninterrupted — corpus shape broken")
    // interrupt two epochs in: root page (epoch 0) already advertised the
    // sitemap, the chain has NOT started yet
    val dir = Files.createTempDirectory("graft_ckpt5").toString
    val ck = new Checkpointer(spark, dir, every = 1)
    eng(cfg.copy(maxEpochs = 2), Some(ck))
      .crawl(Seq("https://www.site0.com/"), sitemapChain = true)
    val manifest = ck.readManifest(ck.latestEpoch())
    assert(!manifest.contains("\"chain_started\":true"), "chain started too early to test")
    assert(Checkpointer.discoveredSitemaps(manifest).exists(_.endsWith("/wp-sitemap.xml")),
      "rel=sitemap discovery missing from the manifest")
    val resumed = CrawlEngine.resume(spark, cfg, new GenerativeFetcher(params),
      new CorpusRobots(params), ck, Seq("https://www.site0.com/"),
      expectedUrls = 10000, sitemapChain = true)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("url", "depth", "discovery_seq", "status", "signature")
        .collect().map(_.toSeq).toSet
    assert(key(resumed.pages) == key(full.pages),
      s"resumed=${resumed.pages.count()} full=${full.pages.count()}")
  }

  test("resume ACROSS a compaction boundary of the co-partitioned stores") {
    spark.sparkContext.setLogLevel("ERROR")
    // compaction every 2 epochs + politeness pacing (~8+ epochs): the
    // interrupted run snapshots AFTER a seen/signature fold, so resume
    // restores compacted stores and then compacts again before finishing
    val params = CorpusParams(hosts = 2, pagesPerHost = 25, dupContentEvery = 3)
    val cfg = CrawlConfig(delayMs = 300, tickMs = 1000, maxEpochs = 60,
      stateCompactionEpochs = 2)
    val full = new CrawlEngine(spark, cfg, new GenerativeFetcher(params),
      new CorpusRobots(params), expectedUrls = 10000)
      .crawl(Seq("https://www.site0.com/"))
    val dir = Files.createTempDirectory("graft_ckpt3").toString
    val ck = new Checkpointer(spark, dir, every = 1)
    new CrawlEngine(spark, cfg.copy(maxEpochs = 5), new GenerativeFetcher(params),
      new CorpusRobots(params), expectedUrls = 10000, checkpoint = Some(ck))
      .crawl(Seq("https://www.site0.com/"))
    assert(ck.latestEpoch() >= 2, "interrupted run must span a compaction")
    val resumed = CrawlEngine.resume(spark, cfg, new GenerativeFetcher(params),
      new CorpusRobots(params), ck, Seq("https://www.site0.com/"), expectedUrls = 10000)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("url", "depth", "discovery_seq", "status", "signature")
        .collect().map(_.toSeq).toSet
    assert(key(resumed.pages) == key(full.pages),
      s"resumed=${resumed.pages.count()} full=${full.pages.count()}")
    val fullSeen = full.seen.select("url_lower").collect().map(_.getString(0)).toSet
    val resSeen = resumed.seen.select("url_lower").collect().map(_.getString(0)).toSet
    assert(fullSeen == resSeen)
  }

  test("manifest chain_sitemaps survives URLs with commas, brackets and quotes") {
    // URLs may legally contain ',' and ']' (and the writer escapes quotes);
    // the parser must walk JSON quoted strings, never split on ','
    val gnarly = Seq(
      "https://site.com/sitemaps/products,2024.xml",
      "https://site.com/s[1].xml",
      "https://site.com/a\"b.xml",
      "https://site.com/plain.xml")
    def q(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val manifest = s"""{"epoch":3,"chain_started":true,"chain_sitemaps":[${gnarly.map(q).mkString(",")}],"x":1}"""
    val (started, sms) = Checkpointer.chainState(manifest)
    assert(started)
    assert(sms == gnarly, s"parsed $sms")
    val (off, none) = Checkpointer.chainState("""{"epoch":1,"chain_started":false,"chain_sitemaps":[]}""")
    assert(!off && none.isEmpty)
  }
}
