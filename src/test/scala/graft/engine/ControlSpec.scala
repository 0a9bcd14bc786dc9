package graft.engine

import graft.corpus.CorpusParams
import graft.model.CrawlConfig
import graft.url.Glob
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Control-surface specs: glob seeds (A2), scrape (A8), should-crawl veto
  * (B11), crawl timeout (D8), shutdown (D9) — the reference's control tests
  * (`website.rs:15094-15256`) re-shaped for the engine.
  */
class ControlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  val params: CorpusParams = CorpusParams(hosts = 2, pagesPerHost = 40)
  private def engine(cfg: CrawlConfig = CrawlConfig(maxEpochs = 20),
      veto: Option[ParsedPage => Boolean] = None) =
    new CrawlEngine(spark, cfg, new GenerativeFetcher(params), new CorpusRobots(params),
      expectedUrls = 10000, onShouldCrawl = veto)

  test("glob expansion matches reference shapes (glob.rs tests)") {
    assert(Glob.expandUrl("https://x.com/licenses/{mit,apache-2.0,mpl-2.0}/") == Seq(
      "https://x.com/licenses/mit/", "https://x.com/licenses/apache-2.0/",
      "https://x.com/licenses/mpl-2.0/"))
    assert(Glob.expandUrl("https://x.com/p[1-3].html") == Seq(
      "https://x.com/p1.html", "https://x.com/p2.html", "https://x.com/p3.html"))
    assert(Glob.expandUrl("https://x.com/p[08-11].html") == Seq(
      "https://x.com/p08.html", "https://x.com/p09.html",
      "https://x.com/p10.html", "https://x.com/p11.html"))
    assert(Glob.expandUrl("https://x.com/p[0-9:5].html") == Seq(
      "https://x.com/p0.html", "https://x.com/p5.html"))
    assert(Glob.expandUrl("https://x.com/[a-c]/x") == Seq(
      "https://x.com/a/x", "https://x.com/b/x", "https://x.com/c/x"))
    // cartesian product of multiple patterns
    assert(Glob.expandUrl("https://x.com/{a,b}/p[1-2]").length == 4)
    // no pattern → empty (caller falls back to literal)
    assert(Glob.expandUrl("https://x.com/plain").isEmpty)
    assert(Glob.expandSeeds(Seq("https://x.com/plain")) == Seq("https://x.com/plain"))
  }

  test("glob seeds crawl all expanded pages (test_crawl_glob shape)") {
    spark.sparkContext.setLogLevel("ERROR")
    val res = engine().crawl(Seq("https://www.site0.com/p[1-3].html"))
    val urls = res.seen.collect().map(_.getString(1)).toSet
    assert(Set(1, 2, 3).forall(i => urls.exists(_.endsWith(s"p$i.html"))))
  }

  test("scrape returns the materialized pages (website.rs:7326-7378)") {
    spark.sparkContext.setLogLevel("ERROR")
    val pages = engine().scrape(Seq("https://www.site0.com/"))
    assert(pages.nonEmpty && pages.exists(_.url == "https://www.site0.com/"))
    assert(pages.forall(p => p.spans != null))
  }

  test("should-crawl veto blocks expansion but keeps the page (B11)") {
    spark.sparkContext.setLogLevel("ERROR")
    // veto everything except the seed root: crawl stops at depth 1
    val res = engine(veto = Some((p: ParsedPage) => p.depth == 0))
      .crawl(Seq("https://www.site0.com/"))
    val pages = res.pages.collect()
    assert(pages.exists(_.getAs[Int]("depth") == 0))
    assert(pages.forall(_.getAs[Int]("depth") <= 1), "links beyond vetoed pages crawled")
    assert(pages.count(_.getAs[Int]("depth") == 1) > 0, "root's own links must still expand")
  }

  test("crawl timeout stops between epochs (D8)") {
    spark.sparkContext.setLogLevel("ERROR")
    val res = engine(CrawlConfig(maxEpochs = 50, crawlTimeoutMs = 1L))
      .crawl(Seq("https://www.site0.com/"))
    // 1ms deadline: epoch 0 completes (graceful), nothing more
    assert(res.epochs <= 2, s"timeout ignored, ran ${res.epochs} epochs")
  }

  test("sitemap crawl ingests /sitemap.xml <loc> entries (A6)") {
    spark.sparkContext.setLogLevel("ERROR")
    // whitelist-free crawl of a host whose tree is shallow: pages only
    // reachable via the sitemap (e.g. p38 with fanout 4 tree from root is
    // reachable anyway, so compare WITH vs WITHOUT sitemap on seen size)
    val plain = engine().crawl(Seq("https://www.site0.com/"))
    val withSm = engine().crawlSitemap(Seq("https://www.site0.com/"))
    val plainSeen = plain.seen.count()
    val smSeen = withSm.seen.count()
    assert(smSeen >= plainSeen + 1, s"sitemap added nothing: $plainSeen -> $smSeen")
    assert(withSm.seen.collect().map(_.getString(0)).exists(_.endsWith("/sitemap.xml")))
  }

  test("shutdown request stops the crawl gracefully (D9)") {
    spark.sparkContext.setLogLevel("ERROR")
    val e = engine(CrawlConfig(maxEpochs = 50))
    e.requestShutdown()
    val res = e.crawl(Seq("https://www.site0.com/"))
    assert(res.epochs <= 2, s"shutdown ignored, ran ${res.epochs} epochs")
    assert(res.frontierRemainder.count() > 0, "graceful shutdown preserves the frontier")
  }
}
