package graft.tools

import graft.corpus.CorpusParams
import graft.engine.{Checkpointer, CorpusRobots, CrawlEngine, GenerativeFetcher, TableFetcher}
import graft.model.CrawlConfig
import org.apache.spark.sql.SparkSession

/** `spark-submit`-able crawl entry point (SURVEY §7 module 9).
  *
  * {{{
  * spark-submit --class graft.tools.CrawlJob spiderspark.jar \
  *   --seeds https://www.site0.com/,https://www.site1.com/ \
  *   --out /data/crawl1 \
  *   [--docs /data/corpus.parquet]      # table fetcher; default: generative corpus
  *   [--budget '*:1000,en:100'] [--depth 8] [--respect-robots] [--subdomains]
  *   [--delay-ms 500] [--external '*'] [--checkpoint /data/ck --every 5]
  *   [--resume] [--max-epochs 100] [--hosts 16 --pages-per-host 1000]
  *   [--sitemap]                       # chain the sitemap walk after the crawl
  *   [--sitemap-only]                  # walk sitemaps INSTEAD of the link crawl
  * }}}
  *
  * Writes `pages/`, `seen/`, `frontier_remainder/` parquet under `--out`
  * plus `metrics.json`.
  */
object CrawlJob {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val k = args(i).stripPrefix("--")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) { m(k) = args(i + 1); i += 2 }
      else { m(k) = "true"; i += 1 }
    }
    m.toMap
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val seeds = a.getOrElse("seeds", sys.error("--seeds required")).split(",").toSeq
    val out = a.getOrElse("out", sys.error("--out required"))

    val builder = SparkSession.builder()
      .appName("spiderspark-crawl")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects the master; default to local[*] for direct runs
    if (sys.props.get("spark.master").isEmpty) builder.master("local[*]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val budget: Map[String, Int] = a.get("budget").map(_.split(",").map { kv =>
      val Array(k, v) = kv.split(":"); (k, v.toInt)
    }.toMap).getOrElse(Map.empty)

    val cfg = CrawlConfig(
      respectRobotsTxt = a.contains("respect-robots"),
      subdomains = a.contains("subdomains"),
      tld = a.contains("tld"),
      delayMs = a.get("delay-ms").map(_.toLong).getOrElse(0L),
      depth = a.get("depth").map(_.toInt).getOrElse(25),
      budget = budget,
      externalDomains = a.get("external").map(_.split(",").toSet).getOrElse(Set.empty),
      fullResources = a.contains("full-resources"),
      retryLimit = a.get("retry").map(_.toInt).getOrElse(0),
      maxEpochs = a.get("max-epochs").map(_.toInt).getOrElse(1000),
      crawlTimeoutMs = a.get("timeout-ms").map(_.toLong).getOrElse(0L))

    val params = CorpusParams(
      hosts = a.get("hosts").map(_.toInt).getOrElse(16),
      pagesPerHost = a.get("pages-per-host").map(_.toInt).getOrElse(1000))
    val fetcher = a.get("docs") match {
      case Some(path) => new TableFetcher(spark.read.parquet(path))
      case None => new GenerativeFetcher(params)
    }
    val ck = a.get("checkpoint").map(dir =>
      new Checkpointer(spark, dir, a.get("every").map(_.toInt).getOrElse(1)))

    val engine = new CrawlEngine(spark, cfg, fetcher, new CorpusRobots(params),
      expectedUrls = a.get("expected-urls").map(_.toLong).getOrElse(4000000L),
      checkpoint = ck)
    val res =
      if (a.contains("resume") && ck.isDefined)
        engine.crawl(seeds, ck, sitemapChain = a.contains("sitemap"),
          sitemapOnly = a.contains("sitemap-only"))
      else engine.crawl(seeds, sitemapChain = a.contains("sitemap"),
        sitemapOnly = a.contains("sitemap-only"))

    res.pages.write.mode("overwrite").parquet(s"$out/pages")
    res.seen.write.mode("overwrite").parquet(s"$out/seen")
    res.frontierRemainder.write.mode("overwrite").parquet(s"$out/frontier_remainder")
    val metricsJson = res.metrics.map(m =>
      s"""{"epoch":${m.epoch},"admitted":${m.admitted},"new_links":${m.new_links},""" +
      s""""frontier":${m.frontier_size},"seen":${m.seen_size},"wall_ms":${m.wall_ms}}""")
      .mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out).resolve("metrics.json"),
      s"""{"epochs":${res.epochs},"metrics":$metricsJson}""")
    println(s"crawl done: epochs=${res.epochs} pages written to $out/pages")
    spark.stop()
  }
}
