package graft.tools

import graft.corpus.{CorpusGen, CorpusParams}
import graft.engine.{CrawlEngine, GenerativeFetcher, ScopeState}
import graft.model.FrontierEntry
import graft.url.UrlOps
import org.apache.spark.sql.SparkSession

/** Scratch A/B: isolate the page-delta parquet write cost (dictionary
  * encoding on vs off) on the bench corpus shape. Temporary diagnostic.
  */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val params = CorpusParams(hosts = 16, pagesPerHost = 40000, fanout = 48, textWords = 150)
    val n = 200000
    val entries = (0 until n).map { i =>
      val h = i % 16
      val p = (i / 16).toLong
      FrontierEntry(CorpusGen.pageUrl(params, h, sub = false, p),
        CorpusGen.hostName(h), 1, i.toLong, 0, 0, 0L)
    }
    val ds = spark.createDataset(entries).repartition(64).cache()
    ds.count()
    val fetcher = new GenerativeFetcher(params)
    val seed = "https://www.site0.com/"
    val scope = ScopeState("", "www.site0.com", "https", "",
      UrlOps.parseCrawlBase(seed).serialize, Set("*"), fullResources = false)
    val out = "/dev/shm/wb-out"
    def runOnce(dict: Boolean, tag: String): Double = {
      val t0 = System.nanoTime()
      val w = fetcher.fetch(spark, ds)
        .mapPartitions(it => it.map(f => CrawlEngine.parsePage(f, scope, 1L, null)))
        .write.option("compression", "none").mode("overwrite")
      (if (dict) w else w.option("parquet.enable.dictionary", "false"))
        .parquet(s"$out/$tag")
      val s = (System.nanoTime() - t0) / 1e9
      println(f"WB $tag dict=$dict $s%.2f s")
      s
    }
    runOnce(dict = true, "warm") // session warmup, discarded
    val res = (1 to 3).flatMap { r =>
      Seq(("dict", runOnce(dict = true, s"d$r")), ("nodict", runOnce(dict = false, s"n$r")))
    }
    for ((k, ts) <- res.groupBy(_._1))
      println(f"WB SUMMARY $k min=${ts.map(_._2).min}%.2f mean=${ts.map(_._2).sum / ts.size}%.2f")
    // also report written bytes for one of each
    def sizeOf(tag: String): Long = {
      val d = new java.io.File(s"$out/$tag")
      if (!d.exists) 0L else d.listFiles.filter(_.getName.endsWith(".parquet")).map(_.length).sum
    }
    println(s"WB BYTES dict=${sizeOf("d3")} nodict=${sizeOf("n3")}")
    spark.stop()
  }
}
