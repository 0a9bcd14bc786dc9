package graft.corpus

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Corpus generator invariants: the materialized table and the pure
  * generative function must agree row-for-row (the span-sequence parity
  * contract of BASELINE.json: equality on (kind, text, media_ref, order)),
  * and both fetchers must be interchangeable.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  val params: CorpusParams = CorpusParams(hosts = 3, pagesPerHost = 40,
    dupContentEvery = 4, redirectEvery = 7, errorEvery = 11)

  test("docsDF equals docFor over every URL (span-sequence parity)") {
    spark.sparkContext.setLogLevel("ERROR")
    val fromTable = CorpusGen.docsDF(spark, params).collect()
    assert(fromTable.nonEmpty)
    fromTable.foreach { doc =>
      val direct = CorpusGen.docFor(params, doc.doc_id)
      assert(direct != null, doc.doc_id)
      assert(direct.status == doc.status && direct.redirect_to == doc.redirect_to, doc.doc_id)
      val a = doc.spans.sortBy(_.offset).map(s => (s.kind, s.text, s.media_ref, s.offset)).toSeq
      val b = direct.spans.sortBy(_.offset).map(s => (s.kind, s.text, s.media_ref, s.offset)).toSeq
      assert(a == b, s"span sequence mismatch for ${doc.doc_id}")
    }
  }

  test("url parse is the exact inverse of url generation") {
    for (h <- 0 until params.hosts; p <- 0L until params.pagesFor(h).toLong) {
      val url = CorpusGen.pageUrl(params, h, sub = false, p)
      assert(CorpusGen.parseUrl(params, url) == ((h, false, p)), url)
    }
    assert(CorpusGen.parseUrl(params, "https://www.other.com/") == null)
    assert(CorpusGen.parseUrl(params, "https://www.site0.com/nope.html") == null)
  }

  test("TableFetcher and GenerativeFetcher produce identical results") {
    import spark.implicits._
    import graft.engine.{GenerativeFetcher, TableFetcher}
    import graft.model.FrontierEntry
    spark.sparkContext.setLogLevel("ERROR")
    val urls = CorpusGen.allUrls(params).take(60) ++ Seq("https://www.site0.com/missing.html")
    val admitted = spark.createDataset(urls.zipWithIndex.map { case (u, i) =>
      FrontierEntry(u, graft.url.UrlOps.host(u), 1, i.toLong, 100, 0, 0L)
    })
    val gen = new GenerativeFetcher(params).fetch(spark, admitted).collect()
      .map(f => (f.url, f.f_status, f.f_final_url,
        f.f_spans.sortBy(_.offset).map(s => (s.kind, s.text, s.media_ref)).toSeq))
      .sortBy(_._1)
    val docs = CorpusGen.docsDF(spark, params).toDF()
    val tab = new TableFetcher(docs).fetch(spark, admitted).collect()
      .map(f => (f.url, f.f_status, f.f_final_url,
        f.f_spans.sortBy(_.offset).map(s => (s.kind, s.text, s.media_ref)).toSeq))
      .sortBy(_._1)
    assert(gen.length == tab.length)
    gen.zip(tab).foreach { case (g, t) => assert(g == t, s"fetcher mismatch at ${g._1}") }
  }
}
