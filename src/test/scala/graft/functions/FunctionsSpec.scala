package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the training-data pipeline operators: dedup finds planted
  * near-dups, LSH ANN achieves recall against brute force, multimodal
  * plumbing preserves schema/batching.
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  private def docs() = {
    spark.sparkContext.setLogLevel("ERROR")
    // base docs have DISJOINT vocabularies (jaccard 0 between any two)
    val base = (0 until 60).map { i =>
      val words = (0 until 30).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, words)
    }
    // plant near-dups: 100..104 are copies of 0..4 with one word changed
    val dups = (0 until 5).map { i =>
      val words = (0 until 30).map(j => if (j == 15) "CHANGED" else s"w${i}_$j").mkString(" ")
      ((100 + i).toLong, words)
    }
    // plant exact dups: 200..201 copy 10..11
    val exact = (0 until 2).map(i => ((200 + i).toLong, base(10 + i)._2))
    (base ++ dups ++ exact).toDF("doc_id", "text")
  }

  test("exact dedup finds planted exact duplicates") {
    val classes = Dedup.exactClasses(docs(), col("doc_id"), col("text")).collect()
    assert(classes.length == 2)
    assert(classes.map(_.getAs[Long]("representative")).toSet == Set(10L, 11L))
  }

  test("minhash LSH finds planted near-duplicates with exact jaccard verify") {
    // bands=8, r=2: P(miss) at jaccard 0.8 ≈ (1-0.8²)⁸ ≈ 0.02% — planted
    // pairs are found deterministically in practice
    val pairs = Dedup.minhashLshPairs(docs(), "doc_id", "text",
      shingleN = 3, k = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 5)
      assert(pairs.contains((i.toLong, (100 + i).toLong)), s"missing near-dup pair $i")
    // no false positives between unrelated docs
    assert(!pairs.exists { case (a, b) => a < 60 && b < 60 && a != b })
  }

  test("simhash banding finds planted near-duplicates (long docs)") {
    // simhash majority votes need enough features for stability: with
    // ~30-word docs one changed word flips ~8/64 bits (beyond the 4x16-band
    // Hamming<=3 guarantee); at 150 words the flip count is ~2-3 bits.
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 150).map(j => s"v${i}_$j").mkString(" "))
    }
    val dups = (0 until 5).map { i =>
      ((100 + i).toLong,
        (0 until 150).map(j => if (j == 75) "CHANGED" else s"v${i}_$j").mkString(" "))
    }
    val longDocs = (base ++ dups).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(longDocs, "doc_id", "text", shingleN = 2, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 5).count(i => pairs.contains((i.toLong, (100 + i).toLong)))
    assert(found >= 4, s"simhash found only $found/5 planted near-dups: $pairs")
    // disjoint-vocabulary docs must not collide
    assert(!pairs.exists { case (a, b) => a < 40 && b < 40 })
  }

  test("LSH ANN recall >= 0.6 vs brute force, brute force exact on planted neighbor") {
    // clustered vectors: 10 clusters, 30 points each = center + small offset
    val dim = 16
    val rows = (0 until 300).map { i =>
      val c = i % 10
      val vec = Array.tabulate(dim)(d =>
        math.sin(c * 17 + d).toFloat + (if (i / 10 % 2 == 0) 0.01f else -0.01f) * ((i * 7 + d) % 5))
      (i.toLong, vec)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same-cluster points must dominate brute-force neighbors
    assert(brute.forall { case (q, n) => n % 10 == q % 10 }, "brute-force neighbor crossed clusters")
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5,
      tables = 4, planes = 4, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("multimodal decode plumbing: schema, determinism, resize plan") {
    val media = (0 until 50).map(i =>
      (i.toLong, Seq("image", "video", "audio")(i % 3), s"payload-$i".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val decoded = Multimodal.decodeAndExtract(spark, media, frames = 3)
    val out = Multimodal.resizePlan(decoded.toDF(), maxDim = 256).collect()
    assert(out.length == 50)
    out.foreach { r =>
      val w = r.getAs[Int]("out_width"); val h = r.getAs[Int]("out_height")
      assert(w <= 256 && h <= 256 && w > 0 && h > 0)
    }
    // deterministic: same input, same checksum
    val again = Multimodal.decodeAndExtract(spark, media, frames = 3).collect()
      .map(d => (d.media_id, d.meta.checksum)).toMap
    val first = decoded.collect().map(d => (d.media_id, d.meta.checksum)).toMap
    assert(again == first)
    // video/audio rows carry frame samples, images don't
    assert(decoded.collect().forall(d =>
      if (d.kind == "image") d.frames.isEmpty else d.frames.length == 3))
  }

  test("codegen cosine_sim is bit-identical to the higher-order aggregate/zip_with chain") {
    // the r6 optimization replaced the interpreted chain with a one-pass
    // codegen expression; the replacement must reproduce the chain's exact
    // double arithmetic (float product, left-to-right double accumulation)
    // and null semantics, or the LSH/near-dup pair sets shift
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * (i % 7 + 1)).toFloat))
    }.toDF("id", "v")
    val pairs = vecs.select(col("id").as("ia"), col("v").as("va"))
      .crossJoin(vecs.select(col("id").as("ib"), col("v").as("vb")))
      .filter(col("ia") < col("ib") && pmod(col("ia") + col("ib"), lit(7)) === 0)
    def oldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
      val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
      dot / (na * nb)
    }
    val diff = pairs.select(
      oldCosine(col("va"), col("vb")).as("o"),
      Similarity.cosine(col("va"), col("vb")).as("n"))
      .filter(col("o") =!= col("n")).count()
    assert(diff == 0, s"$diff pairs diverge between codegen and higher-order cosine")
    // null / unequal-length semantics match the chain: null result
    val edge = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c")).head()
    assert(edge.isNullAt(0), "unequal-length arrays must yield null like zip_with padding")
  }

  test("token count, langid features, shingles behave") {
    val df = Seq(
      (1L, "the cat sat on the mat and the dog"),
      (2L, "le chat et le chien et le rat"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val tok = df.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(tok(1L) == 9 && tok(3L) == 1)
    val en = df.select(col("doc_id"), TextFunctions.stopwordHits(col("text"), "the").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(en(1L) == 3 && en(2L) == 0)
    val lang = df.select(col("doc_id"), TextFunctions.langId(col("text")).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(lang(1L) == "en" && lang(2L) == "fr" && lang(3L) == "unknown")
    val sh = df.filter(col("doc_id") === 1)
      .select(TextFunctions.wordShingles(col("text"), 3)).head().getSeq[String](0)
    assert(sh.contains("the cat sat") && sh.contains("on the mat"))
  }
}
