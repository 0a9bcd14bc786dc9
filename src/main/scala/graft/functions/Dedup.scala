package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle shape at 100TB:
  *
  *  - exact: one hash-aggregate on the content key (map-side partial).
  *  - MinHash+LSH: shingle → one-pass k-minhash signature (codegen
  *    expression) → b bands → id-only self-join per band bucket (the
  *    shingle arrays never cross the band shuffle; shuffle volume is
  *    O(rows·b·r·8 bytes)) → candidate (id_a,id_b) pairs deduped → ONE
  *    re-join to fetch shingles → exact-Jaccard verification.
  *  - SimHash: one-pass 60-bit signature (codegen expression), then the
  *    Manku multi-block pigeonhole scheme (Manku et al., WWW'07): the 60
  *    bits split into m blocks; a pair at Hamming ≤ k has ≥ m−k clean
  *    blocks, so banding on every (m−k)-block combination (2^30-key bands
  *    at the default m=6, k=3) keeps recall 1.0 — candidates verify by
  *    exact Hamming distance (scheme note above [[simhashPairs]]).
  *  - n-gram Jaccard: EXACT threshold similarity join via prefix filtering
  *    (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07):
  *    order each doc's shingles rare-first by global frequency, index only
  *    the first |S|-⌈t·|S|⌉+1 of them — pairs with J ≥ t provably share an
  *    indexed shingle, so recall is 1.0 while hot (frequent) shingles stay
  *    out of the inverted index. Bucket size is bounded by shingle rarity,
  *    never by document-length clustering.
  *
  * All sketch hashes are md5-derived ([[TextHash]]) so the DuckDB oracle
  * can replay the exact semantics.
  */
object Dedup {

  /** Exact dedup classes: groups of identical `key` with size > 1.
    * Representative = min(id) (deterministic).
    */
  def exactClasses(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("representative"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** MinHash signature: one codegen pass over the shingle array. */
  def minhashSignature(shingles: Column, k: Int): Column = hashfns.minhash_sig(shingles, k)

  /** MinHash-LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * Semantics (deterministic, oracle-replayable): a pair is emitted iff
    * (a) its k-minhash signatures agree on at least one of the `bands`
    * r-row bands, and (b) exact Jaccard of the shingle sets ≥ threshold.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4, threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    // ONE cached pass computes shingles + signature (subexpression
    // elimination shares the wordShingles call inside the project). The
    // self-join and the late shingle re-joins each re-read this cache —
    // without it the whole scan+shingle+signature subtree is duplicated
    // into every join arm by plan expansion (guide §2.4: shared subtrees
    // should share one materialization).
    val m = df
      .select(col(idCol).as("__id"),
        TextFunctions.wordShingles(col(textCol), shingleN).as("__sh"),
        minhashSignature(TextFunctions.wordShingles(col(textCol), shingleN), k).as("__sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = m.filter(size(col("__sh")) > 0).select(col("__id"), col("__sh"))
    // band keys are the signature slices themselves (array<long> join keys —
    // exact band equality, no hash-collision recheck needed)
    val banded = m.filter(size(col("__sh")) > 0)
      .select(col("__id"), posexplode(
        array((0 until bands).map(b => slice(col("__sig"), b * r + 1, r)): _*))
        .as(Seq("__band", "__bkey")))
    val cands = banded.select(col("__band"), col("__bkey"), col("__id").as("id_a"))
      .join(banded.select(col("__band"), col("__bkey"), col("__id").as("id_b")),
        Seq("__band", "__bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // one re-join carries shingles only for the (small) candidate set
    cands
      .join(base.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 60-bit SimHash over word shingles: one codegen pass. */
  def simhash(shingles: Column): Column = hashfns.simhash60(shingles)

  /** SimHash near-dup pairs via the multi-block pigeonhole index (Manku,
    * Jain & Das Sarma, "Detecting Near-Duplicates for Web Crawling",
    * WWW'07 §3): split the 60-bit signature into m=6 blocks of 10 bits; a
    * pair with Hamming ≤ maxHamming has ≥ m−maxHamming clean blocks, so it
    * shares the full key of at least one (m−maxHamming)-block combination.
    * Blocking on every C(m, m−maxHamming) combination therefore keeps
    * recall 1.0 while the per-band key space is 2^((m−maxHamming)·10) —
    * 2^30 keys for maxHamming=3 (vs the round-2 design's FIXED 2^15 keys
    * per band, whose buckets grow linearly with corpus size and whose
    * self-join is quadratic at 10⁹ docs). Candidate volume stays
    * O(n·C(m,c) + Σ_buckets |b|²/2^30·n) — near-linear until n approaches
    * 2^30 per table; bucket skew comes only from true signature classes
    * (identical docs), whose pairs are the operator's OUTPUT, not overhead.
    * Exact Hamming distance verifies every candidate.
    */
  private def choose(n: Int, k: Int): Long =
    (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 59, s"maxHamming=$maxHamming must be in [1, 59]")
    // pick (m blocks, c-block keys): need m > maxHamming (pigeonhole) and
    // c <= m - maxHamming (some c-combination is all-clean); maximize key
    // width c·(60/m) for selectivity, capped at 64 combinations.
    // maxHamming=3 → m=6, c=3: C(6,3)=20 bands of 30-bit keys.
    val divisors = Seq(4, 5, 6, 10, 12, 15, 20, 30, 60)
    val options = for {
      mm <- divisors if mm > maxHamming
      cc <- 1 to math.min(mm - maxHamming, 3)
      if choose(mm, cc) <= 64
    } yield (mm, cc)
    require(options.nonEmpty, s"no blocking scheme for maxHamming=$maxHamming")
    val (m, c) = options.maxBy { case (mm, cc) => (cc * (60 / mm), -choose(mm, cc)) }
    val blockBits = 60 / m
    val mask = (1L << blockBits) - 1
    // ONE cached (id, shingle-count, signature) pass — the banded self-join
    // otherwise duplicates the scan+shingle+simhash subtree into both join
    // arms (and the size filter re-evaluated wordShingles per row). The
    // cache is two longs + an int per row.
    val withSig = df
      .select(col(idCol).as("__id"),
        size(TextFunctions.wordShingles(col(textCol), shingleN)).as("__n"),
        simhash(TextFunctions.wordShingles(col(textCol), shingleN)).as("__sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .filter(col("__n") > 0)
      .select(col("__id"), col("__sim"))
    val comboKeys: Seq[Column] = (0 until m).combinations(c).map { blocks =>
      blocks.foldLeft(lit(0L)) { (acc, b) =>
        shiftleft(acc, blockBits).bitwiseOR(
          shiftrightunsigned(col("__sim"), b * blockBits).bitwiseAND(lit(mask)))
      }
    }.toSeq
    val banded = withSig.select(col("__id"), col("__sim"),
      posexplode(array(comboKeys: _*)).as(Seq("__band", "__bkey")))
    val a = banded.select(col("__band"), col("__bkey"), col("__id").as("id_a"), col("__sim").as("sim_a"))
    val b = banded.select(col("__band"), col("__bkey"), col("__id").as("id_b"), col("__sim").as("sim_b"))
    a.join(b, Seq("__band", "__bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity of two shingle-array columns. */
  def jaccard(shA: Column, shB: Column): Column =
    round(size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)), 4)

  /** EXACT Jaccard threshold self-join via prefix filtering — returns ALL
    * pairs with J(shingles_a, shingles_b) ≥ threshold (recall 1.0, no
    * sketch approximation).
    *
    * Prefix-filter lemma: order every document's shingles by one global
    * total order (frequency asc, shingle asc — rare first); if
    * |A∩B| ≥ ⌈t·|A|⌉ then A's first |A|-⌈t·|A|⌉+1 shingles intersect B's
    * prefix. So indexing only prefixes keeps recall 1.0 while the inverted
    * index skips exactly the hot shingles that would blow up bucket sizes.
    * Shuffle shape: O(rows·prefix) index entries joined on rare keys —
    * never an all-pairs block join.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    // cached shingle pass: consumed by the token explode AND the two late
    // verification joins — three plan arms that would otherwise each
    // re-scan and re-shingle the corpus
    val docs = df
      .select(col(idCol).as("__id"), TextFunctions.wordShingles(col(textCol), shingleN).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .filter(size(col("__sh")) > 0)
    val toks = docs.select(col("__id"), size(col("__sh")).as("__m"), explode(col("__sh")).as("__s"))
    // Global shingle order for the prefix lemma. ANY fixed total order
    // preserves recall 1.0 (Bayardo WWW'07 §3 — ordering only tunes the
    // candidate count); frequency-ascending minimizes it. The full
    // frequency table is O(distinct shingles) — billions of rows at 100 TB,
    // never broadcastable — so only the top-K HOT shingles (the ones whose
    // placement at the prefix END matters) carry their true count; the long
    // rare tail defaults to a hash order that sorts BEFORE every hot
    // shingle: rare-first without driver-side tail state.
    val hotK = 65536
    val freq = toks.groupBy(col("__s")).agg(count(lit(1)).as("__f"))
    val hot = freq.orderBy(col("__f").desc, col("__s")).limit(hotK)
    // rare-first rank within each doc; keep the prefix. The 1e-9 slack keeps
    // ceil() exact where t*m is a true integer (double rounding would
    // otherwise shorten the prefix and break the recall-1.0 guarantee).
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__hot"), col("__o"), col("__s"))
    // cached: the inverted-index self-join reads `prefix` TWICE — without
    // the cache the whole shingle+freq+window pipeline above is planned
    // (and executed) once per join arm, including the global hot-shingle
    // aggregate
    val prefix = toks.join(broadcast(hot), Seq("__s"), "left")
      .withColumn("__hot", when(col("__f").isNull, 0).otherwise(1))
      .withColumn("__o", when(col("__f").isNull, xxhash64(col("__s"))).otherwise(col("__f")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= col("__m") - ceil(lit(threshold) * col("__m") - lit(1e-9)) + 1)
      .select(col("__s"), col("__id"), col("__m"), col("__r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // two exact prunes on top of the prefix match:
    //  - size filter (necessary for J>=t, -1 slack against double rounding):
    //    t*|a| <= |b| <= |a|/t
    //  - PPJoin positional filter: overlap <= 1 + min(|a|-ra, |b|-rb), and
    //    J>=t needs overlap >= ceil(t/(1+t)*(|a|+|b|)); a pair's FIRST common
    //    prefix token carries the loosest such bound, so keeping pairs where
    //    ANY matched token passes is exact
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("__ma") + col("__mb")) - lit(1e-9))
    val cands = prefix.select(col("__s"), col("__id").as("id_a"), col("__m").as("__ma"), col("__r").as("__ra"))
      .join(prefix.select(col("__s"), col("__id").as("id_b"), col("__m").as("__mb"), col("__r").as("__rb")), Seq("__s"))
      .filter(col("id_a") < col("id_b") &&
        col("__mb").cast("double") >= lit(threshold) * col("__ma") - 1 &&
        col("__ma").cast("double") >= lit(threshold) * col("__mb") - 1 &&
        lit(1) + least(col("__ma") - col("__ra"), col("__mb") - col("__rb")) >= alpha)
      .select(col("id_a"), col("id_b")).distinct()
    cands
      .join(docs.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(docs.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding cosine near-dup pairs via multi-table hyperplane LSH —
    * candidates are id-only band-bucket collisions (bucket count scales
    * with corpus size via `planes`, see [[Similarity.planesFor]]); exact
    * cosine verifies. Output is float-free (id pairs only).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, tables: Int = 4, planes: Int = 4, dim: Int = 64): DataFrame = {
    // cached (id, table, bucket) rows: the band self-join reads this twice
    val bucketed = df.select(col(idCol).as("__id"),
      posexplode(Similarity.bucketIds(col(vecCol), tables, planes, dim)).as(Seq("__t", "__bkt")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = bucketed.select(col("__t"), col("__bkt"), col("__id").as("id_a"))
      .join(bucketed.select(col("__t"), col("__bkt"), col("__id").as("id_b")), Seq("__t", "__bkt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val vecs = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    cands
      .join(vecs.select(col("__id").as("id_a"), col("__v").as("__va")), Seq("id_a"))
      .join(vecs.select(col("__id").as("id_b"), col("__v").as("__vb")), Seq("id_b"))
      .filter(Similarity.cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
