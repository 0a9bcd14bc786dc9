package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle shape at 100TB:
  *
  *  - exact: one hash-aggregate on the content key (map-side partial).
  *  - MinHash+LSH: shingle → k minhashes → b bands → self-join per band
  *    BUCKET (equi-join, never a cross join); candidate pairs verified with
  *    exact Jaccard. Shuffle is O(rows·b), join keys are band hashes.
  *  - SimHash: 64-bit signature, banded into 4×16-bit keys (Hamming ≤ 3 ⇒
  *    at least one identical band by pigeonhole) → equi-join, verify by
  *    Hamming distance.
  *  - n-gram Jaccard: exact verify on candidate pairs only.
  */
object Dedup {

  /** Exact dedup classes: groups of identical `key` with size > 1.
    * Representative = min(id) (deterministic).
    */
  def exactClasses(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("representative"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** MinHash signature: k minimum hashes over the shingle set, permutation
    * i = xxhash64 seeded with i (ANSI-safe: no wrapping arithmetic). Pure
    * column expressions (aggregate over the array), no UDF.
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val hashes = (0 until k).map { i =>
      array_min(transform(shingles, s => xxhash64(s, lit(i))))
    }
    array(hashes: _*)
  }

  /** MinHash-LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * @param bands  b bands of r = k/b rows each; collision in ≥1 band ⇒
    *               candidate.
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4, threshold: Double = 0.7): DataFrame = {
    val r = k / bands
    val withSig = df
      .withColumn("__sh", TextFunctions.wordShingles(col(textCol), shingleN))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), k))
    // band keys: hash of each signature slice
    val banded = withSig.select(
      col(idCol).as("__id"), col("__sh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(concat_ws(",", slice(col("__sig"), b * r + 1, r)), lit(b))): _*))
        .as(Seq("__band", "__bkey")))
    val a = banded.select(col("__band"), col("__bkey"), col("__id").as("id_a"), col("__sh").as("sh_a"))
    val b = banded.select(col("__band"), col("__bkey"), col("__id").as("id_b"), col("__sh").as("sh_b"))
    val cands = a.join(b, Seq("__band", "__bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
    cands
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over word shingles: per-bit majority vote of shingle
    * hashes, expressed as column aggregates (no UDF).
    */
  def simhash64(shingles: Column): Column = {
    // for each bit i: count shingles with bit set, compare to half
    val n = size(shingles)
    val bits = (0 until 64).map { i =>
      val ones = aggregate(shingles, lit(0),
        (acc, s) => acc + shiftrightunsigned(xxhash64(s), i).bitwiseAND(lit(1L)).cast("int"))
      when(ones * 2 >= n, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((x: Column, y: Column) => x.bitwiseOR(y))
  }

  /** SimHash near-dup pairs: 4×16-bit band blocking (Hamming ≤ 3 ⇒ some
    * band equal), verified by exact Hamming distance.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, maxHamming: Int = 3): DataFrame = {
    val withSig = df
      .withColumn("__sh", TextFunctions.wordShingles(col(textCol), shingleN))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sim", simhash64(col("__sh")))
    val banded = withSig.select(col(idCol).as("__id"), col("__sim"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("__sim"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("__band", "__bkey")))
    val a = banded.select(col("__band"), col("__bkey"), col("__id").as("id_a"), col("__sim").as("sim_a"))
    val b = banded.select(col("__band"), col("__bkey"), col("__id").as("id_b"), col("__sim").as("sim_b"))
    val hamming = bit_count(col("sim_a").bitwiseXOR(col("sim_b")))
    a.join(b, Seq("__band", "__bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs (or all pairs
    * within small blocks) — the verification primitive.
    */
  def jaccard(shA: Column, shB: Column): Column =
    round(size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)), 4)

  /** Embedding cosine near-dup pairs via brute-force within LSH buckets —
    * see [[Similarity.cosine]] for the scalar.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 8, seed: Long = 7L): DataFrame = {
    val bucketed = Similarity.withHyperplaneBucket(df, vecCol, planes, seed)
    val a = bucketed.select(col("__bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = bucketed.select(col("__bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("__bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(Similarity.cosine(col("va"), col("vb")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine")).distinct()
  }
}
