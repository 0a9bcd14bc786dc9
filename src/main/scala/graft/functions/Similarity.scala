package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: broadcast the (small) query set, score every
  *    row with a codegen'd `zip_with`/`aggregate` dot product, per-query
  *    window top-k. One scan of the corpus, no corpus self-shuffle — the
  *    right baseline at 100TB when queries ≪ corpus.
  *  - Multi-table hyperplane LSH (IVF-style scale path): L independent
  *    tables of p sign-bit projections each. Bucket count per table is 2^p
  *    and p is chosen from the corpus size ([[planesFor]]) so expected
  *    bucket occupancy stays constant as data grows — candidate volume is
  *    O(n·L·bucketSize), never O(n²/constant). Multi-table union recovers
  *    the recall a single bucket loses.
  *
  * Projections are INTEGER-quantized (`floor(x·1024) · w`, md5-derived
  * integer weights): the bucket id is a function of exact integer sums, so
  * it is bit-identical across engines and summation orders — the DuckDB
  * oracle replays it exactly.
  */
object Similarity {

  /** Cosine similarity of two float-array columns — one-pass codegen
    * expression ([[VecHash.cosineSim]]), numerically identical to the
    * higher-order `aggregate(zip_with(...))` chain it replaces. The chain
    * was the verification hot spot: higher-order functions execute
    * INTERPRETED (CodegenFallback) and re-walk the lambda per element, so
    * every candidate pair paid ~3 interpreted array traversals.
    */
  def cosine(a: Column, b: Column): Column = hashfns.cosine_sim(a, b)

  /** Brute-force cosine top-k neighbors for each query vector.
    *
    * @param corpus  (id, vec) rows
    * @param queries (qid, qvec) rows — SMALL (broadcast)
    * @return (query_id, neighbor_id, rank) — cosine kept out of the output
    *         schema so exact-match oracles aren't float-sensitive
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      includeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__q"))))
      .filter(if (includeSelf) lit(true) else col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", cosine(col("__v"), col("__q")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Integer hyperplane weight w(table, plane, j) ∈ [-1000, 1000].
    * DuckDB parity:
    * `(CAST('0x'||substr(md5('hp:'||t||':'||p||':'||j),1,7) AS BIGINT) % 2001) - 1000`.
    */
  def hyperplaneWeight(table: Int, plane: Int, j: Int): Long = {
    val b = TextHash.md5(s"hp:$table:$plane:$j".getBytes("UTF-8"))
    (TextHash.hash28a(b) % 2001L) - 1000L
  }

  /** Planes per table scaled to corpus size: 2^planes ≈ n / targetBucket,
    * keeping expected bucket occupancy constant as the corpus grows — the
    * property the fixed-bucket round-1 design lacked (corpus²/2^planes is
    * quadratic when planes is a constant).
    */
  def planesFor(n: Long, targetBucket: Int = 64): Int =
    math.max(2, math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt)

  /** One bucket id per table: p sign bits of integer-quantized projections.
    * `floor(x·1024)` is exact fixed-point (×1024 is an exponent shift), the
    * weighted sum is pure integer arithmetic — order-independent and
    * engine-independent. One codegen pass over the vector
    * ([[VecHash.hyperplaneBuckets]]).
    */
  def bucketIds(vec: Column, tables: Int, planes: Int, dim: Int): Column =
    hashfns.hyperplane_buckets(vec, tables, planes, dim)

  /** LSH-bucketed approximate top-k: score only candidates sharing ≥1 of
    * the query's L table buckets. Returns the same shape as brute force;
    * recall measured against it in the spec.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      tables: Int = 4, planes: Int = 4, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bc = corpus.select(col(idCol).as("neighbor_id"),
      posexplode(bucketIds(col(vecCol), tables, planes, dim)).as(Seq("__t", "__bkt")))
    val bq = queries.select(col(qidCol).as("query_id"),
      posexplode(bucketIds(col(qvecCol), tables, planes, dim)).as(Seq("__t", "__bkt")))
    val cands = bc.join(broadcast(bq), Seq("__t", "__bkt"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val scored = cands
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__q"))), Seq("query_id"))
      .withColumn("__cos", cosine(col("__v"), col("__q")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
