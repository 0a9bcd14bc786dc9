package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: broadcast the (small) query set, score every
  *    row with a codegen'd `zip_with`/`aggregate` dot product, per-query
  *    window top-k. One scan of the corpus, no corpus self-shuffle — the
  *    right baseline at 100TB when queries ≪ corpus.
  *  - Hyperplane-LSH (random projections) bucketing: IVF-style scale path —
  *    equi-join on bucket id restricts scoring to candidates sharing a
  *    bucket; probe multiple buckets for recall.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (built-ins only). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

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

  /** Random-hyperplane bucket id: sign bits of `planes` fixed pseudo-random
    * projections. Deterministic in (dim, planes, seed); hyperplane
    * components come from the splitmix stream.
    */
  def withHyperplaneBucket(df: DataFrame, vecCol: String, planes: Int, seed: Long): DataFrame = {
    // component j of plane p = mix(seed, p, j) mapped to [-1, 1]
    val bucketBits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), size(col(vecCol)) - 1),
            j => pmod(xxhash64(lit(seed), lit(p), j), lit(2000001L)).cast("double") / 1000000.0 - 1.0),
          (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    df.withColumn("__bucket", bucketBits.reduce((a: Column, b: Column) => a.bitwiseOR(b)))
  }

  /** LSH-bucketed approximate top-k: score only candidates sharing the
    * query's hyperplane bucket. Returns the same shape as brute force;
    * recall measured against it in the spec.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      planes: Int = 6, seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bc = withHyperplaneBucket(corpus, vecCol, planes, seed)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"), col("__bucket"))
    val bq = withHyperplaneBucket(queries.withColumnRenamed(qvecCol, "__q"), "__q", planes, seed)
      .select(col(qidCol).as("query_id"), col("__q"), col("__bucket"))
    val scored = bc.join(broadcast(bq), Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", cosine(col("__v"), col("__q")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
