package graft

import graft.queries.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB oracle SQL where the op is SQL-expressible
  * (non-SQL ops — the crawl engine itself, sketch-based dedup, LSH ANN,
  * multimodal decode — get rows-only checks and are verified by the
  * ScalaTest differential/spec suites instead).
  */
object SparkEntry {

  /** Flagship: a full crawl through the engine on the synthetic corpus. */
  def entry(spark: SparkSession): DataFrame = Queries.crawlBasic(spark, "")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q3_revenue_topk" -> (Queries.q3RevenueTopK _),
    "q_order_priority" -> (Queries.qOrderPriority _),
    "q_anti_join" -> (Queries.qAntiJoin _),
    "q_semi_join" -> (Queries.qSemiJoin _),
    "q_window_rank" -> (Queries.qWindowRank _),
    "q_distinct_count" -> (Queries.qDistinctCount _),
    // crawl-shaped operators
    "c_url_canon" -> (Queries.cUrlCanon _),
    "b_seen_antijoin" -> (Queries.bSeenAntijoin _),
    "b_depth_gate" -> (Queries.bDepthGate _),
    "b_batch_dedup" -> (Queries.bBatchDedup _),
    "b_budget_quota" -> (Queries.bBudgetQuota _),
    "b_politeness_quota" -> (Queries.bPolitenessQuota _),
    "b_asset_filter" -> (Queries.bAssetFilter _),
    "d_priority_score" -> (Queries.dPriorityScore _),
    // text analysis
    "t_token_count" -> (Queries.tTokenCount _),
    "t_quality" -> (Queries.tQuality _),
    "t_langid" -> (Queries.tLangId _),
    "t_fingerprint" -> (Queries.tFingerprint _),
    // dedup family
    "d_exact_classes" -> (Queries.dExactClasses _),
    "d_minhash_pairs" -> (Queries.dMinhashPairs _),
    "d_simhash_pairs" -> (Queries.dSimhashPairs _),
    "d_ngram_jaccard" -> (Queries.dNgramJaccard _),
    "d_embedding_near_dups" -> (Queries.dEmbeddingNearDups _),
    // similarity search
    "s_ann_brute" -> (Queries.sAnnBrute _),
    "s_ann_lsh" -> (Queries.sAnnLsh _),
    "e_centroids" -> (Queries.eCentroids _),
    // streaming-shaped
    "st_tumbling_window" -> (Queries.stTumblingWindow _),
    // crawl end-to-end (engine)
    "crawl_basic" -> (Queries.crawlBasic _),
    "crawl_budget" -> (Queries.crawlBudget _),
    // multimodal plumbing
    "m_media_meta" -> (Queries.mMediaMeta _)
  )

  /** DuckDB equivalents. Every computed column aliased exactly as in the
    * Spark plan; float aggregates rounded; ranks fully tie-broken.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_revenue_topk" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_order_priority" ->
      "SELECT o_orderpriority, count(*) AS n_orders FROM orders GROUP BY o_orderpriority",
    "q_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q_window_rank" ->
      """SELECT user_id, event_id, rnk FROM (
        | SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
        | FROM events) WHERE rnk <= 3""".stripMargin,
    "q_distinct_count" ->
      "SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts FROM lineitem GROUP BY l_suppkey",
    "c_url_canon" ->
      """SELECT doc_id,
        | 'https://www.site' || CAST(doc_id % 20 AS VARCHAR) || '.com/' ||
        |  (CASE CAST(doc_id % 6 AS INT) WHEN 0 THEN 'products' WHEN 1 THEN 'legal'
        |    WHEN 2 THEN 'en' WHEN 3 THEN 'docs' WHEN 4 THEN 'article' ELSE 'items' END) ||
        |  '/d' || CAST(doc_id AS VARCHAR) || '.html' AS canon_url,
        | 'www.site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS host
        |FROM documents""".stripMargin,
    "b_seen_antijoin" ->
      "SELECT doc_id FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 <> 0",
    "b_depth_gate" ->
      """SELECT doc_id, CAST(doc_id % 5 + 1 AS INT) AS depth FROM documents
        |WHERE doc_id % 5 + 1 <= 3""".stripMargin,
    "b_batch_dedup" ->
      """SELECT 'https://site.com/p' || CAST(doc_id % 100 AS VARCHAR) AS url_lower,
        | min(doc_id) AS first_id, count(*) AS n_variants
        |FROM documents GROUP BY 1""".stripMargin,
    "b_budget_quota" ->
      """SELECT source, doc_id, rn FROM (
        | SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        | FROM documents) WHERE rn <= 10""".stripMargin,
    "b_politeness_quota" ->
      """SELECT host, doc_id, rn FROM (
        | SELECT doc_id % 40 AS host, doc_id,
        |  row_number() OVER (PARTITION BY doc_id % 40 ORDER BY n_chars DESC, doc_id) AS rn
        | FROM documents) WHERE rn <= 5""".stripMargin,
    "b_asset_filter" ->
      """SELECT doc_id, 'https://site.com/f' || CAST(doc_id AS VARCHAR) ||
        | (CASE CAST(doc_id % 8 AS INT) WHEN 0 THEN '.html' WHEN 1 THEN '.png'
        |   WHEN 2 THEN '.php' WHEN 3 THEN '.pdf' WHEN 4 THEN ''
        |   WHEN 5 THEN '.zip' WHEN 6 THEN '.htm' ELSE '.mp4' END) AS url
        |FROM documents WHERE CAST(doc_id % 8 AS INT) IN (0, 2, 4, 6)""".stripMargin,
    "d_priority_score" ->
      """SELECT doc_id, CAST(1000 - (doc_id % 5) * 100 +
        | (CASE CAST(doc_id % 6 AS INT) WHEN 0 THEN 50 WHEN 1 THEN -200
        |   WHEN 4 THEN 50 WHEN 5 THEN 50 ELSE 0 END) AS INT) AS score
        |FROM documents""".stripMargin,
    "t_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | greatest(CAST(ceil(length(text) / 4.0) AS BIGINT),
        |          CAST(len(string_split(text, ' ')) AS BIGINT)) AS n_tokens_bpe
        |FROM documents""".stripMargin,
    "t_quality" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        | round(length(text) * 1.0 / len(string_split(text, ' ')), 4) AS mean_word_len,
        | round(CASE WHEN len(string_split(text, ' ')) < 5 THEN 0.0 ELSE
        |  1.0 - least(0.5, (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0
        |          / greatest(length(text), 1))
        |      - least(0.5, (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 1.0
        |          / greatest(length(text), 1)) END, 4) AS quality_score
        |FROM documents""".stripMargin,
    "t_langid" ->
      """SELECT doc_id,
        | CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS INT) AS en_hits,
        | CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' le ', ''))) / 4 AS INT) AS fr_hits
        |FROM documents""".stripMargin,
    "t_fingerprint" ->
      "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
    "d_exact_classes" ->
      """SELECT substr(text, 1, 40) AS dup_key, min(doc_id) AS representative,
        | count(*) AS dup_count
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "e_centroids" ->
      """SELECT label, count(*) AS n, round(avg(embedding[1]), 4) AS c0,
        | round(avg(embedding[2]), 4) AS c1
        |FROM embeddings GROUP BY label""".stripMargin,
    "st_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "s_ann_brute" ->
      """SELECT query_id, neighbor_id, rank FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC, c.vec_id) AS rank
        | FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
        | WHERE c.vec_id <> q.vec_id) WHERE rank <= 5""".stripMargin
  )
}
