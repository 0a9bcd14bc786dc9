package graft.engine

import graft.model.EpochMetrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Durable snapshot commits with per-partition lineage + metrics.
  *
  * The north rule asks for Iceberg-snapshot semantics; no Iceberg jar ships
  * in this sandbox (SURVEY §7), so this realizes the same contract with
  * partitioned Parquet + an atomic JSON manifest written LAST (rename =
  * commit point). Each snapshot records: epoch, parent epoch, the driver
  * ledger (budget/scope/seq), per-table row + partition counts (lineage),
  * and the per-epoch metrics series. A real Iceberg catalog drops in behind
  * this interface.
  */
class Checkpointer(spark: SparkSession, dir: String, every: Int = 1) {
  private val root = Paths.get(dir)
  Files.createDirectories(root)

  private def q(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def commit(
      epoch: Long,
      frontier: DataFrame, seen: DataFrame, signatures: DataFrame,
      hostTokens: DataFrame, pages: DataFrame,
      seqCounter: Long, wildcardRemaining: Long, pathBudget: Map[String, Long],
      scope: ScopeState, metrics: Seq[EpochMetrics],
      chainStarted: Boolean = false, chainSitemaps: Seq[String] = Nil,
      discoveredSitemaps: Seq[String] = Nil): Unit = {
    if (every <= 0 || epoch % every != 0) return
    val snapDir = root.resolve(s"epoch_$epoch")
    val tables = Seq("frontier" -> frontier, "seen" -> seen,
      "signatures" -> signatures, "host_tokens" -> hostTokens, "pages" -> pages)
    val lineage = tables.map { case (name, df) =>
      df.write.mode("overwrite").parquet(snapDir.resolve(name).toString)
      val parts = df.rdd.getNumPartitions
      val rows = df.count()
      s"""{"table":${q(name)},"rows":$rows,"partitions":$parts}"""
    }
    val budgetJson = pathBudget.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val metricsJson = metrics.map(m =>
      s"""{"epoch":${m.epoch},"candidates":${m.candidates},"admitted":${m.admitted},""" +
      s""""fetched":${m.fetched},"new_links":${m.new_links},"frontier":${m.frontier_size},""" +
      s""""seen":${m.seen_size},"budget_stopped":${m.budget_stopped},""" +
      s""""robots_blocked":${m.robots_blocked},"vetoed":${m.vetoed}}""").mkString("[", ",", "]")
    // chain lineage (A6): a kill during the sitemap chain must resume
    // mid-chain, not degrade to a plain crawl — chainSitemaps carries every
    // sitemap DOC discovered so far (seed /sitemap.xml + recursive
    // <sitemapindex> locs), bounded by sitemap count
    val chainJson = chainSitemaps.map(q).mkString("[", ",", "]")
    // pre-chain rel=sitemap discoveries (A6 auto-discovery): insertion
    // order is part of the contract — it fixes the chain seeds' injection
    // order and hence the sitemap docs' discovery_seq after a resume
    val discJson = discoveredSitemaps.map(q).mkString("[", ",", "]")
    val manifest =
      s"""{"epoch":$epoch,"parent":${epoch - every},"seq_counter":$seqCounter,
         |"chain_started":$chainStarted,"chain_sitemaps":$chainJson,
         |"discovered_sitemaps":$discJson,
         |"wildcard_remaining":$wildcardRemaining,"path_budget":$budgetJson,
         |"scope":{"sub_matcher":${q(scope.subMatcher)},"parent_host":${q(scope.parentHost)},
         |"parent_scheme":${q(scope.parentScheme)},"redirect_host":${q(scope.redirectHost)},
         |"crawl_base":${q(scope.crawlBase)}},
         |"lineage":[${lineage.mkString(",")}],
         |"metrics":$metricsJson}""".stripMargin
    // write manifest atomically (tmp + rename) = the commit point
    val tmp = root.resolve(s".manifest_$epoch.tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, snapDir.resolve("manifest.json"), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Latest committed epoch (manifest present), or -1. */
  def latestEpoch(): Long = {
    if (!Files.exists(root)) return -1L
    val it = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("epoch_") &&
          Files.exists(p.resolve("manifest.json")))
        .map(_.getFileName.toString.stripPrefix("epoch_").toLong)
        .foldLeft(-1L)(math.max)
    } finally it.close()
  }

  def readTable(epoch: Long, name: String): DataFrame =
    spark.read.parquet(root.resolve(s"epoch_$epoch").resolve(name).toString)

  def readManifest(epoch: Long): String =
    Files.readString(root.resolve(s"epoch_$epoch").resolve("manifest.json"))
}

object Checkpointer {
  /** Parse the chain lineage out of a manifest. URLs may legally contain
    * commas and brackets, so the array is walked as JSON quoted strings
    * (matching the writer's `q()` escaping) — never split on ','.
    */
  def chainState(manifest: String): (Boolean, Seq[String]) = {
    val started = manifest.contains("\"chain_started\":true")
    (started, strArray(manifest, "chain_sitemaps"))
  }

  /** Pre-chain rel=sitemap discoveries, in original insertion order. */
  def discoveredSitemaps(manifest: String): Seq[String] =
    strArray(manifest, "discovered_sitemaps")

  private def strArray(manifest: String, key: String): Seq[String] =
    ("\"" + key + "\":\\[((?:\"(?:[^\"\\\\]|\\\\.)*\"(?:,)?)*)\\]").r
      .findFirstMatchIn(manifest).map(_.group(1)).map { body =>
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
      }.getOrElse(Nil)
}
