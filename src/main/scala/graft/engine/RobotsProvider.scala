package graft.engine

import graft.corpus.{CorpusGen, CorpusParams}
import graft.robots.Robots

/** Per-host robots policy source. The reference keeps one parsed
  * `RobotFileParser` per crawl plus a global TTL text cache
  * (`spider/src/utils/robots_cache.rs:24-60`); the distributed engine needs
  * policies on executors, so providers are pure + serializable with a
  * per-JVM parse cache (compile-once, reuse — SURVEY §4).
  */
trait RobotsProvider extends Serializable {
  /** Raw robots fetch result for a host: (status, text). */
  def fetchRobots(host: String): (Int, String)

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Robots.Policy]()

  final def policyFor(host: String): Robots.Policy = {
    val c = cache
    var p = c.get(host)
    if (p == null) {
      val (status, text) = fetchRobots(host)
      p = Robots.fromFetch(status, text)
      c.put(host, p)
    }
    p
  }

  /** robots crawl-delay in ms for (host, ua), clamped to 60s
    * (reference `website.rs:2524-2528`).
    */
  final def crawlDelayMs(host: String, ua: String): Long =
    policyFor(host).crawlDelayMs(ua).map(math.min(_, 60000L)).getOrElse(0L)

  /** Effective robots politeness delay: max(Crawl-delay, Request-rate) —
    * the reference feeds BOTH into the per-domain rate
    * (`rate_limiter.rs:142-153`).
    */
  final def politenessDelayMs(host: String, ua: String): Long = {
    val p = policyFor(host)
    math.max(
      p.crawlDelayMs(ua).map(math.min(_, 60000L)).getOrElse(0L),
      p.requestRateDelayMs(ua).map(math.min(_, 60000L)).getOrElse(0L))
  }
}

/** Robots from the synthetic corpus (pure function of params). */
final class CorpusRobots(params: CorpusParams) extends RobotsProvider {
  override def fetchRobots(host: String): (Int, String) = {
    val d = CorpusGen.robotsFor(params, host)
    (d.status, d.rules_text)
  }
}

/** Robots from a driver-collected map (bounded by host count, broadcast
  * with the closure). For host cardinalities beyond broadcast size the gate
  * would switch to a join against a robots table keyed by host.
  */
final class MapRobots(map: Map[String, (Int, String)]) extends RobotsProvider {
  override def fetchRobots(host: String): (Int, String) =
    map.getOrElse(host, (404, null))
}

/** Everything allowed (respect_robots_txt = false). */
object NoRobots extends RobotsProvider {
  override def fetchRobots(host: String): (Int, String) = (404, null)
}
