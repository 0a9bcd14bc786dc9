package graft.url

/** Seed URL glob expansion — port of the reference's `expand_url`
  * (`spider/src/features/glob.rs:20-117`):
  *
  *  - `{a,b,c}` lists
  *  - `[0-9]`, `[01-12]` (zero-padded), `[0-20:5]` (stepped) numeric ranges
  *  - `[a-f]` character ranges
  *  - multiple patterns expand as the cartesian product
  *  - no pattern ⇒ empty result (callers fall back to the literal URL)
  */
object Glob {

  private val Pattern = java.util.regex.Pattern.compile(
    """(\{([^}\\{]+)\})|(\[(?:((0*)\d+|[a-z])-(\d+|[a-z])(?::(\d+))?)\])""")

  def expandUrl(url: String): Seq[String] = {
    val m = Pattern.matcher(url)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    while (m.find()) {
      if (m.group(1) != null) {
        // list
        val sub = m.group(1)
        groups += m.group(2).split(",", -1).toSeq.map(item => (item, sub))
      } else if (m.group(3) != null) {
        val sub = m.group(3)
        val start = m.group(4)
        val end = m.group(6)
        val step = Option(m.group(7)).map(_.toInt).getOrElse(1)
        val width = if (m.group(5) != null && m.group(5).nonEmpty) start.length else 0
        (start.toIntOption, end.toIntOption) match {
          case (Some(s), Some(e)) =>
            groups += (s to e by step).map { n =>
              val str = n.toString
              val padded = if (str.length < width) ("0" * (width - str.length)) + str else str
              (padded, sub)
            }
          case _ =>
            val s = start.charAt(0); val e = end.charAt(0)
            groups += (s to e).map(c => (c.toString, sub))
        }
      }
    }
    if (groups.isEmpty) return Seq.empty
    // cartesian product, applying each replacement to the original URL
    groups.foldLeft(Seq(url)) { (acc, items) =>
      for (u <- acc; (rep, sub) <- items) yield u.replace(sub, rep)
    }
  }

  /** Expand a seed list: glob seeds expand, plain seeds pass through
    * (the reference's `get_expanded_links` `website.rs:3875-3885`).
    */
  def expandSeeds(seeds: Seq[String]): Seq[String] =
    seeds.flatMap { s =>
      val ex = expandUrl(s)
      if (ex.isEmpty) Seq(s) else ex
    }
}
