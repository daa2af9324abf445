package graft.core

/** robots.txt evaluation with the reference crawler's semantics
  * (service/crawler/RobotRulesParser.java — Nutch-derived, clean-room
  * re-expression):
  *
  *  - a file is sections of consecutive `User-agent:` lines followed by
  *    ordered `Allow:`/`Disallow:` prefix rules (:315 onward);
  *  - the section used is the one naming the most-preferred matching
  *    agent (position in the caller's agent list = precedence), with
  *    `*` as the fallback (NO_PRECEDENCE analog);
  *  - rule evaluation is FIRST prefix match wins in file order, default
  *    allow (RobotRuleSet.isAllowed:162-185) — an Allow override must
  *    therefore precede the broader Disallow, exactly as in the
  *    reference;
  *  - `Crawl-delay:` is carried per ruleset (seconds; RobotRuleSet
  *    .crawlDelay, stored in ms there).
  */
object Robots {

  final case class Rule(prefix: String, allowed: Boolean)
  final case class RuleSet(rules: Vector[Rule], crawlDelaySec: Long = -1L,
      explicit: Boolean = false) {
    def isAllowed(path: String): Boolean = {
      val p = if (path == null || path.isEmpty) "/" else path
      rules.find(r => p.startsWith(r.prefix)) match {
        case Some(r) => r.allowed
        case None => true
      }
    }
  }
  val EmptyRules: RuleSet = RuleSet(Vector.empty)

  /** Parse for the given agents (most preferred first). Returns the
    * best-precedence explicitly matching section, else the `*` section,
    * else empty rules (everything allowed). */
  def parse(content: String, agents: Seq[String]): RuleSet = {
    val agentLc = agents.map(_.toLowerCase)
    var best: RuleSet = EmptyRules
    var bestPrec = Int.MaxValue // lower = more preferred; * = MaxValue-1
    var curAgents = List.empty[String]
    var inAgentRun = false
    var rules = Vector.empty[Rule]
    var delay = -1L

    def closeSection(): Unit = {
      if (curAgents.nonEmpty && (rules.nonEmpty || delay >= 0)) {
        val explicitPrec = curAgents
          .flatMap(a => agentLc.zipWithIndex.collect {
            case (name, i) if a.split("[ \t]").contains(name) => i
          }).minOption
        val prec = explicitPrec.getOrElse(
          if (curAgents.contains("*")) Int.MaxValue - 1 else Int.MaxValue)
        if (prec < bestPrec && prec != Int.MaxValue) {
          bestPrec = prec
          best = RuleSet(rules, delay, explicit = explicitPrec.isDefined)
        }
      }
      curAgents = Nil; rules = Vector.empty; delay = -1L
    }

    Option(content).getOrElse("").linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) closeSection() // a new section begins
            inAgentRun = true
            curAgents ::= value.toLowerCase
          case "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) rules :+= Rule(value, allowed = false)
          case "allow" =>
            inAgentRun = false
            if (value.nonEmpty) rules :+= Rule(value, allowed = true)
          case "crawl-delay" =>
            inAgentRun = false
            delay = scala.util.Try(value.toDouble.toLong).getOrElse(-1L)
          case _ => () // unknown directives are ignored
        }
      }
    }
    closeSection()
    best
  }

  /** Convenience for column use: is `path` fetchable for `agent`. */
  /** `Sitemap:` directives — RFC 9309 §2.3 treats them as part of the
    * "other records" group: case-insensitive key, valid ANYWHERE in the
    * file, independent of user-agent sections, absolute URL value. The
    * sitemap discovery every crawl frontier seeds from (the reference's
    * crawler fetches robots.txt for exactly this tier of directives,
    * `service/crawler/RobotRulesParser.java`). Order-preserving, blank
    * values dropped, budgeted. */
  def sitemaps(robotsTxt: String): Seq[String] = {
    if (robotsTxt == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    robotsTxt.linesIterator.takeWhile(_ => out.length < 1024).foreach { line =>
      val noComment = {
        val h = line.indexOf('#')
        if (h >= 0) line.substring(0, h) else line
      }
      val i = noComment.indexOf(':')
      if (i > 0 && noComment.substring(0, i).trim.equalsIgnoreCase("sitemap")) {
        val v = noComment.substring(i + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.toSeq
  }

  def isAllowed(robotsTxt: String, agent: String, path: String): Boolean =
    parse(robotsTxt, Seq(agent)).isAllowed(path)

  /** Crawl delay in seconds for `agent` (-1 when unset). */
  def crawlDelay(robotsTxt: String, agent: String): Long =
    parse(robotsTxt, Seq(agent)).crawlDelaySec
}
