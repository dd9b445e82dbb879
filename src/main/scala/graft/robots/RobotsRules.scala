package graft.robots

import java.nio.charset.StandardCharsets.UTF_8

/** robots.txt parser + matcher with RFC 9309 / Protego semantics (Protego is
  * the reference's default parser, `scrapy/settings/default_settings.py:475`;
  * public BSD — reimplemented from the documented rules, not ported):
  *
  *  - groups of `User-agent` lines followed by `Allow`/`Disallow` rules;
  *  - agent match: group token `*` matches anyone; otherwise the group
  *    applies when its token is a case-insensitive substring of the caller's
  *    user agent; the longest matching token wins over `*`;
  *  - path match: longest-pattern wins; `Allow` beats `Disallow` on equal
  *    length; `*` wildcard and `$` end-anchor supported; empty pattern is a
  *    no-op rule;
  *  - undecodable/empty body → allow everything
  *    (`scrapy/robotstxt.py:24-42`); fetch failure handled by the caller as
  *    allow-all (`scrapy/downloadermiddlewares/robotstxt.py:128-136`).
  */
final case class RobotsRules(groups: Vector[RobotsRules.Group]) {

  /** Is `url` allowed for `userAgent`? Matches on path + optional query. */
  def allowed(url: String, userAgent: String): Boolean = {
    val split = graft.urlkit.PyUrl.urlsplit(url)
    val rawPath = (if (split.path.isEmpty) "/" else split.path) +
      (if (split.query.nonEmpty) "?" + split.query else "")
    groupFor(userAgent) match {
      case None => true
      case Some(g) =>
        var best: Option[(Int, Boolean)] = None // (patternLength, allow)
        for (r <- g.rules if r.pattern.nonEmpty) {
          if (RobotsRules.pathMatches(r.pattern, rawPath)) {
            val len = r.pattern.length
            best match {
              case Some((bl, ba)) =>
                if (len > bl || (len == bl && r.allow && !ba)) best = Some((len, r.allow))
              case None => best = Some((len, r.allow))
            }
          }
        }
        best.forall(_._2)
    }
  }

  def crawlDelay(userAgent: String): Option[Double] =
    groupFor(userAgent).flatMap(_.crawlDelay)

  private def groupFor(userAgent: String): Option[RobotsRules.Group] = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.iterator
      .flatMap(g => g.agents.filter(a => a != "*" && ua.contains(a)).map(a => (a.length, g)))
      .toSeq
    if (specific.nonEmpty) Some(specific.maxBy(_._1)._2)
    else groups.find(_.agents.contains("*"))
  }
}

object RobotsRules {
  final case class Rule(pattern: String, allow: Boolean)
  final case class Group(agents: Vector[String], rules: Vector[Rule], crawlDelay: Option[Double])

  val AllowAll: RobotsRules = RobotsRules(Vector.empty)

  /** Parse a robots.txt body. Reference `decode_robotstxt`
    * (`robotstxt.py:24-42`): `decode("utf-8-sig", errors="ignore")` — a
    * leading UTF-8 BOM is stripped and undecodable bytes are silently
    * DROPPED, so a stray bad byte does not void the remaining rules (pure
    * binary garbage decodes to directive-less text ⇒ allow-all falls out
    * of the parse, not the decode). */
  def parse(body: Array[Byte]): RobotsRules = {
    if (body == null || body.isEmpty) return AllowAll
    val noBom =
      if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
          (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
        java.util.Arrays.copyOfRange(body, 3, body.length)
      else body
    val dec = UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.IGNORE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.IGNORE)
    val text = dec.decode(java.nio.ByteBuffer.wrap(noBom)).toString
    parse(text)
  }

  def parse(text: String): RobotsRules = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inAgentRun = false // consecutive user-agent lines share one group
    var sawGroup = false

    def flush(): Unit = {
      if (agents.nonEmpty) { groups += Group(agents, rules, delay); sawGroup = true }
      agents = Vector.empty; rules = Vector.empty; delay = None
    }

    for (rawLine <- text.split("\n", -1)) {
      val noComment = {
        val h = rawLine.indexOf('#')
        if (h >= 0) rawLine.substring(0, h) else rawLine
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        // Directive-name variants pinned to Protego's published alias sets
        // (protego.py _USER_AGENT_DIRECTIVE / _DISALLOW_DIRECTIVE /
        // _ALLOW_DIRECTIVE / _CRAWL_DELAY_DIRECTIVE): the space/misspelling
        // aliases below are Protego's, nothing more (RobotsSpec pins both
        // accepted aliases and rejected near-misses).
        key match {
          case "user-agent" | "useragent" | "user agent" =>
            if (!inAgentRun) flush()
            agents = agents :+ value.toLowerCase(java.util.Locale.ROOT)
            inAgentRun = true
          case "disallow" | "dissallow" | "dissalow" | "disalow" | "diasllow" | "disallaw" =>
            inAgentRun = false
            if (agents.nonEmpty) rules = rules :+ Rule(value, allow = false)
          case "allow" =>
            inAgentRun = false
            if (agents.nonEmpty) rules = rules :+ Rule(value, allow = true)
          case "crawl-delay" | "crawl delay" =>
            inAgentRun = false
            if (agents.nonEmpty) delay = value.toDoubleOption.orElse(delay)
          case _ => inAgentRun = false // sitemap etc: group-independent, ignored
        }
      }
    }
    flush()
    val parsed = groups.result()
    if (!sawGroup) AllowAll else RobotsRules(parsed)
  }

  /** Glob-ish robots pattern match: `*` = any run, `$` (final) = end anchor.
    * Greedy backtracking match, linear structure (patterns are short). */
  def pathMatches(pattern0: String, path: String): Boolean = {
    val anchored = pattern0.endsWith("$")
    val pattern = if (anchored) pattern0.dropRight(1) else pattern0
    val parts = pattern.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else if (i == parts.length - 1) {
        if (anchored) {
          return path.length >= pos + part.length && path.endsWith(part)
        } else {
          val idx = path.indexOf(part, pos)
          if (idx < 0) return false
          pos = idx + part.length
          return true
        }
      } else {
        val idx = path.indexOf(part, pos)
        if (idx < 0) return false
        pos = idx + part.length
      }
      i += 1
    }
    // single-part pattern (no '*')
    if (anchored) path == pattern else true
  }
}
