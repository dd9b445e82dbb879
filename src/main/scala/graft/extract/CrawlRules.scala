package graft.extract

/** CrawlSpider Rule plumbing (`scrapy/spiders/crawl.py:61-100,136-158`) —
  * the per-response follow-request generator behind rule-driven crawling:
  *
  *  - ordered [[CrawlRule]]s, each with its own [[LinkExtractor]]
  *  - a cross-rule `seen` set over Link VALUES (url, text, nofollow — the
  *    reference's `Link.__eq__`; `scrapy/link.py:30-38`): the first rule to
  *    extract a link claims it, later rules skip it
  *  - per-rule `process_links` (filter/transform the extracted batch) and
  *    `process_request` (rewrite or drop each request) hooks — the two hook
  *    points the reference exposes on Rule (`crawl.py:146-149` applies them
  *    exactly in this order)
  *  - `follow`: whether responses to THIS rule's requests are expanded
  *    further (`crawl.py:100`: defaults to `not callback` — a pure-follow
  *    rule). Batch form: the emitting rule's index rides on the request
  *    (`meta["rule"]`, `crawl.py:125-131`) as `FrontierRow.ruleIdx`; seeds
  *    (ruleIdx -1) always expand (`CrawlSpider._parse` passes follow=True).
  *
  * Emission order is document order within each rule, rules in declaration
  * order — `emitIdx` numbers every hook-surviving request and becomes the
  * discovery `dLink`, keeping the crawl's ordering key total. Hooks must be
  * PURE and serializable: they run inside Spark tasks and the oracle alike,
  * and determinism of the whole crawl rests on them.
  */
object CrawlRules {

  /** A follow-request as the hooks see it (the Request surrogate):
    * `process_request` may rewrite the URL (`request.replace(url=...)` in
    * the reference tests) — the crawl re-sanitizes and re-fingerprints
    * after the hook — or set meta["allow_offsite"] (`offsite.py:50-55`,
    * contract 7h) to keep an off-domain request schedulable. */
  final case class RuleRequest(url: String, linkText: String, ruleIdx: Int,
      allowOffsite: Boolean = false)

  /** One Rule. `processLinks` runs on the rule's deduped, not-yet-seen
    * extracted links; `processRequest` maps (request, responseUrl) to the
    * request to schedule, or None to drop it. */
  final case class CrawlRule(
      extractor: LinkExtractor = new LinkExtractor(),
      follow: Boolean = true,
      processLinks: Seq[LinkExtract.Link] => Seq[LinkExtract.Link] = identity,
      processRequest: (RuleRequest, String) => Option[RuleRequest] =
        (r: RuleRequest, _: String) => Some(r))

  /** `_requests_to_follow(response)` (`crawl.py:136-149`) over an HTML body:
    * the (emitIdx, request) pairs the rules yield for this response.
    * `respRuleIdx` is the rule that produced the response's request (-1 =
    * seed/non-rule request — always expanded). */
  def followRequests(rules: Seq[CrawlRule], body: Array[Byte],
      pageUrl: String, respRuleIdx: Int): Seq[(Int, RuleRequest)] = {
    if (respRuleIdx >= 0 &&
        (respRuleIdx >= rules.size || !rules(respRuleIdx).follow)) return Nil
    val html = Encoding.decode(body, None)
    val seen = scala.collection.mutable.HashSet.empty[LinkExtract.Link]
    val out = Vector.newBuilder[(Int, RuleRequest)]
    var emitIdx = 0
    for ((rule, ri) <- rules.zipWithIndex) {
      val links = rule.extractor.extractLinks(html, pageUrl)
        .filterNot(seen.contains)
      for (l <- rule.processLinks(links)) {
        seen += l
        val req = RuleRequest(l.url, l.text, ri)
        rule.processRequest(req, pageUrl).foreach { r => out += ((emitIdx, r)) }
        emitIdx += 1 // dropped requests still advance (gaps keep order total)
      }
    }
    out.result()
  }
}
