package graft.oracle

import scala.collection.mutable
import graft._
import graft.extract.LinkExtract
import graft.robots.RobotsRules
import graft.urlkit.UrlKit

/** Single-threaded reference-semantics scheduler (SURVEY.md §5, §7.4): the
  * executable form of the epoch-BSP crawl contract documented on
  * [[graft.CrawlConfig]]. The Spark engine must produce a byte-identical
  * ordered fetch log, URL-seen set and counters for the same
  * (seeds, config, corpus).
  *
  * Semantics translated from the reference's scheduler/pqueues/middlewares
  * (`scrapy/core/scheduler.py`, `scrapy/pqueues.py:143-198`,
  * `scrapy/dupefilters.py:94-105`, `scrapy/downloadermiddlewares/
  * {robotstxt,retry,redirect}.py`) — behavior, not code.
  */
object Oracle {

  /** Stored HTTP-cache entry (contract 6d/6f): virtual store time, response
    * status and Cache-Control — what the rfc2616 freshness check reads.
    * DummyPolicy entries carry (t, status, null). */
  final case class CacheEntry(storedTMs: Long, status: Int, cacheControl: String)

  final case class Result(
      fetchLog: Vector[FetchLogRow],
      urlSeen: Set[String], // fp hex
      counters: Map[String, Long],
      epochs: Int,
      httpCache: Map[String, CacheEntry] = Map.empty, // stored responses (6d/6f)
      // CoreStats finish_reason analogue (contract step 9)
      finishReason: String = "finished")

  def run(
      cfg: CrawlConfig,
      seeds: Seq[SeedRow],
      pages: Map[String, PageRow], // canonical url -> page
      robots: Map[String, Option[Array[Byte]]],
      dns: Map[String, String] = Map.empty, // host -> ip (resolver cache)
      primedCache: Map[String, CacheEntry] = Map.empty): Result = { // prior crawl's cache

    val counters = mutable.Map.empty[String, Long].withDefaultValue(0L)
    def inc(k: String, by: Long = 1): Unit = counters(k) += by
    val defaultRefererPolicy = graft.urlkit.Referer.named(cfg.refererPolicy)

    val urlSeen = mutable.HashSet.empty[String]
    var frontier = Vector.empty[FrontierRow]
    // OffsiteMiddleware domains_seen (contract 7h): offsite/filtered per
    // dropped schedule, offsite/domains once per distinct non-empty host
    val offsiteDomainsSeen = mutable.HashSet.empty[String]
    def offsiteDrop(host: String): Unit = {
      inc("offsite/filtered")
      if (host != null && host.nonEmpty && offsiteDomainsSeen.add(host))
        inc("offsite/domains")
    }
    // politeness state keyed by SLOT (contract step 1: host, or resolved IP
    // under perIpSlots — hosts missing from dns fall back to host)
    def slotOf(host: String): String =
      if (cfg.perIpSlots) dns.getOrElse(host, host) else host
    // meta["download_slot"] wins outright over host/IP keying (contract 7f,
    // reference get_slot_key)
    def slotFor(r: FrontierRow): String =
      if (r.downloadSlot.nonEmpty) r.downloadSlot else slotOf(r.host)
    val slotLastT = mutable.Map.empty[String, Long].withDefaultValue(Long.MinValue)
    // stored adaptive AutoThrottle delay per slot (contract step 1a); absent
    // = unset (-1 on the engine side)
    val slotDelayState = mutable.Map.empty[String, Long]
    val robotsCache = mutable.Map.empty[String, RobotsRules]
    // request headers (contract step 6a)
    def authOf(host: String): String = cfg.authorizationFor(host)
    def proxyOf(url: String): String =
      cfg.proxyFor(graft.urlkit.PyUrl.urlparse(url).scheme, UrlKit.hostOf(url))
    // Proxy-Authorization when the routed proxy carries credentials (6a)
    def proxyAuthOf(url: String): String =
      cfg.proxyAuthFor(graft.urlkit.PyUrl.urlparse(url).scheme,
        UrlKit.hostOf(url))
    // domain-keyed cookie jar (graft.operators.Cookies tier-2 contract):
    // header from the epoch-start snapshot, entries keyed (domain, path,
    // name); Set-Cookie applied at epoch end in seq order. sendable()
    // evaluates domain/path/expiry(at the fetch's virtual time)/secure —
    // shared with the engine so both sides agree byte-for-byte.
    import graft.operators.Cookies
    // jar key = (meta["cookiejar"] id, domain, path, name) — "" is the
    // default jar (`cookies.py:52-66`); a request only reads/writes its own
    // jar, and meta["dont_merge_cookies"] bypasses the middleware per
    // request (`cookies.py:79-81,96-98`)
    val cookieJar =
      mutable.Map.empty[(String, String, String, String), Cookies.ParsedCookie]
    def cookieHeader(jar: String, host: String, url: String, t: Long): String = {
      if (!cfg.cookiesEnabled) return null // COOKIES_ENABLED=false: no mw
      val reqPath = Cookies.reqPathOf(url)
      val i = url.indexOf("://")
      val scheme = if (i < 0) "" else url.substring(0, i)
      Cookies.renderHeader(
        cookieJar.iterator.filter { case (k, c) =>
          k._1 == jar &&
            Cookies.sendable(host, reqPath, scheme, t, c.domain, c.hostOnly,
              c.path, c.expiresMs, c.secure)
        }.map { case (_, c) => (c.name, c.value) }.toSeq).orNull
    }
    val fetchLog = Vector.newBuilder[FetchLogRow]
    var fetchSeq = 0L
    var pageFetches = 0L
    // virtual high-water mark over non-cached fetches (contract step 9:
    // the CLOSESPIDER_TIMEOUT analogue runs on the virtual clock)
    var virtualTMax = -1L
    // HTTP cache (contract step 6d/6f): fp -> stored entry. Stores become
    // VISIBLE at epoch end (BSP, like cookies) — the engine joins the
    // epoch-start cache table, so the oracle must too. Under rfc2616 a hit
    // additionally requires FRESHNESS at the row's walk-time virtual clock.
    val httpCache = mutable.Map.empty[String, CacheEntry] ++ primedCache
    val policyDummy = cfg.httpcachePolicy != "rfc2616"
    def freshHit(fpHex: String, nowMs: Long): Boolean =
      httpCache.get(fpHex).exists(e => policyDummy ||
        graft.operators.Rfc2616Policy.freshAt(e.status, e.cacheControl,
          e.storedTMs, nowMs))

    // ---- seed enqueue (contract step 0: start requests carry
    // dont_filter=True — `Spider.start()` yields
    // `Request(url, dont_filter=True)`, `spiders/__init__.py:102-109`, and
    // the scheduler never consults the dupefilter for such requests,
    // `core/scheduler.py:343` — so duplicate seed URLs each enqueue AND
    // fetch, and seed fingerprints are NOT recorded in url_seen: a later
    // organic link to a seeded URL is a dupefilter MISS) -------------------
    for (s <- seeds.sortBy(_.seq)) {
      val url = UrlKit.safeUrlString(s.url)
      val fp = UrlKit.fingerprint(url)
      inc("scheduler/enqueued")
      frontier = frontier :+ FrontierRow(url, fp, UrlKit.hostOf(url), s.priority,
        0, isStart = true, dEpoch = -1, dParent = s.seq, dLink = 0,
        retryTimes = 0, redirectTimes = 0, dontFilter = true,
        dontObeyRobots = s.dontObeyRobots, cookieJar = s.cookieJar,
        dontMergeCookies = s.dontMergeCookies,
        dontRedirect = s.dontRedirect, dontRetry = s.dontRetry,
        maxRetryTimes = s.maxRetryTimes,
        handleHttpstatus = s.handleHttpstatus, dontCache = s.dontCache,
        downloadSlot = s.downloadSlot, downloadMaxSize = s.downloadMaxSize,
        allowOffsite = s.allowOffsite)
    }

    // discovery-order comparator: (dEpoch, dParent, dLink) lexicographic
    def discLt(a: FrontierRow, b: FrontierRow): Boolean =
      if (a.dEpoch != b.dEpoch) a.dEpoch < b.dEpoch
      else if (a.dParent != b.dParent) a.dParent < b.dParent
      else a.dLink < b.dLink

    /** Dequeue comparator (CrawlConfig contract step 2). */
    def dequeueLt(a: FrontierRow, b: FrontierRow): Boolean = {
      if (a.priority != b.priority) a.priority > b.priority
      else if (a.isStart != b.isStart) !a.isStart // non-start first
      else if (a.isStart) discLt(a, b) // starts always FIFO
      else if (cfg.queueOrder == "lifo") discLt(b, a)
      else discLt(a, b)
    }

    var epoch = 0
    var stop = false
    while (frontier.nonEmpty && epoch < cfg.maxEpochs && !stop) {
      // virtual clock origin (contract 6f): default 0 = historical timeline
      val epochStart = cfg.virtualClockStartMs + epoch.toLong * cfg.epochMs
      val bySlot = frontier.groupBy(slotFor)
      val epochFetches = mutable.ArrayBuffer.empty[(Long, String, Int, FrontierRow, Boolean, Boolean, String)]
      // (virtualT, host, perHostIdx, row-or-robots, isRobots, cacheHit,
      //  walked slot — the step-5 tiebreak under download_slot meta, 7f)
      var remaining = Vector.newBuilder[FrontierRow]
      // per-response delay-adjust events replayed at epoch end (step 1a):
      // (seq, slot, latencyMs, status)
      val delayEvents = mutable.ArrayBuffer.empty[(Long, String, Long, Int)]

      // per-slot delay resolved at epoch start + the step-1a budget it
      // implies — mirrors CrawlEngine's withState exactly
      val dlyOf: Map[String, Long] = bySlot.keysIterator.map(s =>
        s -> cfg.resolveSlotDelay(s, slotDelayState.getOrElse(s, -1L))).toMap
      val capOf: Map[String, Int] = bySlot.keysIterator.map(s =>
        s -> cfg.budgetFor(dlyOf(s), cfg.slotCapOf(s))).toMap

      // per-slot budgets (contract step 1b): the step-1a cap, or the max-min
      // fair allocation of the global epoch cap — mirrors CrawlEngine exactly
      val budgetOf: String => Int =
        if (cfg.maxFetchesPerEpoch <= 0) capOf
        else {
          val cap = cfg.maxFetchesPerEpoch
          val demand = bySlot.view
            .map { case (s, rows) => s -> math.min(rows.size, capOf(s)) }.toMap
          def allocated(f: Int): Long =
            demand.valuesIterator.map(d => math.min(d, f).toLong).sum
          var lo = 0
          var hi = cfg.maxSlotBudget
          while (lo < hi) {
            val mid = (lo + hi + 1) / 2
            if (allocated(mid) <= cap) lo = mid else hi = mid - 1
          }
          val f = lo
          var rem = cap - (if (f == 0) 0L else allocated(f))
          val extra = mutable.Map.empty[String, Int]
          for (slot <- demand.keys.toSeq.sorted if demand(slot) > f) {
            if (rem > 0) { extra(slot) = 1; rem -= 1 }
          }
          s => math.min(capOf(s), f + extra.getOrElse(s, 0))
        }

      for ((slot, rows) <- bySlot.toSeq.sortBy(_._1)) {
        val sorted = rows.sortWith(dequeueLt)
        // charged-departure schedule (contract steps 4 + 4a): `concurrency`
        // transfers per delay tick; hits/forbidden are not departures; tick
        // lengths from the shared cfg.tickLen authority (randomize-aware)
        val tBase = math.max(
          slotLastT(slot) + cfg.tickLen(slot, epoch, 0L, dlyOf(slot)), epochStart)
        var transfers = 0
        var tickSum = 0L
        var ticksAdded = 0L
        def curT: Long = {
          val tc = (transfers / cfg.concurrency).toLong
          while (ticksAdded < tc) {
            ticksAdded += 1
            tickSum += cfg.tickLen(slot, epoch, ticksAdded, dlyOf(slot))
          }
          tBase + tickSum
        }
        var budgetLeft = budgetOf(slot)
        var stopped = false
        val hostIdx = mutable.Map.empty[String, Int].withDefaultValue(0)
        for (row <- sorted) {
          if (stopped) remaining += row
          else {
            val host = row.host
            // data:/file: rows skip robots entirely (contract 6e)
            val localRow = cfg.localSchemes &&
              graft.operators.LocalFetch.isLocal(row.url)
            // (the row's cache-hit check happens AFTER the robots surcharge
            // below — its rfc2616 freshness reads the walk clock, which a
            // robots fetch may have advanced; mirrors CrawlEngine)
            // robots fetch charged once per host per epoch, before its first
            // row — even when no page unit remains after it (contract step 2);
            // never triggered by a dont_obey_robotstxt row, and the robots
            // URL takes the triggering request's scheme (`robotstxt.py:
            // 57-59,82-99`). Robots middleware runs BEFORE httpcache, so a
            // cached page row still triggers/consults robots; the robots
            // fetch itself may be a cache hit (then it charges nothing).
            if (cfg.robotsObey && !row.dontObeyRobots && !localRow &&
                !robotsCache.contains(host)) {
              val scheme = row.url.substring(0, math.max(row.url.indexOf("://"), 0))
              val robotsUrl = s"$scheme://$host/robots.txt"
              val fp = UrlKit.fingerprint(robotsUrl)
              // robots responses are never storable under rfc2616 (6f)
              val robotsHit = cfg.httpcacheEnabled && policyDummy &&
                httpCache.contains(UrlKit.toHex(fp))
              if (robotsHit || budgetLeft >= 1) {
                val rules = robots.get(host).flatten match {
                  case Some(body) => RobotsRules.parse(body)
                  case None => RobotsRules.AllowAll // missing/errored → allow
                }
                robotsCache(host) = rules
                inc("robotstxt/request_count")
                val status = if (robots.get(host).flatten.isDefined) 200 else 599
                epochFetches += ((curT, host,
                  -1, FrontierRow(robotsUrl, fp, host, 1000, 0, isStart = false,
                    dEpoch = epoch, dParent = -1, dLink = -1, 0, 0, dontFilter = true),
                  true, robotsHit, slot))
                inc(s"downloader/response_status_count/$status")
                if (!robotsHit) {
                  slotLastT(slot) = curT
                  transfers += 1
                  budgetLeft -= 1
                }
              }
              // no budget for a robots MISS → the row cannot proceed either
              // (robots unknown): falls to the stop branch below
            }
            val robotsResolved = !cfg.robotsObey || row.dontObeyRobots ||
              localRow || robotsCache.contains(host)
            // cache-hit rows (contract 6d) bypass the downloader: no budget
            // unit, no virtual-time advance — logged at the slot's next-fetch
            // time as of their walk position; file: is an ignore-scheme (6e);
            // rfc2616 requires freshness at the walk clock, stale = miss (6f)
            val rowHit = cfg.httpcacheEnabled && !row.url.startsWith("file:") &&
              !row.dontCache && // meta["dont_cache"]: no lookup (7d)
              freshHit(UrlKit.toHex(row.fp), curT)
            if (robotsResolved && (rowHit || budgetLeft >= 1)) {
              inc("scheduler/dequeued")
              val rules = robotsCache.getOrElse(host, RobotsRules.AllowAll)
              if (cfg.robotsObey && !row.dontObeyRobots && !localRow &&
                  !rules.allowed(row.url, cfg.effectiveRobotsUserAgent)) {
                inc("robotstxt/forbidden")
                if (!rowHit) budgetLeft -= 1 // charged, but not a departure
              } else {
                epochFetches += ((curT, host, hostIdx(host), row, false, rowHit,
                  slot))
                hostIdx(host) += 1
                if (!rowHit) {
                  slotLastT(slot) = curT
                  transfers += 1
                  budgetLeft -= 1
                }
              }
            } else {
              remaining += row
              stopped = true
            }
          }
        }
      }

      // global order: (t, host, perHostIdx)
      // step 5 order (t, host, slot, idx): slot only breaks ties when one
      // host spans two slots in an epoch (download_slot meta, contract 7f)
      val ordered = epochFetches.sortBy {
        case (t, host, i, _, _, _, slot) => (t, host, slot, i) }
      val candidates = mutable.ArrayBuffer.empty[FrontierRow]
      val epochSetCookies =
        mutable.ArrayBuffer.empty[(Long, String, Cookies.ParsedCookie)]
      // cache stores, visible (and latest-wins-replacing) at epoch end
      val epochStores = mutable.ArrayBuffer.empty[(String, CacheEntry)]
      for ((t, host, _, row, isRobots, hit, _) <- ordered) {
        val seq = fetchSeq
        fetchSeq += 1
        if (isRobots) {
          val status = if (robots.get(host).flatten.isDefined) 200 else 599
          if (cfg.httpcacheEnabled) {
            if (hit) inc("httpcache/hit")
            else {
              inc("httpcache/miss")
              if (status != 599) { // robots error = exception, no response
                inc("httpcache/firsthand")
                // rfc2616: a header-less robots 200 is never storable (6f)
                val ok =
                  if (policyDummy) !cfg.httpcacheIgnoreHttpCodes.contains(status)
                  else graft.operators.Rfc2616Policy.storable(status, null)
                if (ok) {
                  inc("httpcache/store")
                  epochStores += ((UrlKit.toHex(row.fp), CacheEntry(t, status, null)))
                }
              }
            }
          }
          // a robots request is a FRESH Request (`robotstxt.py:82-99`) —
          // default jar, no dont_merge meta
          val rCookies = cookieHeader("", host, row.url, t)
          // DownloaderStats (contract 6h): robots fetches traverse the full
          // downloader middleware chain (`robotstxt.py` downloads via
          // crawler.engine.download), so the stats middleware counts them;
          // a 599 robots error is an exception — request counted, no
          // response bytes
          inc("downloader/request_count")
          inc("downloader/request_method_count/GET")
          inc("downloader/request_bytes", graft.operators.DownloaderStats
            .requestBytes(row.url, "GET", "", null, rCookies, cfg.userAgent,
              authOf(host), proxyAuthOf(row.url)))
          if (status != 599) {
            inc("downloader/response_count")
            inc("downloader/response_bytes",
              graft.operators.DownloaderStats.responseBytes(status,
                robots.get(host).flatten.map(_.length.toLong).getOrElse(0L),
                Nil))
          }
          fetchLog += FetchLogRow(epoch, seq, host, row.url, row.fp, t, status,
            isRobots = true, cookies = rCookies,
            userAgent = cfg.userAgent, authorization = authOf(host),
            proxy = proxyOf(row.url), cached = hit,
            proxyAuth = proxyAuthOf(row.url))
          if (!hit) virtualTMax = math.max(virtualTMax, t)
        } else {
          pageFetches += 1
          val canonical = UrlKit.canonicalizeUrl(row.url)
          // local-scheme dispatch (contract 6e): data:/file: rows never
          // consult the corpus — the handler result is shaped as a latency-
          // free PageRow (body kept only for HTML) so the expansion below is
          // shared with corpus pages
          val isLocalRow = cfg.localSchemes &&
            graft.operators.LocalFetch.isLocal(row.url)
          val localResp =
            if (isLocalRow) Some(graft.operators.LocalFetch.fetch(row.url))
            else None
          val pageOpt: Option[PageRow] =
            if (isLocalRow) localResp.filter(_.status == 200).map(lr =>
              PageRow(row.url, 200, null,
                if (lr.isHtml) lr.body else null, null, 0))
            else pages.get(canonical)
          // download timeout (contract step 6c): no response — an exception,
          // retried like a retryable status. A cached response never times
          // out (contract 6d: it has no download latency). A missing file:
          // is the same retried-exception shape (6e); a bad data: URI is an
          // exception that is NOT retried (ValueError).
          val timedOut =
            if (isLocalRow) localResp.exists(lr => lr.status == 599 && lr.retryExc)
            else !hit && cfg.downloadTimeoutMs > 0 &&
              pageOpt.exists(_.latencyMs >= cfg.downloadTimeoutMs)
          val localNoRetryExc =
            isLocalRow && localResp.exists(lr => lr.status == 599 && !lr.retryExc)
          // download max size (contract 6g): the handler cancels a download
          // whose RAW body exceeds the effective limit — an exception with
          // no response, NOT retried (CancelledError isn't in
          // RETRY_EXCEPTIONS). Timeout wins the tie; cached and local-scheme
          // rows never reach the HTTP handler's check.
          val effMaxSize =
            if (row.downloadMaxSize >= 0) row.downloadMaxSize
            else cfg.downloadMaxSize
          val oversize = !hit && !timedOut && !isLocalRow && effMaxSize > 0 &&
            pageOpt.exists(p => p.body != null && p.body.length > effMaxSize)
          val status =
            if (timedOut || localNoRetryExc || oversize) 599
            else pageOpt.map(_.status).getOrElse(404)
          inc("downloader/request_count")
          // DownloaderStats byte/method counters (contract 6h): request
          // bytes from the SAME rendered headers the fetch log records;
          // response bytes for every non-exception response (incl. cache
          // hits — stats at 850 wraps the cache middleware at 900), RAW
          // body + the reference's header-size formula
          val pCookies = if (row.dontMergeCookies) null // cookies.py:79-81
            else cookieHeader(row.cookieJar, host, row.url, t)
          inc(s"downloader/request_method_count/${row.method}")
          inc("downloader/request_bytes", graft.operators.DownloaderStats
            .requestBytes(row.url, row.method, row.reqBody, row.referer,
              pCookies, cfg.userAgent, authOf(host), proxyAuthOf(row.url)))
          if (timedOut || localNoRetryExc || oversize) {
            inc("downloader/exception_count")
            inc("downloader/exception_type_count/" +
              (if (oversize) "asyncio.exceptions.CancelledError"
               else if (isLocalRow) localResp.get.excClass // handler's class (6e)
               else "twisted.internet.error.TimeoutError"))
          } else {
            inc(s"downloader/response_status_count/$status")
            inc("downloader/response_count")
            val respBodyLen =
              if (isLocalRow)
                localResp.flatMap(lr => Option(lr.body)).map(_.length.toLong)
                  .getOrElse(0L)
              else pageOpt.flatMap(p => Option(p.body)).map(_.length.toLong)
                .getOrElse(0L)
            val respHdrs =
              if (isLocalRow) Nil // contract 6e: handler responses, no headers
              else pageOpt.map(p => graft.operators.DownloaderStats
                .responseHeaders(p.location, p.contentEncoding,
                  p.refererPolicy, p.setCookie, p.cacheControl))
                .getOrElse(Nil)
            inc("downloader/response_bytes", graft.operators.DownloaderStats
              .responseBytes(status, respBodyLen, respHdrs))
          }
          if (cfg.httpcacheEnabled && !row.url.startsWith("file:") &&
              !row.dontCache) { // dont_cache: NO httpcache counters (7d)
            if (hit) inc("httpcache/hit")
            else {
              inc("httpcache/miss")
              if (status != 599) { // every first-hand response
                inc("httpcache/firsthand")
                val cc = pageOpt.map(_.cacheControl).orNull
                // dummy: store all but HTTPCACHE_IGNORE_HTTP_CODES (6d);
                // rfc2616: should_cache_response over Cache-Control (6f)
                val ok =
                  if (policyDummy) !cfg.httpcacheIgnoreHttpCodes.contains(status)
                  else graft.operators.Rfc2616Policy.storable(status, cc)
                if (ok) {
                  inc("httpcache/store")
                  epochStores += ((UrlKit.toHex(row.fp),
                    CacheEntry(t, status, if (policyDummy) null else cc)))
                }
              }
            }
          }
          fetchLog += FetchLogRow(epoch, seq, host, row.url, row.fp, t, status,
            isRobots = false, referer = row.referer, cookies = pCookies,
            userAgent = cfg.userAgent, authorization = authOf(host),
            proxy = proxyOf(row.url), cached = hit, method = row.method,
            proxyAuth = proxyAuthOf(row.url))
          if (!hit) virtualTMax = math.max(virtualTMax, t)
          // meta["max_retry_times"] overrides RETRY_TIMES (7d); a retry is
          // the SAME request re-enqueued — copy() keeps all meta, like the
          // reference's request.replace
          val effMaxRetry =
            if (row.maxRetryTimes >= 0) row.maxRetryTimes else cfg.retryTimes
          // slot write-back (contract 7f): a DOWNLOADED response's request
          // carries the slot it ran under; derived requests inherit it.
          // Cache hits never enter the downloader — no write-back.
          val inheritedSlot = if (hit) row.downloadSlot else slotFor(row)
          def retryCand(): FrontierRow = row.copy(priority = row.priority - 1,
            isStart = false, dEpoch = epoch, dParent = seq, dLink = -2,
            retryTimes = row.retryTimes + 1, dontFilter = true,
            downloadSlot = inheritedSlot)
          def httperrorIgnore(st: Int): Unit = { // HttpError drop (7d)
            inc("httperror/response_ignored_count")
            inc(s"httperror/response_ignored_status_count/$st")
          }
          if (timedOut) {
            // meta["dont_retry"]: the exception fails silently (7d)
            if (!row.dontRetry) {
              if (row.retryTimes < effMaxRetry) {
                inc("retry/count")
                candidates += retryCand()
              } else inc("retry/max_reached")
            }
          } else if (oversize) {
            // cancelled download (6g): no response, no retry — the request
            // drops with no spider input and no HttpError counters
          } else if (pageOpt.isEmpty && status != 599) {
            // corpus-miss 404: a real response that reaches the spider with
            // no body — the HttpError gate applies (7d); 599 local
            // exceptions have no response
            if (!cfg.httperrorAllowed(status, row.handleHttpstatus))
              httperrorIgnore(status)
            else if (cfg.depthStatsVerbose && row.depth == 0)
              inc("request_depth_count/0") // _init_depth (7e)
          } else pageOpt.foreach { page =>
            // AutoThrottle adjust event: every fetch with a real response
            // (contract step 1a), replayed at epoch end in seq order —
            // cached responses have no download latency (contract 6d), and
            // neither do local-scheme responses (6e)
            if (cfg.autothrottle && !hit && !isLocalRow)
              delayEvents += ((seq, slotFor(row), page.latencyMs.toLong, status))
            if (cfg.cookiesEnabled && !row.dontMergeCookies)
              for (c <- Cookies.parseSetCookies(page.setCookie, host,
                  Cookies.reqPathOf(row.url), t, cfg.virtualClockStartMs))
                epochSetCookies += ((seq, row.cookieJar, c))
            // decompression stage (contract step 6b) — must mirror
            // CrawlEngine's expansion flatMap exactly: nothing decodable →
            // no counters (reference `if not to_decode: return response`);
            // an unknown remaining coding leaves the body opaque
            var body: Array[Byte] = page.body
            val enc = Option(page.contentEncoding).filter(_.nonEmpty)
            if (body != null && enc.isDefined) {
              val (toDecode, keptPre) =
                graft.extract.HttpCompression.splitEncodings(enc.get)
              if (toDecode.isEmpty) {
                if (keptPre.nonEmpty) body = null
              } else try {
                // decompression honours meta["download_maxsize"] (6b/6g)
                val (decoded, kept) = graft.extract.HttpCompression.decode(
                  body, enc.get, effMaxSize)
                inc("httpcompression/response_count")
                inc("httpcompression/response_bytes", decoded.length.toLong)
                body = if (kept.isEmpty) decoded else null
              } catch {
                case _: graft.extract.HttpCompression.MaxSizeExceeded =>
                  inc("httpcompression/max_size_exceeded"); body = null
                case _: java.io.IOException =>
                  inc("httpcompression/decode_error"); body = null
              }
            }
            // a redirect request inherits the full meta (request.replace) —
            // copy() keeps it, the Referer is re-patched per step 7b. Method
            // conversion (contract 7g): 302/303 → GET + empty body
            // (`redirect.py:177-181`), meta-refresh ALWAYS converts; 301/
            // 307/308 keep method+body — mirrors CrawlEngine exactly
            def redirectCand(target: String, patched: String,
                toGet: Boolean): FrontierRow = {
              val m = if (toGet) "GET" else row.method
              val b = if (toGet) "" else row.reqBody
              row.copy(url = target,
                fp = UrlKit.fingerprint(target, m, b.getBytes(
                  java.nio.charset.StandardCharsets.UTF_8)),
                host = UrlKit.hostOf(target), priority = row.priority + 2,
                isStart = false, dEpoch = epoch, dParent = seq, dLink = -1,
                redirectTimes = row.redirectTimes + 1, referer = patched,
                downloadSlot = inheritedSlot, method = m, reqBody = b)
            }
            if (CrawlConfig.RedirectStatuses.contains(status) &&
                page.location != null && !row.dontRedirect &&
                UrlKit.redirectSchemeOk(UrlKit.safeUrlString(
                  UrlKit.redirectTarget(row.url, page.location)))) {
              // Location resolution + scheme gate (`redirect.py:163-173`)
              // mirror CrawlEngine: a non-http(s) target passes the
              // response through to the spider chain (HttpError gate)
              if (row.redirectTimes < cfg.maxRedirectTimes) {
                val target = UrlKit.safeUrlString(UrlKit.redirectTarget(row.url, page.location))
                // schedule-time offsite (contract 7h) — mirrors CrawlEngine
                val tHost = UrlKit.hostOf(target)
                if (cfg.offsiteFiltered(tHost, row.dontFilter,
                    row.allowOffsite)) offsiteDrop(tHost)
                else {
                val patched =
                  if (row.referer == null) null
                  else defaultRefererPolicy.referrer(
                    UrlKit.safeUrlString(row.referer), target).orNull
                candidates += redirectCand(target, patched,
                  toGet = CrawlConfig.redirectToGet(status))
                }
              } else inc("redirect/max_reached")
            } else if (CrawlConfig.RetryStatuses.contains(status) &&
                !row.dontRetry) {
              if (row.retryTimes < effMaxRetry) {
                inc("retry/count")
                candidates += retryCand()
              } else {
                inc("retry/max_reached")
                // the exhausted RESPONSE reaches the spider (7d)
                if (!cfg.httperrorAllowed(status, row.handleHttpstatus))
                  httperrorIgnore(status)
                else if (cfg.depthStatsVerbose && row.depth == 0)
                  inc("request_depth_count/0") // _init_depth (7e)
              }
            } else if (status != 599 &&
                cfg.httperrorAllowed(status, row.handleHttpstatus) &&
                body != null) {
              // meta-refresh intercept (contract step 7a) — mirrors
              // CrawlEngine; meta["dont_redirect"] skips it (7d)
              val mrTarget = (if (row.dontRedirect) None
                else graft.extract.MetaRefresh.findInBytes(body))
                .filter(_._1 < cfg.metarefreshMaxDelay)
                .map { case (_, u) => UrlKit.safeUrlString(UrlKit.urljoin(row.url, u)) }
                .filter { tgt =>
                  val s = graft.urlkit.PyUrl.urlparse(tgt).scheme
                  s == "http" || s == "https"
                }
              if (mrTarget.isDefined) {
                val target = mrTarget.get
                if (row.redirectTimes < cfg.maxRedirectTimes) {
                  val tHost = UrlKit.hostOf(target) // offsite at schedule (7h)
                  if (cfg.offsiteFiltered(tHost, row.dontFilter,
                      row.allowOffsite)) offsiteDrop(tHost)
                  else {
                  val patched =
                    if (row.referer == null) null
                    else defaultRefererPolicy.referrer(
                      UrlKit.safeUrlString(row.referer), target).orNull
                  candidates += redirectCand(target, patched, toGet = true)
                  }
                } else inc("redirect/max_reached")
              } else {
              // depth-0 init (7e): only when the response actually reaches
              // the spider (a qualifying meta-refresh was consumed first)
              if (cfg.depthStatsVerbose && row.depth == 0)
                inc("request_depth_count/0")
              if (cfg.crawlRules.nonEmpty) {
                // CrawlSpider rule walk (contract 7c) — mirrors CrawlEngine
                val childDepth = row.depth + 1
                val policy = graft.urlkit.Referer.policyFor(
                  page.refererPolicy, defaultRefererPolicy)
                val reqs = graft.extract.CrawlRules.followRequests(
                  cfg.crawlRules, body, row.url, row.ruleIdx)
                if (cfg.depthLimit == 0 || childDepth <= cfg.depthLimit) {
                  for ((emitIdx, rq) <- reqs) {
                    val u = UrlKit.safeUrlString(rq.url)
                    val childHost = UrlKit.hostOf(u)
                    if (cfg.offsiteFiltered(childHost, dontFilter = false,
                        rq.allowOffsite)) offsiteDrop(childHost)
                    else if (u.length <= cfg.urlLengthLimit) // urllength: silent
                      candidates += FrontierRow(u, UrlKit.fingerprint(u),
                        childHost, -childDepth * cfg.depthPriority, childDepth,
                        isStart = false, dEpoch = epoch, dParent = seq,
                        dLink = emitIdx, 0, 0, dontFilter = false,
                        referer = policy.referrer(row.url, u).orNull,
                        ruleIdx = rq.ruleIdx, allowOffsite = rq.allowOffsite)
                  }
                } else inc("depth/filtered", reqs.size.toLong)
              } else {
              val childDepth = row.depth + 1
              val policy = graft.urlkit.Referer.policyFor(
                page.refererPolicy, defaultRefererPolicy)
              val links = LinkExtract.extract(body, row.url, cfg.urlLengthLimit,
                cfg.linkFilter)
              // form submission (contract 7g) — mirrors CrawlEngine: the
              // first form's from_response request is discovered AFTER all
              // links (FormDLink) and walks the same depth/offsite/urllength
              // chain; its fingerprint hashes (method, body)
              val formReq =
                if (!cfg.submitForms) None
                else graft.urlkit.Requests.tryFromResponse(body, row.url)
              val allCands: Iterator[(Int, String, String, String)] =
                links.iterator.map { case (i, l) => (i, l.url, "GET", "") } ++
                  formReq.iterator.map(br => (CrawlConfig.FormDLink, br.url,
                    br.method, new String(br.body,
                      java.nio.charset.StandardCharsets.UTF_8)))
              if (cfg.depthLimit == 0 || childDepth <= cfg.depthLimit) {
                for ((candIdx, u, mth, b) <- allCands) {
                  val childHost = UrlKit.hostOf(u)
                  if (cfg.offsiteFiltered(childHost, dontFilter = false,
                      allowOffsite = false)) offsiteDrop(childHost)
                  else if (candIdx != CrawlConfig.FormDLink ||
                      u.length <= cfg.urlLengthLimit) // urllength mw: silent
                    candidates += FrontierRow(u,
                      UrlKit.fingerprint(u, mth, b.getBytes(
                        java.nio.charset.StandardCharsets.UTF_8)),
                      childHost, -childDepth * cfg.depthPriority,
                      childDepth, isStart = false, dEpoch = epoch, dParent = seq,
                      dLink = candIdx, 0, 0, dontFilter = false,
                      referer = policy.referrer(row.url, u).orNull,
                      method = mth, reqBody = b)
                }
              } else inc("depth/filtered",
                (links.size + formReq.size).toLong)
              }
              } // end spider-input (non-metarefresh) expansion
            } else if (status != 599 &&
                !cfg.httperrorAllowed(status, row.handleHttpstatus)) {
              // response reached the spider with a disallowed status —
              // dropped by HttpErrorMiddleware (7d); mirrors CrawlEngine
              httperrorIgnore(status)
            } else if (status != 599 && cfg.depthStatsVerbose &&
                row.depth == 0) {
              // ALLOWED spider-input without a body: _init_depth fires (7e)
              inc("request_depth_count/0")
            }
          }
        }
      }

      // depth stats over link/rule candidates (contract 7e) — counted
      // pre-dupefilter like the reference's get_processed_request
      for (c <- candidates if c.dLink >= 0) {
        if (cfg.depthStatsVerbose) inc(s"request_depth_count/${c.depth}")
        counters("request_depth_max") =
          math.max(counters("request_depth_max"), c.depth.toLong)
      }

      // dupefilter in discovery order (contract step 8)
      for (c <- candidates.sortWith(discLt)) {
        if (c.dontFilter) {
          inc("scheduler/enqueued")
          remaining += c
        } else {
          val hex = UrlKit.toHex(c.fp)
          if (urlSeen.contains(hex)) inc("dupefilter/filtered")
          else {
            urlSeen += hex
            inc("scheduler/enqueued")
            remaining += c
          }
        }
      }

      // apply Set-Cookie in seq order (last writer wins per jar key); an
      // expired entry stays stored — it shadows the live one and is never
      // sent (the deletion, mirroring the engine's chain tombstone)
      for ((_, jar, c) <- epochSetCookies.sortBy(_._1))
        cookieJar((jar, c.domain, c.path, c.name)) = c

      // replay AutoThrottle adjustments per slot in global seq order (step
      // 1a) — the updated delay takes effect next epoch, like cookies
      if (cfg.autothrottle) {
        for ((slot, evs) <- delayEvents.groupBy(_._2).toSeq.sortBy(_._1)) {
          var d = dlyOf(slot)
          for ((_, _, latency, status) <- evs.sortBy(_._1))
            d = graft.operators.AutoThrottle.clampedUpdate(d, latency, status,
              cfg.autothrottleTargetConcurrency, cfg.delayMs,
              cfg.autothrottleMaxDelayMs)
          slotDelayState(slot) = d
        }
      }

      // BSP visibility: stores land (and replace, latest-wins) at epoch end
      for ((h, e) <- epochStores) httpCache(h) = e
      frontier = remaining.result()
      epoch += 1
      if ((cfg.closespiderPageCount > 0 &&
            pageFetches >= cfg.closespiderPageCount) ||
          (cfg.closespiderTimeoutS > 0 &&
            virtualTMax >= cfg.closespiderTimeoutS * 1000L))
        stop = true
    }

    // finish_reason (contract step 9, CoreStats analogue) — threshold
    // reasons take precedence over "finished", in the documented order;
    // the oracle scrapes no media so itemcount never fires here (the
    // conformance pair runs media-off, keeping both sides at 0)
    val finishReason =
      if (cfg.closespiderPageCount > 0 &&
          pageFetches >= cfg.closespiderPageCount) "closespider_pagecount"
      else if (cfg.closespiderTimeoutS > 0 &&
          virtualTMax >= cfg.closespiderTimeoutS * 1000L) "closespider_timeout"
      else if (frontier.isEmpty) "finished"
      else "graft_max_epochs"

    // zero-valued counters dropped (conformance compares non-zero keys)
    Result(fetchLog.result(), urlSeen.toSet, counters.toMap.filter(_._2 != 0L),
      epoch, httpCache.toMap, finishReason)
  }
}
