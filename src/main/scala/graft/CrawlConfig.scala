package graft

/** The politeness budget + crawl knobs — part of the deterministic-replay
  * contract (both the oracle and the Spark engine take the same config).
  * Defaults mirror `scrapy/settings/default_settings.py:219-245,454-484`
  * except where determinism requires pinning (randomizeDelay=false, cf.
  * `extras/qpsclient.py:6`).
  *
  * == Epoch-BSP crawl contract (the spec both sides implement) ==
  *
  * Virtual time, never wall clock. Epoch k spans [k*epochMs, (k+1)*epochMs).
  *
  *  1. Politeness SLOT = the request's host, or its resolved IP when
  *     `perIpSlots` is on (reference `CONCURRENT_REQUESTS_PER_IP` slot
  *     keying + DNS cache, `scrapy/core/downloader/__init__.py:137-177`,
  *     `scrapy/resolver.py:21-104`): hosts sharing an IP share one budget,
  *     delay and virtual-time sequence. Hosts missing from the DNS table
  *     fall back to host keying (`dnscache.get(host, host)`).
  *     Per-slot fetch budget per epoch:
  *     `budget = max(1, epochMs / max(delayMs,1))` capped at
  *     `maxPerHostPerEpoch`.
  *  1b. Global epoch cap (`maxFetchesPerEpoch` > 0 — the BSP form of the
  *     reference's min-active DownloaderAware pop, `scrapy/pqueues.py:
  *     241-335`, + CONCURRENT_REQUESTS): per-slot budgets become the
  *     max-min fair allocation of `cap` units — with
  *     demand_s = min(frontierRows_s, budget), F = the largest integer
  *     with Σ_s min(demand_s, F) ≤ cap; slots with demand > F then receive
  *     one extra unit each in ascending slot order until the remainder is
  *     exhausted. Budget units pay for robots fetches too (step 2).
  *  2. Dequeue order per slot (reference `scrapy/pqueues.py:143-198` +
  *     start-queue separation `:146-186`, LIFO default
  *     `default_settings.py:480-484`): sort by
  *       (priority DESC,
  *        isStart ASC,            -- non-start served before start at eq prio
  *        discovery LIFO: (dEpoch,dParent,dLink) DESC for non-start;
  *        start requests always FIFO: discovery ASC)
  *     then walk in order charging the slot budget: a row whose host still
  *     needs robots.txt first spends one budget unit on the robots fetch
  *     (once per host per epoch; reference fetches robots at priority 1000
  *     before any page of that host, `robotstxt.py:82-136` — the robots
  *     fetch happens even when no page unit remains after it), then one
  *     unit on the row itself; the first row that cannot be charged stops
  *     the walk and everything after it stays in the frontier.
  *     (With slot == host this walk is exactly the old "take the first
  *     `budget - (robots ? 1 : 0)` rows" rule.)
  *  3. Robots-disallowed dequeued rows are dropped (counter
  *     `robotstxt/forbidden`; their fp stays in url_seen — the reference
  *     inserts into url_seen at schedule time, before robots runs,
  *     SURVEY.md §2.7). They do not consume a politeness slot.
  *  4. Virtual fetch times per SLOT: t_0 = max(lastT_s + delayMs, epochStart),
  *     t_{i+1} = t_i + delayMs; lastT_s := t_last. A pending robots fetch
  *     takes its host's first position in the slot's sequence.
  *  5. Global fetch-log order within the epoch: (virtualT ASC, host ASC,
  *     per-host index ASC); `seq` continues across epochs.
  *  6. Fetch = corpus lookup by sanitized URL (unknown → 404). Status counts
  *     recorded as `downloader/response_status_count/<n>`.
  *  6b. Response decompression (`downloadermiddlewares/httpcompression.py:
  *     112-165`): a response carrying a Content-Encoding header is decoded
  *     rightmost-coding-first (gzip/x-gzip/deflate; unknown codings stop the
  *     chain and leave the body opaque — no link extraction). Counters:
  *     `httpcompression/response_count` and `.../response_bytes` (decoded
  *     size) whenever the header is present and decode doesn't overflow;
  *     exceeding downloadMaxSize during decompression drops the response
  *     (the reference's IgnoreRequest) and counts
  *     `httpcompression/max_size_exceeded`; a corrupt body that yields no
  *     output drops the response and counts `httpcompression/decode_error`
  *     (the last two counter names are this engine's — the reference only
  *     logs these events).
  *  7. Rewrites (candidates for epoch k+1):
  *     - 301/302/303/307/308 + location (`scrapy/downloadermiddlewares/
  *       redirect.py:27-181`): urljoin target, priority+2, redirectTimes+1
  *       (drop past 20), dLink=-1, inherits dontFilter.
  *     - retryable status in {500,502,503,504,522,524,408,429}
  *       (`retry.py:38-179`): same url, priority-1, retryTimes+1 up to
  *       retryTimes, dontFilter=true, dLink=-2.
  *     - 2xx: links extracted in order; per-doc first-wins dedup on
  *       canonicalize_url(href, keepFragments=true)
  *       (`lxmlhtml.py:56-58,282-283`); filters: scheme in {http,https,ftp,
  *       file}, not nofollow, extension not in IGNORED_EXTENSIONS, length <=
  *       urlLengthLimit, depth+1 <= depthLimit (0=off); child priority =
  *       parentPriority - depthPriority*... reference: new Request priority 0
  *       then DepthMiddleware does `priority -= depth*depthPriority`
  *       (`depth.py:81-101`) → child priority = -childDepth*depthPriority.
  *  7a. Meta refresh (`downloadermiddlewares/redirect.py:184-212`): a 2xx
  *     HTML body whose first `<meta http-equiv=refresh>` (comments and
  *     noscript blocks ignored) carries `content="<d>; url=<u>"` with
  *     d < metarefreshMaxDelay and an http/https target becomes a redirect
  *     (urljoin target, priority+2, redirectTimes+1 under the shared cap,
  *     dLink=-1, Referer re-patched) INSTEAD of link extraction; otherwise
  *     the page is treated as content.
  *  7b. Referer header (`spidermiddlewares/referer.py:333-399`): every
  *     candidate carries the Referer the W3C policy assigns —
  *     link children: policy = parent response's Referrer-Policy header if
  *     valid (rightmost known token), else cfg.refererPolicy; referer =
  *     policy(responseUrl=parent url, requestUrl=link url). Redirect
  *     candidates inherit the parent request's Referer then re-apply the
  *     DEFAULT policy with the old Referer as surrogate parent URL (the
  *     request_scheduled patch hook, `referer.py:381-399`); retries keep
  *     theirs unchanged; seeds and robots fetches carry none. The fetch log
  *     records the header per fetch — part of the byte-for-byte compare.
  *  8. Dupefilter (`scrapy/dupefilters.py:94-105` via scheduler `:343-345`):
  *     candidates processed in discovery order; dontFilter rows bypass (no
  *     seen-check, no insert); otherwise first-wins on fp against
  *     url_seen ∪ earlier-in-batch; inserted on miss; drops counted as
  *     `dupefilter/filtered`; enqueues as `scheduler/enqueued`.
  *  9. Stop when frontier is empty, or maxEpochs reached, or total page
  *     fetches ≥ closespiderPageCount (`extensions/closespider.py`).
  *
  * Deviation from the reference (documented, SURVEY.md §7.3): the reference
  * interleaves newly discovered links into the live queues mid-download;
  * the epoch-BSP model makes discoveries eligible at the next epoch. The
  * oracle replays these same BSP semantics, so conformance is exact.
  */
final case class CrawlConfig(
    delayMs: Long = 100, // DOWNLOAD_DELAY (virtual ms)
    epochMs: Long = 1000, // virtual epoch duration
    maxPerHostPerEpoch: Int = 16, // cap on budget (CONCURRENT_* analogue)
    depthLimit: Int = 0, // DEPTH_LIMIT, 0 = off
    depthPriority: Int = 0, // DEPTH_PRIORITY (1 → BFO)
    queueOrder: String = "lifo", // "lifo" (DFO, default) | "fifo" (BFO)
    robotsObey: Boolean = true, // north-rule runs enable it
    robotsUserAgent: String = "graftbot",
    retryTimes: Int = 2, // RETRY_TIMES
    maxRedirectTimes: Int = 20, // REDIRECT_MAX_TIMES
    urlLengthLimit: Int = 2083, // URLLENGTH_LIMIT
    allowedDomains: Seq[String] = Nil, // offsite filter; empty = allow all
    imagesMinWidth: Int = 0, // IMAGES_MIN_WIDTH (media min-size filter)
    imagesMinHeight: Int = 0, // IMAGES_MIN_HEIGHT
    downloadMaxSize: Long = 1073741824L, // DOWNLOAD_MAXSIZE (decompression guard)
    refererPolicy: String = "scrapy-default", // REFERRER_POLICY default policy
    metarefreshMaxDelay: Double = 100.0, // METAREFRESH_MAXDELAY (seconds)
    perIpSlots: Boolean = false, // CONCURRENT_REQUESTS_PER_IP analogue (step 1)
    maxFetchesPerEpoch: Long = 0, // global epoch cap, 0 = off (step 1b)
    maxEpochs: Int = 1000,
    closespiderPageCount: Long = 0, // 0 = off
    /** Engine sizing knob, NOT part of the semantics contract (the oracle
      * ignores it): when the frontier may exceed this many rows, global fetch
      * seq assignment switches from driver-side key collect to a distributed
      * orderBy + zipWithIndex. 0 forces the distributed path (used by the
      * conformance variant that pins both paths byte-identical). */
    seqCollectMax: Long = 2000000L
) {
  /** Offsite predicate (`scrapy/downloadermiddlewares/offsite.py:47-99`):
    * host must equal an allowed domain or be a subdomain of one. Applied to
    * extracted link candidates before the dupefilter (legacy spider-mw
    * placement — offsite links never enter url_seen). */
  def hostAllowed(host: String): Boolean =
    allowedDomains.isEmpty ||
      allowedDomains.exists(d => host == d || host.endsWith("." + d))
  require(queueOrder == "lifo" || queueOrder == "fifo", s"bad queueOrder $queueOrder")
  def hostBudget: Int =
    math.min(math.max(1L, epochMs / math.max(delayMs, 1L)), maxPerHostPerEpoch.toLong).toInt
}

object CrawlConfig {
  /** Retryable HTTP codes, `default_settings.py:456-463`. */
  val RetryStatuses: Set[Int] = Set(500, 502, 503, 504, 522, 524, 408, 429)
  /** Redirect codes handled by RedirectMiddleware. */
  val RedirectStatuses: Set[Int] = Set(301, 302, 303, 307, 308)
  /** Schemes requests may use (reference `scrapy/linkextractors/lxmlhtml.py:123`
    * checks the url is valid; the download handlers cover these schemes). */
  val ValidSchemes: Set[String] = Set("http", "https", "ftp", "file")
  /** `scrapy/linkextractors/__init__.py:18-80` IGNORED_EXTENSIONS. */
  val IgnoredExtensions: Set[String] = Set(
    "7z", "7zip", "bz2", "rar", "tar", "tar.gz", "xz", "zip",
    "mng", "pct", "bmp", "gif", "jpg", "jpeg", "png", "pst", "psp", "tif",
    "tiff", "ai", "drw", "dxf", "eps", "ps", "svg", "cdr", "ico", "webp",
    "mp3", "wma", "ogg", "wav", "ra", "aac", "mid", "au", "aiff",
    "3gp", "asf", "asx", "avi", "mov", "mp4", "mpg", "qt", "rm", "swf",
    "wmv", "m4a", "m4v", "flv", "webm",
    "xls", "xlsm", "xlsx", "xltm", "xltx", "potm", "potx", "ppt", "pptm",
    "pptx", "pps", "doc", "docb", "docm", "docx", "dotm", "dotx",
    "odt", "ods", "odg", "odp",
    "css", "pdf", "exe", "bin", "rss", "dmg", "iso", "apk", "jar", "sh",
    "rb", "js", "hta", "bat", "cpl", "msi", "msp", "py")
}
