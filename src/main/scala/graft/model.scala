package graft

/** Shared data model of the crawl engine. Spark stages are `Dataset`s of these
  * case classes; the oracle (reference-semantics single-thread scheduler) uses
  * the same types so conformance is a pure data comparison.
  *
  * Reference shapes: `Request` (`scrapy/http/request/__init__.py:89-210`),
  * scheduler queue entries (`scrapy/core/scheduler.py`, `scrapy/pqueues.py`).
  */

/** A pending request in the frontier.
  *
  * Discovery order (dEpoch, dParent, dLink) is the deterministic replacement
  * for the reference's in-process arrival order (LIFO/FIFO tie-break,
  * SURVEY.md §2.5): it is a pure function of the crawl, never of Spark
  * partitioning. Seeds carry (-1, seedSeq, 0).
  *   - dEpoch: epoch in which the request was discovered (-1 for seeds)
  *   - dParent: global fetch index of the parent page (seedSeq for seeds)
  *   - dLink: index of the link in the parent page (-2 retry, -1 redirect,
  *     0.. links) — retries/redirects of a page sort before its links.
  */
final case class FrontierRow(
    url: String, // Request-sanitized (safeUrlString), like scrapy Request.url
    fp: Array[Byte], // request fingerprint (20 bytes)
    host: String,
    priority: Int, // higher = sooner (scrapy semantics)
    depth: Int,
    isStart: Boolean,
    dEpoch: Int,
    dParent: Long,
    dLink: Int,
    retryTimes: Int,
    redirectTimes: Int,
    dontFilter: Boolean,
    // Referer header value the request carries (W3C Referrer-Policy applied
    // at discovery, `scrapy/spidermiddlewares/referer.py`); null = omitted
    referer: String = null,
    // meta["dont_obey_robotstxt"] (`downloadermiddlewares/robotstxt.py:57-59`):
    // skips the robots check AND never triggers the robots.txt fetch.
    // Retries/redirects inherit it (request.replace copies meta); extracted
    // links do not (a fresh Request carries no meta).
    dontObeyRobots: Boolean = false,
    // CrawlSpider rule that emitted this request (meta["rule"],
    // `spiders/crawl.py:125-131`); -1 = seed / non-rule request. Under
    // cfg.crawlRules it decides whether the response is expanded further
    // (Rule.follow). Retries/redirects inherit it (meta copy).
    ruleIdx: Int = -1,
    // meta["cookiejar"] (`downloadermiddlewares/cookies.py:52-66`): selects
    // which cookie jar the request reads its Cookie header from and which
    // jar its response's Set-Cookie writes land in. "" = the default jar
    // (meta absent). NOT sticky (reference docs: the key must be passed
    // along explicitly) — retries/redirects inherit it via the meta copy,
    // extracted links never do.
    cookieJar: String = "",
    // meta["dont_merge_cookies"] (`cookies.py:79-81,96-98`): the request
    // bypasses the jar entirely — no Cookie header is attached AND the
    // response's Set-Cookie headers are not stored. Inherited by
    // retries/redirects (meta copy), never by links.
    dontMergeCookies: Boolean = false,
    // meta["dont_redirect"] (`redirect.py:54-57`, shared with metarefresh):
    // 3xx/meta-refresh responses pass through to the spider instead of
    // being rewritten. Inherited by retries, never by links.
    dontRedirect: Boolean = false,
    // meta["dont_retry"] (`retry.py:52-55` + process_exception): retryable
    // statuses and download exceptions pass through instead of being
    // re-enqueued (an exception then just fails — no retry counters).
    dontRetry: Boolean = false,
    // meta["max_retry_times"] (`retry.py:68`): per-request RETRY_TIMES
    // override; -1 = unset (cfg.retryTimes applies).
    maxRetryTimes: Int = -1,
    // meta["handle_httpstatus_list"] / meta["handle_httpstatus_all"]
    // (`spidermiddlewares/httperror.py:43-52`): "" = unset (the
    // spider/settings list applies), "all" = handle everything, else
    // comma-joined status codes. The meta list REPLACES the settings list
    // (reference semantics: meta wins outright, no union).
    handleHttpstatus: String = "",
    // meta["dont_cache"] (`httpcache.py:64-65,99-100`): the request skips
    // the HTTP cache entirely — no lookup, no store, and NO httpcache
    // counters fire for it. Inherited by retries/redirects (meta copy),
    // never by links.
    dontCache: Boolean = false,
    // meta["download_slot"] (`core/downloader/__init__.py` get_slot_key +
    // the write-back in _enqueue_request, contract step 7f): "" = unset
    // (slot = host, or IP under perIpSlots); non-empty = the politeness
    // slot this request is charged to, OVERRIDING host/IP keying. The
    // downloader writes the computed key back into meta, so requests
    // derived from a DOWNLOADED response (redirects incl. meta-refresh,
    // retries — request.replace keeps meta) inherit the slot their source
    // was fetched under — a cross-host redirect stays charged to the
    // ORIGINAL slot. Cache-hit responses never enter the downloader, so
    // no write-back happens for them. Extracted links never inherit.
    downloadSlot: String = "",
    // meta["download_maxsize"] (contract step 6g): -1 = unset (the
    // DOWNLOAD_MAXSIZE setting applies); >= 0 overrides it for this request
    // — 0 disables the limit (the reference's `if maxsize and ...` check is
    // falsy at 0). Applies to the RAW response body at the download handler
    // AND to the decompressed size in the httpcompression middleware
    // (`httpcompression.py:119`). Inherited by retries/redirects (meta
    // copy), never by links.
    downloadMaxSize: Long = -1L,
    // HTTP method (contract step 7g): "GET" everywhere except FormRequest
    // submissions (`http/request/form.py:39-61`). Enters the request
    // fingerprint (`utils/request.py:87-94`), so POST and GET of one URL are
    // distinct dupefilter entries. Redirects convert 302/303 to GET with an
    // empty body (`redirect.py:177-181` + `_redirect_request_using_get`);
    // 301/307/308 and retries keep method+body (request.replace).
    method: String = "GET",
    // request body as UTF-8 text (urlencoded form data is always ASCII —
    // this engine never builds binary request bodies). "" = empty body.
    // Hashed into the fingerprint; counted by DownloaderStats (6h).
    reqBody: String = "",
    // meta["allow_offsite"] (`downloadermiddlewares/offsite.py:50-55`,
    // contract step 7h): bypasses the schedule-time offsite check without
    // the dupefilter bypass dont_filter also carries. Inherited by
    // retries/redirects (meta copy), never by links; settable on seeds and
    // by a CrawlSpider rule's process_request hook (RuleRequest).
    allowOffsite: Boolean = false)

/** One fetch in the ordered crawl log — the byte-for-byte conformance object
  * (SURVEY.md §7.4, FIXTURES.md §6). `seq` is the global fetch index. */
final case class FetchLogRow(
    epoch: Int,
    seq: Long,
    host: String,
    url: String,
    fp: Array[Byte],
    virtualTMs: Long,
    status: Int, // 599 on a non-robots row = download timeout (contract 6c)
    isRobots: Boolean,
    referer: String = null, // Referer header sent with the fetch
    cookies: String = null, // Cookie header sent with the fetch
    userAgent: String = null, // User-Agent header (UserAgentMiddleware analogue)
    authorization: String = null, // Basic auth header (HttpAuthMiddleware)
    proxy: String = null, // proxy the fetch is routed through (HttpProxyMiddleware)
    // response served from the HTTP cache (reference response.flags
    // "cached", contract step 6d) — no politeness slot was consumed
    cached: Boolean = false,
    // HTTP method of the fetch (contract step 7g); robots fetches are
    // always fresh GET Requests (`robotstxt.py:82-99`)
    method: String = "GET",
    // Proxy-Authorization header sent with the fetch (contract 6a:
    // credential-carrying proxy URLs split into stripped proxy + this
    // header, `httpproxy.py:94-95`); null = absent
    proxyAuth: String = null)

/** A page of the synthetic web (the offline stand-in for HTTP fetch;
  * SURVEY.md §2.1 "Synthetic fetch"). `url` is the canonical URL — the fetch
  * service resolves a request by canonicalizing its (sanitized) URL, the
  * same way a real server treats query-order/fragment variants as one
  * resource. `body` is HTML; links are extracted from it. */
final case class PageRow(
    url: String, // canonical URL (lookup key)
    status: Int,
    location: String, // redirect target (raw href) or null
    body: Array[Byte], // HTML (possibly compressed per contentEncoding)
    imageId: String, // FK -> images, null for non-image pages
    latencyMs: Int,
    contentEncoding: String = null, // Content-Encoding header; null = identity
    refererPolicy: String = null, // Referrer-Policy response header; null = absent
    setCookie: String = null, // Set-Cookie response header; null = absent
    cacheControl: String = null) // Cache-Control response header (contract 6f)

/** Image+caption corpus row — exact input_hint shape (BASELINE.json). */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** robots.txt corpus row. */
final case class RobotsRow(host: String, body: Array[Byte])

/** Ordered seed row. `dontObeyRobots` = the request meta bypass flag
  * (`robotstxt.py:57-59`), settable per start request like in the
  * reference's spiders. */
final case class SeedRow(seq: Long, url: String, priority: Int,
    dontObeyRobots: Boolean = false,
    // meta["cookiejar"] / meta["dont_merge_cookies"] on the start request
    // (`cookies.py:52-66,79-81`) — see [[FrontierRow]]
    cookieJar: String = "", dontMergeCookies: Boolean = false,
    // redirect/retry/httperror/cache meta controls on the start request —
    // see [[FrontierRow]]
    dontRedirect: Boolean = false, dontRetry: Boolean = false,
    maxRetryTimes: Int = -1, handleHttpstatus: String = "",
    dontCache: Boolean = false,
    // meta["download_slot"] on the start request — see [[FrontierRow]]
    downloadSlot: String = "",
    // meta["download_maxsize"] on the start request — see [[FrontierRow]]
    downloadMaxSize: Long = -1L,
    // meta["allow_offsite"] on the start request (contract 7h) — start
    // requests and everything request.replace derives from them already
    // bypass via dont_filter, so this is inert on seeds today; carried for
    // meta-surface completeness — see [[FrontierRow]]
    allowOffsite: Boolean = false)

/** Per-slot politeness state carried across epochs (reference: downloader
  * Slot.lastseen + Slot.delay, `scrapy/core/downloader/__init__.py:148-177`).
  * `delayMs` is the slot's adaptive AutoThrottle delay (-1 = unset: the
  * engine resolves the slot's base/start delay; always -1 when AutoThrottle
  * is off). */
final case class HostState(host: String, lastTMs: Long, robotsFetched: Boolean,
    delayMs: Long = -1L)

/** One stored cookie (reference CookiesMiddleware jar state, see
  * [[graft.operators.Cookies]]). The `host` column holds the cookie's
  * normalized DOMAIN (the persisted column name predates the tier-2
  * semantics and is kept for chain compatibility); jar key =
  * (jar, host, path, name) where `jar` is the meta["cookiejar"] id that
  * owns the entry ("" = default jar, `cookies.py:52-66`). `expiresMs` is
  * on the virtual clock, -1 = session cookie; an expired entry is a
  * delete tombstone (latest-wins). */
final case class CookieRow(host: String, name: String, value: String,
    path: String = "/", hostOnly: Boolean = true, expiresMs: Long = -1L,
    secure: Boolean = false, jar: String = "")

/** Media output row (reference: ImagesPipeline results,
  * `scrapy/pipelines/images.py:110-210` + files checksum `files.py:61-75`). */
final case class MediaRow(
    image_id: String,
    url: String,
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long,
    checksumMd5: String)

/** media_seen state row (FILES_EXPIRES uptodate reuse, reference
  * `scrapy/pipelines/files.py:539-567`: stat_file → age-gated skip): one
  * row per stored media, latest-wins delta chain like the other state
  * tables. `storedTMs` is the storing fetch's VIRTUAL time; the stored
  * metadata is replayed on an uptodate hit so no byte I/O or decode runs. */
final case class MediaSeenRow(image_id: String, storedTMs: Long, w: Int,
    h: Int, fmt: String, caption: String, phash: Long, checksumMd5: String)

/** url_seen row: fingerprint + hash bucket for partitioned storage. */
final case class SeenRow(fp: Array[Byte], bucket: Int)

object Model {
  /** Number of url_seen / frontier hash buckets. At 10^10 scale this would be
    * thousands; sized modestly for local[32]. */
  val NumBuckets = 64

  def bucketOf(fp: Array[Byte]): Int = {
    val h = graft.urlkit.UrlKit.fpHash64(fp)
    (((h % NumBuckets) + NumBuckets) % NumBuckets).toInt
  }

  /** [[bucketOf]] from a hex-encoded fingerprint (either case) — the
    * http-cache chain stores lowercase fpHex, not bytes. */
  def bucketOfHex(fpHex: String): Int = {
    val bytes = new Array[Byte](fpHex.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = ((Character.digit(fpHex.charAt(2 * i), 16) << 4) |
        Character.digit(fpHex.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    bucketOf(bytes)
  }
}
