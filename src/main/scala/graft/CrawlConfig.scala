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
  *  0. Start requests (the ordered seed list) carry dont_filter=True
  *     (`Spider.start()` yields `Request(url, dont_filter=True)`,
  *     `spiders/__init__.py:102-109`), and the scheduler never consults the
  *     dupefilter for dont_filter requests (`core/scheduler.py:343`):
  *     duplicate seed URLs each enqueue AND fetch, and seed fingerprints
  *     are NOT recorded in url_seen — a later organic link to a seeded URL
  *     is a dupefilter MISS and fetches again (recording the fp then).
  *     Retries and redirects inherit dont_filter via request copy, so a
  *     redirected seed also bypasses the dupefilter.
  *  1. Politeness SLOT = the request's host, or its resolved IP when
  *     `perIpSlots` is on (reference `CONCURRENT_REQUESTS_PER_IP` slot
  *     keying + DNS cache, `scrapy/core/downloader/__init__.py:137-177`,
  *     `scrapy/resolver.py:21-104`): hosts sharing an IP share one budget,
  *     delay and virtual-time sequence. Hosts missing from the DNS table
  *     fall back to host keying (`dnscache.get(host, host)`).
  *     Per-slot fetch budget per epoch:
  *     `budget = max(1, (epochMs / max(delayMs,1)) * concurrency)` capped
  *     at `maxPerHostPerEpoch` — the slot serves `concurrency` transfers
  *     per delay tick (step 4).
  *  1a. Per-slot delay and cap (DOWNLOAD_SLOTS + AutoThrottle,
  *     `scrapy/core/downloader/__init__.py:131-166`,
  *     `scrapy/extensions/throttle.py:62-140`): each slot's delay for the
  *     epoch is resolved AT EPOCH START and stays fixed through the epoch
  *     (BSP visibility, like cookies):
  *       delay_s = slotOverrides(s).delayMs            if set and no stored
  *                                                     adaptive delay yet
  *               | storedDelay_s                       if autothrottle and the
  *                                                     slot has state
  *               | max(delayMs, autothrottleStartDelayMs)  if autothrottle
  *                                                     (reference _start_delay)
  *               | delayMs                             otherwise
  *     cap_s = slotOverrides(s).maxPerEpoch | maxPerHostPerEpoch, and the
  *     slot's politeness budget becomes
  *     `budget_s = min(max(1, epochMs / max(delay_s, 1)), cap_s)`.
  *     When autothrottle is on, the slot's stored delay is updated at EPOCH
  *     END by replaying the epoch's page responses (only fetches that found
  *     a corpus page and did not time out carry a latency) in global seq
  *     order through the reference's `_adjust_delay`
  *     (`throttle.py:104-140`): target = latency/targetConcurrency;
  *     next = max(target, (old+target)/2) clamped to
  *     [delayMs, autothrottleMaxDelayMs]; a non-200 response never lowers
  *     the delay. The updated delay takes effect next epoch.
  *  1b. Global epoch cap (`maxFetchesPerEpoch` > 0 — the BSP form of the
  *     reference's min-active DownloaderAware pop, `scrapy/pqueues.py:
  *     241-335`, + CONCURRENT_REQUESTS): per-slot budgets become the
  *     max-min fair allocation of `cap` units — with
  *     demand_s = min(frontierRows_s, budget_s), F = the largest integer
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
  *     The robots URL is `<scheme>://host/robots.txt` with the TRIGGERING
  *     request's scheme (`robotstxt.py:82-99` builds it from url.scheme;
  *     the cache stays keyed per netloc/host). A row carrying the
  *     `dontObeyRobots` meta (`robotstxt.py:57-59`) neither triggers the
  *     robots fetch nor undergoes the allowed() check (step 3); retries and
  *     redirects inherit the flag (request.replace copies meta), extracted
  *     links never carry it.
  *     (With slot == host this walk is exactly the old "take the first
  *     `budget - (robots ? 1 : 0)` rows" rule.)
  *  3. Robots-disallowed dequeued rows are dropped (counter
  *     `robotstxt/forbidden`; their fp stays in url_seen — the reference
  *     inserts into url_seen at schedule time, before robots runs,
  *     SURVEY.md §2.7). They do not consume a politeness slot.
  *  4. Virtual fetch times per SLOT: charged (non-cached) departure i of
  *     the epoch leaves at
  *       t_i = max(lastT_s + delay_s, epochStart) + floor(i / concurrency) * delay_s
  *     — `concurrency` transfers per delay tick, the BSP analogue of the
  *     reference's per-slot transfer slots (CONCURRENT_REQUESTS_PER_DOMAIN,
  *     `scrapy/core/downloader/__init__.py:57-58,214-221`: with delay == 0
  *     up to `concurrency` requests transfer in parallel; with delay > 0
  *     the reference's `_process_queue` dispatches one per tick — the
  *     default `concurrency = 1` reproduces that exactly, and the batched
  *     schedule is the deterministic generalization for delay > 0 + conc >
  *     1 configurations). lastT_s := t of the slot's last charged
  *     departure; delay_s from step 1a. A pending robots fetch takes its
  *     host's first position in the slot's sequence.
  *  4a. Randomized ticks (`randomizeDelay` / per-slot `randomize` override —
  *     RANDOMIZE_DOWNLOAD_DELAY, which the reference DEFAULTS to True:
  *     `Slot.download_delay` returns `random.uniform(0.5·delay, 1.5·delay)`
  *     per wait, `scrapy/core/downloader/__init__.py`): step 4's uniform
  *     tick grid generalizes to
  *       t_i = max(lastT_s + L(s,e,0), epochStart) + Σ_{k=1..floor(i/conc)} L(s,e,k)
  *     where L(s,e,k) = `tickLen(slot, epoch, k, delay_s)` — a deterministic
  *     integral uniform over [delay_s/2, 3·delay_s/2] hashed from
  *     (slot, epoch, tick), the jitter analogue with no RNG state: the same
  *     timeline on every executor, across resumes, and in the oracle. The
  *     step-1a budget formula keeps the NOMINAL delay_s (tick lengths
  *     average to delay_s). randomize off ⇒ L ≡ delay_s ⇒ exactly step 4.
  *  5. Global fetch-log order within the epoch: (virtualT ASC, host ASC,
  *     slot ASC, per-host-in-slot index ASC); `seq` continues across
  *     epochs. The slot tiebreak is inert except under download_slot meta
  *     (7f) — the only case where one host's fetches can span two slots in
  *     an epoch and (t, host, idx) alone would collide.
  *  6. Fetch = corpus lookup by sanitized URL (unknown → 404). Status counts
  *     recorded as `downloader/response_status_count/<n>`.
  *  6a. Request headers recorded per fetch (part of the byte compare):
  *     User-Agent = cfg.userAgent on every fetch (`downloadermiddlewares/
  *     useragent.py:1-39` + `defaultheaders.py`); Authorization = Basic
  *     base64(user:pass) when httpUser/httpPass are set and the host is
  *     httpAuthDomain or a subdomain (null domain = every host, the
  *     reference's legacy mode; `httpauth.py:36-53`); proxy = the
  *     cfg.proxies entry for the request's scheme unless the host matches a
  *     noProxy suffix (`httpproxy.py:45-106` env-proxy semantics) — a
  *     credential-carrying proxy URL is SPLIT like `_get_proxy`: the log's
  *     proxy column holds the stripped scheme://hostport and the
  *     credentials ride a Proxy-Authorization header (latin-1 b64 of the
  *     percent-unquoted user:pass), which enters the fetch-log byte
  *     compare AND the 6h request_bytes. Robots
  *     fetches are ordinary downloads and carry all of these.
  *  6c. Download timeout (`downloadtimeout.py:1-41` + the handlers'
  *     TimeoutError path): a corpus page whose latencyMs ≥ downloadTimeoutMs
  *     (0 = off) produces NO response — fetch-log status 599, counters
  *     `downloader/exception_count` and `downloader/exception_type_count/
  *     twisted.internet.error.TimeoutError` instead of a response_status
  *     count, no Set-Cookie/body/delay-adjust effects — and the request is
  *     retried exactly like a retryable status (priority-1, retryTimes+1,
  *     dontFilter, dLink=-2; `retry.py` EXCEPTIONS_TO_RETRY) until
  *     retryTimes, then `retry/max_reached`.
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
  *     logs these events). The decompression limit honours
  *     meta["download_maxsize"] (`httpcompression.py:119`) — see 6g.
  *  6g. Download max size (`handlers/http11_aiohttp.py:189-211,287-299`,
  *     setting DOWNLOAD_MAXSIZE, per-request meta["download_maxsize"]
  *     override, 0 = unlimited): a fetch whose RAW corpus body exceeds the
  *     effective limit is cancelled by the download handler — NO response,
  *     fetch-log status 599, counters `downloader/exception_count` +
  *     `downloader/exception_type_count/asyncio.exceptions.CancelledError`,
  *     no Set-Cookie/body/cache-store/delay-adjust effects. Unlike a
  *     timeout, the request is NOT retried (CancelledError is not in
  *     RETRY_EXCEPTIONS, `default_settings.py:455-469`) — it drops with no
  *     spider input (no HttpError counters: exceptions have no response).
  *     Ordering: a timeout (6c) is checked first (the deadline elapses
  *     before the body completes); cached rows (6d) never reach the handler
  *     and bypass the check, as do data:/file: rows (6e — those handlers
  *     enforce no size limit in the reference). Robots bodies in the
  *     synthetic corpus are always under any configured limit (corpus
  *     invariant — a real oversize robots.txt would error → allow-all).
  *  6h. DownloaderStats middleware counters (`downloadermiddlewares/
  *     stats.py`, priority 850 — see [[graft.operators.DownloaderStats]]):
  *     every request that reaches the downloader — page fetches, robots
  *     fetches (full middleware chain) and cache HITS (stats wraps the
  *     cache middleware at 900) — counts `downloader/request_count`,
  *     `downloader/request_method_count/GET` and `downloader/request_bytes`
  *     (= `len(request_httprepr(request))`, `utils/request.py:126-140`,
  *     over the per-fetch rendered headers the byte compare pins plus the
  *     constant Accept / Accept-Language / Accept-Encoding defaults); every
  *     response on the way back counts `downloader/response_count` and
  *     `downloader/response_bytes` (RAW body — stats sees the response
  *     before HttpCompression decodes — + the reference's header-size
  *     formula, faithfully -2 for a header-less response, + status-phrase
  *     size + 4). Exceptions (599: timeout 6c, local handler errors 6e,
  *     cancel 6g — and the robots-error 599) count request bytes but no
  *     response bytes; robots-forbidden rows never reach the downloader
  *     (rejected at priority 100) and count nothing.
  *  6d. HTTP cache in the fetch chain (`downloadermiddlewares/httpcache.py:
  *     24-144`, DummyPolicy, enabled by `httpcacheEnabled`): the cache is
  *     keyed by request fingerprint and persists across epochs AND crawls
  *     (prime a second crawl with the first's cache chain). A dequeued row
  *     whose fp is cached is served from the cache: it consumes NO
  *     politeness budget and does not advance the slot's virtual time — it
  *     is logged (flag `cached`) at the slot's next-fetch time as of its
  *     walk position, with the per-host index advancing normally (the
  *     (t, host, idx) key stays total). Robots fetches pass the cache too
  *     (robots middleware runs BEFORE httpcache, so robots is still
  *     consulted/triggered for cached page rows; a cached robots fetch
  *     skips its budget unit). A cached response replays its Set-Cookie
  *     (CookiesMiddleware processes every response) but never times out,
  *     never feeds AutoThrottle, and is not re-stored. Misses download
  *     normally; any response (status ≠ 599 — a 599 is an exception/robots
  *     error with no response object) is stored. When the cache is on, the
  *     walk's stop rule is: cached rows process even with zero budget left;
  *     the first NON-cached row (or robots fetch) that cannot be charged
  *     stops the slot's walk. Counters: `httpcache/hit`, `httpcache/miss`,
  *     `httpcache/firsthand` (every first-hand response), `httpcache/store`
  *     (DummyPolicy stores every first-hand response whose status is not in
  *     `httpcacheIgnoreHttpCodes` — HTTPCACHE_IGNORE_HTTP_CODES,
  *     `extensions/httpcache.py:36-45` should_cache_response).
  *  6f. RFC2616 cache policy in the fetch chain (`httpcachePolicy =
  *     "rfc2616"`; `extensions/httpcache.py:59-245` via
  *     [[graft.operators.Rfc2616Policy]]): cache entries carry
  *     (storedTMs, status, Cache-Control); a dequeued row with an entry is
  *     a HIT only while the entry is FRESH at the row's walk-time virtual
  *     clock — `ageSec = (t - storedTMs)/1000 <` freshness lifetime
  *     (max-age; one-year fallback for 300/301/308; else 0) and the entry's
  *     Cache-Control has no `no-cache`. A stale entry is an ordinary MISS
  *     (the revalidation download — our corpus responses carry no
  *     validators, so it is unconditional); its response replaces the entry
  *     (latest-wins merge on the cache chain). Stores obey
  *     should_cache_response over the response's Cache-Control: `no-store`
  *     never stores; `max-age` and 300/301/308 store; a 200 with neither
  *     max-age nor validators does NOT store (so robots fetches and plain
  *     corpus pages stay uncached). Counters stay hit/miss/firsthand/store
  *     (a stale revalidation counts as a miss, like the reference's stats).
  *     The Date/Expires/ETag/Age/serve-stale-on-5xx paths are exercised by
  *     the FetchCache library battery; the in-chain contract pins the
  *     Cache-Control subset a deterministic corpus can replay (a corpus
  *     URL's status never changes, so is_cached_response_valid's
  *     serve-stale-on-5xx branch is unreachable by construction).
  *     `virtualClockStartMs` offsets the whole crawl's virtual clock —
  *     epoch k spans [start + k·epochMs, …) — so a cache-primed second
  *     crawl can sit later on the shared timeline than the crawl that
  *     stored the entries (the analogue of wall-clock time passing between
  *     runs; with the default DummyPolicy it is just a time shift).
  *  6e. Non-HTTP schemes (`localSchemes`; reference DOWNLOAD_HANDLERS +
  *     `handlers/{datauri,file}.py` — see [[graft.operators.LocalFetch]]):
  *     `data:`/`file:` rows skip robots.txt entirely (no check, no robots
  *     fetch — `robotstxt.py:59-61`) but consume politeness budget and
  *     virtual time on their slot (the "" slot: hostname-or-empty keying)
  *     like any download. `data:` bodies parse out of the URI (invalid →
  *     599 exception, counter `downloader/exception_type_count/builtins.
  *     ValueError`, NOT retried); `file:` bodies read from the filesystem
  *     (a failed read is a 599 exception carrying the OSError subclass
  *     CPython open() would raise — `.../builtins.FileNotFoundError`,
  *     `.../builtins.PermissionError`, `.../builtins.IsADirectoryError`,
  *     else `.../builtins.OSError` — retried like a timeout: IOError is in
  *     EXCEPTIONS_TO_RETRY). Links are
  *     extracted only from HTML responses (media type / filename dispatch,
  *     `responsetypes.py`); local responses carry no latency (no timeout,
  *     no AutoThrottle events), no headers and no Set-Cookie. Under 6d the
  *     cache stores `data:` but never `file:` responses
  *     (HTTPCACHE_IGNORE_SCHEMES default). Off (default): such rows fall
  *     through to the corpus lookup (404) — the flag exists so the plan
  *     shape of pure-HTTP crawls is untouched.
  *  7. Rewrites (candidates for epoch k+1):
  *     - 301/302/303/307/308 + location (`scrapy/downloadermiddlewares/
  *       redirect.py:27-181`): urljoin target, priority+2, redirectTimes+1
  *       (drop past 20), dLink=-1, inherits dontFilter.
  *     - retryable status in {500,502,503,504,522,524,408,429}
  *       (`retry.py:38-179`): same url, priority-1, retryTimes+1 up to
  *       retryTimes, dontFilter=true, dLink=-2.
  *     - 2xx: links extracted in order; per-doc first-wins dedup on the RAW
  *       sanitized URL — the default extractor's `unique=True,
  *       canonicalize=False` key (`lxmlhtml.py:56-58,71-76`: `canonicalized
  *       = not canonicalize` ⇒ `link_key = url`), applied BEFORE the filter
  *       chain like the parser-level `_deduplicate_if_needed`
  *       (`lxmlhtml.py:140-145`) — so a filtered first occurrence shadows
  *       later raw-URL duplicates; filters: scheme in {http,https,ftp,
  *       file}, not nofollow, extension not in IGNORED_EXTENSIONS, length <=
  *       urlLengthLimit, the `linkFilter` user knobs (allow/deny regex,
  *       allow/deny domains, restrict_text — `lxmlhtml.py:217-240`,
  *       silently dropped, no counter), depth+1 <= depthLimit (0=off);
  *       child priority =
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
  *  7c. CrawlSpider rules (`crawlRules` non-empty; `spiders/crawl.py:
  *     61-100,136-158` — see [[graft.extract.CrawlRules]]): link extraction
  *     is replaced by the rule walk — each response (HTML 2xx, and only if
  *     the rule that emitted its request has `follow=true`; seeds always
  *     follow) runs every rule's extractor in order with a cross-rule
  *     Link-value seen set, then the rule's process_links / process_request
  *     hooks; surviving requests re-sanitize + re-fingerprint their
  *     (possibly hook-rewritten) URL, carry the emitting rule's index
  *     (meta["rule"]) and the emission index as dLink, and then pass the
  *     engine-level depth / offsite / URL-length filters and the normal
  *     Referer assignment and dupefilter. Per-extractor scheme/extension/
  *     allow/deny filtering lives INSIDE each rule's LinkExtractor
  *     (nofollow links are NOT dropped — reference parity); the engine's
  *     fixed filter chain of step 7 does not run. Hooks must be pure,
  *     deterministic and serializable — they execute inside Spark tasks.
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
  *  7d. Request-meta controls + HttpError (since r5): meta["dont_redirect"]
  *     passes 3xx AND qualifying meta-refresh responses through to the
  *     spider untouched (`redirect.py:54-57`, metarefresh shares the
  *     check); meta["dont_retry"] passes retryable statuses through and
  *     lets exceptions fail silently — no retry counters
  *     (`retry.py:52-55` + process_exception); meta["max_retry_times"]
  *     overrides RETRY_TIMES per request (`retry.py:68`). Every response
  *     that REACHES the spider (2xx, retry-exhausted, dont_redirect'd,
  *     dont_retry'd, location-less 3xx, 404s and other plain statuses —
  *     NOT exceptions (599) and NOT responses consumed by the
  *     redirect/retry rewrites) passes the HttpError gate
  *     (`httperror.py:38-60`): allowed = 2xx, or the request's
  *     meta["handle_httpstatus_list"]/"all" (replaces, never unions), else
  *     cfg.httperrorAllowedCodes/httperrorAllowAll. Allowed responses run
  *     the normal step-7/7a/7c expansion on their body; disallowed ones
  *     are dropped with `httperror/response_ignored_count` and
  *     `httperror/response_ignored_status_count/<status>`. All four metas
  *     are inherited by retries/redirects (meta copy), never by links.
  *     meta["dont_cache"] (`httpcache.py:64-65,99-100`) makes the request
  *     invisible to the 6d/6f cache: no lookup (never served cached), no
  *     store, and NO httpcache counters fire for it.
  *  7e. Depth stats (`spidermiddlewares/depth.py`): `request_depth_max` =
  *     max depth over link/rule candidates passing the depth filter
  *     (pre-dupefilter), merged across epochs by MAX. Under
  *     depthStatsVerbose (DEPTH_STATS_VERBOSE) additionally
  *     `request_depth_count/<n>` per surviving candidate, and
  *     `request_depth_count/0` once per spider-reaching ALLOWED response
  *     of a depth-0 request (the reference's _init_depth on responses
  *     whose meta lacks "depth" — start requests and their
  *     retries/redirects).
  *  7f. download_slot meta (`core/downloader/__init__.py` get_slot_key +
  *     the meta write-back in _enqueue_request): a request carrying
  *     meta["download_slot"] is charged to THAT politeness slot, overriding
  *     host/IP keying — requests on different hosts can share one slot's
  *     delay/budget/virtual-time sequence. The downloader writes the
  *     computed key back into meta, and request.replace copies meta, so
  *     redirects (incl. meta-refresh) and retries of a DOWNLOADED response
  *     inherit the slot their source was fetched under — a cross-host
  *     redirect stays charged to the ORIGINAL slot. Cache-hit responses
  *     never reach the downloader: no write-back (derived requests keep the
  *     source's own meta value, usually unset). Extracted links are fresh
  *     requests and never inherit. Robots fetches stay charged inside the
  *     walked slot (step 2's existing rule). AutoThrottle replay and lastT
  *     advance key by the same slot.
  *  7g. Form submission (`http/request/form.py` FormRequest + the redirect
  *     middleware's method rules): under submitForms, every spider-reaching
  *     200 HTML response with a <form> yields, AFTER its links (dLink =
  *     FormDLink), `FormRequest.from_response(response)` with the reference
  *     defaults — first form, controls in document order, first clickable
  *     appended. A POST carries the urlencoded body
  *     (application/x-www-form-urlencoded); a GET form rewrites the action
  *     URL's query string. The request fingerprint hashes (method, body)
  *     (`utils/request.py:87-94`) so POST≠GET in the dupefilter; the fetch
  *     log records the method; DownloaderStats (6h) counts
  *     request_method_count per method and the Content-Type + body bytes in
  *     request_bytes. Redirects: 302/303 convert the redirected request to
  *     GET with an empty body and no Content-Type
  *     (`redirect.py:177-181`), meta-refresh always converts, 301/307/308
  *     and retries keep method+body. Depth/offsite/urllength and the
  *     Referer policy apply to the form candidate exactly like a link.
  *  7h. Schedule-time offsite (`downloadermiddlewares/offsite.py:47-99` on
  *     the request_scheduled signal, engine `_schedule_request`
  *     `core/engine.py:414-423`): EVERY request entering the scheduler —
  *     links, forms, rule requests, redirects (incl. meta-refresh), retries,
  *     start requests — is checked against allowedDomains BEFORE the
  *     dupefilter; a filtered request never enters url_seen. `dont_filter`
  *     (true on retries and start requests, copied into redirects of either
  *     via request.replace) and meta["allow_offsite"] (FrontierRow/
  *     SeedRow/RuleRequest `allowOffsite`, inherited by retries/redirects,
  *     never by links) both bypass. Counters: `offsite/filtered` per
  *     dropped request; `offsite/domains` once per DISTINCT non-empty
  *     filtered hostname over the crawl lifetime (the middleware's
  *     `domains_seen` set — persisted as the `offsite_domains` delta chain
  *     so resume never re-counts). The allowed list is cleaned like
  *     `get_host_regex`: null / URL-shaped / port-carrying entries never
  *     match.
  *  8. Dupefilter (`scrapy/dupefilters.py:94-105` via scheduler `:343-345`):
  *     candidates processed in discovery order; dontFilter rows bypass (no
  *     seen-check, no insert); otherwise first-wins on fp against
  *     url_seen ∪ earlier-in-batch; inserted on miss; drops counted as
  *     `dupefilter/filtered`; enqueues as `scheduler/enqueued`.
  *  9. Stop conditions (`extensions/closespider.py`), all evaluated at
  *     EPOCH boundaries (the BSP analogue of the reference's mid-stream
  *     close_spider — the epoch that crosses a threshold completes first):
  *     frontier empty, maxEpochs reached, total page fetches ≥
  *     closespiderPageCount (CLOSESPIDER_PAGECOUNT), stored media items ≥
  *     closespiderItemCount (CLOSESPIDER_ITEMCOUNT over `file_count` — the
  *     item_scraped analogue; resume caveat (ADVICE r5): `file_count` is
  *     accumulated only over epochs run WITH the threshold armed — the
  *     expiry-off media path is deliberately count-free — so resuming a
  *     crawl whose earlier epochs ran unarmed starts the count from the
  *     resume point, deferring the cut past those earlier items; arm the
  *     threshold from epoch 0 for exact totals), or the VIRTUAL clock ≥
  *     closespiderTimeoutS
  *     (CLOSESPIDER_TIMEOUT mapped onto virtual time: max non-cached fetch
  *     `t`; deterministic where the reference's wall clock is not). The
  *     finish reason is recorded like CoreStats `finish_reason`
  *     ("finished" / "closespider_pagecount" / "closespider_itemcount" /
  *     "closespider_timeout" / "graft_max_epochs"), threshold reasons
  *     taking precedence over "finished" in that order, and both sides of
  *     the conformance pair must agree on it. CLOSESPIDER_ERRORCOUNT and
  *     the *_NO_ITEM pair are documented out: declarative spiders raise no
  *     callback errors, and the no-item looping-call windows have no
  *     deterministic BSP mapping.
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
    // transfers per slot per delay tick (CONCURRENT_REQUESTS_PER_DOMAIN
    // analogue, contract step 4); 1 = the reference's delay>0 serialization
    concurrency: Int = 1,
    // RANDOMIZE_DOWNLOAD_DELAY analogue (contract step 4a): tick lengths
    // drawn deterministically per (slot, epoch, tick) in [delay/2, 3·delay/2].
    // The reference DEFAULTS this to True (`default_settings.py`); the graft
    // ships false so the plain politeness timeline stays inspectable —
    // flip it to model the reference's default jitter.
    randomizeDelay: Boolean = false,
    depthLimit: Int = 0, // DEPTH_LIMIT, 0 = off
    depthPriority: Int = 0, // DEPTH_PRIORITY (1 → BFO)
    queueOrder: String = "lifo", // "lifo" (DFO, default) | "fifo" (BFO)
    robotsObey: Boolean = true, // north-rule runs enable it
    // ROBOTSTXT_USER_AGENT: the UA robots rules are matched against; null/""
    // falls back to userAgent (the request's UA), mirroring
    // `downloadermiddlewares/robotstxt.py:64-80`
    robotsUserAgent: String = "graftbot",
    retryTimes: Int = 2, // RETRY_TIMES
    maxRedirectTimes: Int = 20, // REDIRECT_MAX_TIMES
    urlLengthLimit: Int = 2083, // URLLENGTH_LIMIT
    allowedDomains: Seq[String] = Nil, // offsite filter; empty = allow all
    imagesMinWidth: Int = 0, // IMAGES_MIN_WIDTH (media min-size filter)
    imagesMinHeight: Int = 0, // IMAGES_MIN_HEIGHT
    // FILES_EXPIRES analogue (`pipelines/files.py:539-567` uptodate reuse):
    // ≥ 0 enables the media_seen state table — a media row whose stored age
    // on the VIRTUAL clock is ≤ this many days is replayed from stored
    // metadata instead of re-downloaded/decoded (counters file_count +
    // file_status_count/{downloaded,uptodate}). -1 (default) = off: the
    // reference defaults to 90, but within one crawl url_seen already makes
    // each media unique, so the table only pays for cache-primed re-crawls
    filesExpiresDays: Int = -1,
    downloadMaxSize: Long = 1073741824L, // DOWNLOAD_MAXSIZE (fetch cancel 6g + decompression guard 6b; 0 = unlimited)
    refererPolicy: String = "scrapy-default", // REFERRER_POLICY default policy
    metarefreshMaxDelay: Double = 100.0, // METAREFRESH_MAXDELAY (seconds)
    perIpSlots: Boolean = false, // CONCURRENT_REQUESTS_PER_IP analogue (step 1)
    maxFetchesPerEpoch: Long = 0, // global epoch cap, 0 = off (step 1b)
    userAgent: String = "graft/1.0 (+local)", // USER_AGENT analogue (step 6a)
    httpUser: String = null, // HttpAuthMiddleware http_user (step 6a)
    httpPass: String = null, // HttpAuthMiddleware http_pass
    httpAuthDomain: String = null, // http_auth_domain; null = all hosts (legacy)
    proxies: Map[String, String] = Map.empty, // scheme -> proxy URL (step 6a)
    noProxy: Seq[String] = Nil, // NO_PROXY host suffixes (proxy_bypass analogue)
    downloadTimeoutMs: Long = 180000, // DOWNLOAD_TIMEOUT (step 6c); 0 = off
    slotOverrides: Map[String, SlotOverride] = Map.empty, // DOWNLOAD_SLOTS (step 1a)
    autothrottle: Boolean = false, // AUTOTHROTTLE_ENABLED (step 1a)
    autothrottleStartDelayMs: Long = 5000, // AUTOTHROTTLE_START_DELAY
    autothrottleMaxDelayMs: Long = 60000, // AUTOTHROTTLE_MAX_DELAY
    autothrottleTargetConcurrency: Double = 1.0, // AUTOTHROTTLE_TARGET_CONCURRENCY
    // per-extractor LinkExtractor user knobs applied to extracted links
    // (contract step 7; reference `lxmlhtml.py:217-240` _link_allowed)
    linkFilter: graft.extract.LinkFilter = graft.extract.LinkFilter.Empty,
    // COOKIES_ENABLED (reference default True): false removes the
    // CookiesMiddleware — no Cookie headers, no jar state at all
    cookiesEnabled: Boolean = true,
    // HTTPERROR_ALLOWED_CODES / HTTPERROR_ALLOW_ALL (`spidermiddlewares/
    // httperror.py:29-37`, contract step 7d): spider-level non-2xx statuses
    // passed to the spider; per-request meta overrides both
    httperrorAllowedCodes: Seq[Int] = Nil,
    httperrorAllowAll: Boolean = false,
    // DEPTH_STATS_VERBOSE (`spidermiddlewares/depth.py`, contract 7e):
    // per-depth request_depth_count/<n> counters; request_depth_max is
    // always tracked
    depthStatsVerbose: Boolean = false,
    httpcacheEnabled: Boolean = false, // HTTPCACHE_ENABLED + DummyPolicy (step 6d)
    httpcacheIgnoreHttpCodes: Seq[Int] = Nil, // HTTPCACHE_IGNORE_HTTP_CODES (6d)
    httpcachePolicy: String = "dummy", // "dummy" | "rfc2616" (step 6f)
    virtualClockStartMs: Long = 0, // virtual-clock origin of epoch 0 (step 6f)
    localSchemes: Boolean = false, // data:/file: download handlers (step 6e)
    // Form submission in the crawl loop (contract step 7g): the declarative
    // analogue of a spider callback yielding
    // `FormRequest.from_response(response)` after its links — every
    // spider-reaching 200 HTML page containing a <form> additionally emits
    // the first form's submission request (`http/request/form.py:64-92`
    // from_response defaults: formnumber=0, click the first clickable).
    // The candidate goes through depth/offsite/urllength like a link; its
    // fingerprint hashes (method, body) so a POST is a distinct dupefilter
    // entry from the GET of the same action URL. Only the plain-link
    // pipeline runs it (CrawlSpider rules never call from_response).
    submitForms: Boolean = false,
    // CrawlSpider rules (step 7c); empty = the fixed link pipeline of step 7
    crawlRules: Seq[graft.extract.CrawlRules.CrawlRule] = Nil,
    maxEpochs: Int = 1000,
    closespiderPageCount: Long = 0, // 0 = off
    // CLOSESPIDER_ITEMCOUNT analogue (contract step 9): stop once stored
    // media items (file_count) reach this; 0 = off
    closespiderItemCount: Long = 0,
    // CLOSESPIDER_TIMEOUT on the VIRTUAL clock (contract step 9): stop once
    // the max non-cached fetch t reaches this many seconds; 0 = off
    closespiderTimeoutS: Long = 0,
    /** Engine sizing knob, NOT part of the semantics contract (the oracle
      * ignores it): when the frontier may exceed this many rows, global fetch
      * seq assignment switches from driver-side key collect to a distributed
      * orderBy + zipWithIndex. 0 forces the distributed path (used by the
      * conformance variant that pins both paths byte-identical). */
    seqCollectMax: Long = 2000000L,
    /** Engine sizing knob (oracle ignores it): resident Bloom-prescreen
      * bytes at which evaluation switches from whole-filter broadcast to
      * bucket-local shard-file probes (candidates repartitioned by fp
      * bucket; each task reads only its buckets' files — executor memory
      * bounded by resident-bucket size). 0 forces bucket-local always (the
      * conformance variant pinning both modes byte-identical); -1 always
      * broadcasts. */
    bloomLocalMinBytes: Long = 64L << 20
) {
  /** HttpErrorMiddleware allow predicate (`spidermiddlewares/httperror.py:
    * 38-52`, contract step 7d) — THE single authority both the oracle and
    * the engine call. `handleMeta` is the request's handleHttpstatus meta
    * ("" unset / "all" / comma-joined codes); a set meta REPLACES the
    * spider-level list outright (reference: meta wins, no union). */
  def httperrorAllowed(status: Int, handleMeta: String): Boolean =
    (status >= 200 && status < 300) || (handleMeta match {
      case "" => httperrorAllowAll || httperrorAllowedCodes.contains(status)
      case "all" => true
      case s => s.split(",").contains(status.toString)
    })

  /** `get_host_regex` model (`downloadermiddlewares/offsite.py:73-99`):
    * the CLEANED allowed-domain list — `None` entries, URL entries
    * (`^https?://`) and entries carrying a port (`:\d+$`) are dropped with
    * a warning in the reference and never match. */
  @transient private lazy val offsiteDomains: Seq[String] =
    allowedDomains.filter(d => d != null &&
      !d.matches("^https?://.*$") && !d.matches(".*:\\d+$"))

  /** `should_follow` (`downloadermiddlewares/offsite.py:68-72`): host must
    * fully match `^(.*\.)?(d1|d2|…)$` over the cleaned domains — equal to
    * one of them or a subdomain. An EMPTY `allowed_domains` compiles to
    * `re.compile("")` (allow all); a non-empty list whose entries are ALL
    * invalid matches only the empty/trailing-dot host (the reference's
    * degenerate `^(.*\.)?()$`). A null host is the reference's
    * `hostname or ""`. */
  def hostAllowed(host: String): Boolean = {
    if (allowedDomains.isEmpty) return true
    val h = if (host == null) "" else host
    if (offsiteDomains.isEmpty) h.isEmpty || h.endsWith(".")
    else offsiteDomains.exists(d => h == d || h.endsWith("." + d))
  }

  /** Schedule-time offsite decision (`offsite.py:47-66` process_request on
    * the request_scheduled signal, contract step 7h): true = the request is
    * DROPPED (IgnoreRequest). `dont_filter` and meta["allow_offsite"] both
    * bypass. THE single authority both the oracle and the engine call, at
    * every schedule point (links, forms, rule requests, redirects,
    * meta-refresh; retries and start requests carry dont_filter=true). */
  def offsiteFiltered(host: String, dontFilter: Boolean,
      allowOffsite: Boolean): Boolean =
    !dontFilter && !allowOffsite && !hostAllowed(host)
  require(queueOrder == "lifo" || queueOrder == "fifo", s"bad queueOrder $queueOrder")
  require(concurrency >= 1, s"bad concurrency $concurrency")
  require(httpcachePolicy == "dummy" || httpcachePolicy == "rfc2616",
    s"bad httpcachePolicy $httpcachePolicy")

  /** Budget at delay `delay` under per-epoch cap `cap` (contract step 1a):
    * `concurrency` transfers leave per delay tick (step 4). */
  def budgetFor(delay: Long, cap: Int): Int =
    math.min(
      math.max(1L, (epochMs / math.max(delay, 1L)) * concurrency.toLong),
      cap.toLong).toInt

  /** Default budget (no override, no adaptive delay) — step 1's formula. */
  def hostBudget: Int = budgetFor(delayMs, maxPerHostPerEpoch)

  /** Slot's configured (non-adaptive) delay: DOWNLOAD_SLOTS override or the
    * global DOWNLOAD_DELAY (contract step 1a). */
  def baseDelayOf(slot: String): Long =
    slotOverrides.get(slot).flatMap(_.delayMs).getOrElse(delayMs)

  /** Slot's per-epoch fetch cap: DOWNLOAD_SLOTS concurrency override or the
    * global maxPerHostPerEpoch. */
  def slotCapOf(slot: String): Int =
    slotOverrides.get(slot).flatMap(_.maxPerEpoch).getOrElse(maxPerHostPerEpoch)

  /** The slot's delay for an epoch, from its stored adaptive delay
    * (-1 = none) — contract step 1a; shared by engine and oracle. */
  def resolveSlotDelay(slot: String, storedDelayMs: Long): Long =
    if (!autothrottle) baseDelayOf(slot)
    else if (storedDelayMs >= 0) storedDelayMs
    else slotOverrides.get(slot).flatMap(_.delayMs)
      .getOrElse(math.max(delayMs, autothrottleStartDelayMs))

  /** Politeness budget of a slot for an epoch (steps 1a + 1). */
  def slotBudgetOf(slot: String, storedDelayMs: Long): Int =
    budgetFor(resolveSlotDelay(slot, storedDelayMs), slotCapOf(slot))

  /** Whether the slot's delay ticks are randomized (contract step 4a):
    * DOWNLOAD_SLOTS `randomize_delay` override, else the global setting. */
  def slotRandomize(slot: String): Boolean =
    slotOverrides.get(slot).flatMap(_.randomize).getOrElse(randomizeDelay)

  /** Contract step 4a — length of delay tick `k` of `slot` in `epoch` at
    * resolved delay `delay`: the SINGLE authority the oracle and the engine
    * both call, so the randomized timeline can never diverge. Plain ticks
    * (randomize off) have length `delay`. Randomized ticks model the
    * reference's `random.uniform(0.5·delay, 1.5·delay)` per wait
    * (`scrapy/core/downloader/__init__.py` `Slot.download_delay`,
    * RANDOMIZE_DOWNLOAD_DELAY) as a deterministic integral uniform over
    * [delay/2, delay/2 + delay], drawn by hashing (slot, epoch, k) — no RNG
    * state, identical on every executor and across resumes. Tick 0 is the
    * wait after the slot's previous departure (the `lastT + delay` term);
    * ticks 1.. separate the epoch's departure batches. */
  def tickLen(slot: String, epoch: Int, k: Long, delay: Long): Long =
    if (delay <= 0 || !slotRandomize(slot)) delay
    else {
      val h = scala.util.hashing.MurmurHash3.stringHash(
        s"$slot\u0000$epoch\u0000$k")
      delay / 2 + java.lang.Integer.toUnsignedLong(h) % (delay + 1)
    }

  /** Upper bound on any slot's budget under this config — the fair-share
    * histogram/binary-search ceiling (budget_s ≤ cap_s always). */
  def maxSlotBudget: Int =
    (maxPerHostPerEpoch +: slotOverrides.valuesIterator.flatMap(_.maxPerEpoch).toSeq).max

  /** Authorization header for a host (`httpauth.py:36-53`; w3lib
    * basic_auth_header, ISO-8859-1 credentials), or null. */
  def authorizationFor(host: String): String = {
    val hasCreds = (httpUser != null && httpUser.nonEmpty) ||
      (httpPass != null && httpPass.nonEmpty)
    if (!hasCreds) null
    else if (httpAuthDomain == null || host == httpAuthDomain ||
        host.endsWith("." + httpAuthDomain)) {
      val u = Option(httpUser).getOrElse("")
      val p = Option(httpPass).getOrElse("")
      "Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$u:$p".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    } else null
  }

  /** Proxy for a request (`httpproxy.py:45-106` env-proxy semantics:
    * per-scheme proxy unless the host matches a no-proxy suffix), or null. */
  /** `_parse_proxy` + `_get_proxy` (`httpproxy.py:58-63` over urllib
    * `_parse_proxy`): a configured proxy URL may carry userinfo — the
    * middleware SPLITS it: meta["proxy"] gets the credential-stripped
    * `scheme://hostport` and the credentials become a Proxy-Authorization
    * header (`Basic ` + b64 of the percent-unquoted `user:pass`, encoded
    * HTTPPROXY_AUTH_ENCODING = latin-1, `_basic_auth_header`
    * `httpproxy.py:52-56`). Returns (strippedUrl, basicCredsOrNull).
    *
    * ADVICE r5 edges: credentials are gated on a NON-EMPTY username — the
    * reference's `if user` (`httpproxy.py:61-62`) emits no header for
    * `http://:pass@host`; and a scheme-less proxy URL inherits the
    * proxies-map key like `urlunparse((proxy_type or orig_type, ...))`
    * (`orig_type` = the scheme the proxy was configured under). */
  def parseProxyUrl(url: String, origType: String = ""): (String, String) = {
    val i = url.indexOf("://")
    val (scheme, rest) =
      if (i < 0) ("", url) else (url.substring(0, i), url.substring(i + 3))
    val slash = rest.indexOf('/')
    val authority = if (slash < 0) rest else rest.substring(0, slash)
    val at = authority.lastIndexOf('@')
    val (userinfo, hostport) =
      if (at < 0) (null, authority)
      else (authority.substring(0, at), authority.substring(at + 1))
    val effScheme = if (scheme.nonEmpty) scheme else origType
    val stripped =
      (if (effScheme.nonEmpty) effScheme + "://" else "//") + hostport
    val creds =
      if (userinfo == null || userinfo.isEmpty) null
      else {
        val c = userinfo.indexOf(':')
        val (u, p) = if (c < 0) (userinfo, "") else
          (userinfo.substring(0, c), userinfo.substring(c + 1))
        if (u.isEmpty) null // `if user:` — password-only ⇒ no header
        else {
          val userPass = graft.urlkit.PyUrl.unquote(u) + ":" +
            graft.urlkit.PyUrl.unquote(p)
          java.util.Base64.getEncoder.encodeToString(
            userPass.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        }
      }
    (stripped, creds)
  }

  @transient private lazy val parsedProxies: Map[String, (String, String)] =
    proxies.map { case (k, v) => k -> parseProxyUrl(v, k) }

  /** The proxy this request routes through — CREDENTIAL-STRIPPED like the
    * reference's meta["proxy"] (`httpproxy.py:88-91`); null = direct. */
  def proxyFor(scheme: String, host: String): String =
    if (noProxy.exists(s => host == s || host.endsWith("." + s))) null
    else parsedProxies.get(scheme).map(_._1).orNull

  /** Proxy-Authorization header value for this request (`httpproxy.py:
    * 94-95`): "Basic <b64>" when the routed proxy carries credentials,
    * null otherwise (no proxy / credential-less proxy / noProxy bypass). */
  def proxyAuthFor(scheme: String, host: String): String =
    if (noProxy.exists(s => host == s || host.endsWith("." + s))) null
    else parsedProxies.get(scheme).flatMap(p => Option(p._2))
      .map("Basic " + _).orNull

  /** UA robots rules are matched against: ROBOTSTXT_USER_AGENT, falling back
    * to the request's User-Agent (`robotstxt.py:64-80`). */
  def effectiveRobotsUserAgent: String =
    if (robotsUserAgent == null || robotsUserAgent.isEmpty) userAgent
    else robotsUserAgent
}

/** One DOWNLOAD_SLOTS entry (`scrapy/core/downloader/__init__.py:131-166`):
  * per-slot delay and/or per-epoch fetch-cap override; None = inherit the
  * global setting. Keyed by the politeness slot id (host, or IP under
  * perIpSlots). */
final case class SlotOverride(
    delayMs: Option[Long] = None,
    maxPerEpoch: Option[Int] = None,
    // DOWNLOAD_SLOTS `randomize_delay` per-slot override (`downloader/
    // __init__.py` Slot; None = the global randomizeDelay setting)
    randomize: Option[Boolean] = None)

object CrawlConfig {
  /** Retryable HTTP codes, `default_settings.py:456-463`. */
  val RetryStatuses: Set[Int] = Set(500, 502, 503, 504, 522, 524, 408, 429)

  /** Redirect method conversion (contract step 7g, `redirect.py:177-181`):
    * 301/307/308 preserve method+body; 302/303 redirect with GET and an
    * empty body, dropping Content-Type/Content-Length
    * (`_redirect_request_using_get`). Meta-refresh ALWAYS converts to GET
    * (`redirect.py:207`). The single authority both the oracle and the
    * engine call. (HEAD is never produced by this engine.) */
  def redirectToGet(status: Int): Boolean = status == 302 || status == 303

  /** dLink of a form-submission candidate (contract step 7g): sorts after
    * every possible raw anchor index of its parent page, so the FormRequest
    * is discovered after all of the page's links — the spider-callback
    * `yield`-order this engine's declarative form pipeline models. */
  val FormDLink: Int = Int.MaxValue

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
