package graft.corpus

import java.util.Random
import graft._
import graft.media.{ImageOps, Phash}
import graft.urlkit.UrlKit

/** Deterministic synthetic web + image/caption corpus (FIXTURES.md).
  * Every row is a pure function of (spec.seed, indices) — the oracle and the
  * Spark engine see byte-identical inputs, and Spark can generate partitions
  * independently (`spark.range(n).mapPartitions`) with no cross-row state.
  *
  * Canonicalization traps (shuffled query order, fragments, uppercase hosts,
  * percent-variants) are planted in links so the URL-seen set and fetch
  * lookup must collapse them, per the reference fingerprint semantics.
  */
final case class CorpusSpec(
    seed: Long = 42L,
    nHosts: Int = 50,
    totalPages: Int = 2000,
    hotHostShare: Double = 0.2, // top host's share of pages (skew knob)
    maxLinks: Int = 8,
    imageMaxDim: Int = 96,
    seedCount: Int = 20,
    // URL scheme of every corpus URL — "https" exercises the
    // robots-URL-from-request-scheme path (`robotstxt.py:82-99`)
    scheme: String = "http",
    // make ~25% of seeds target /private/ pages with the
    // dont_obey_robotstxt meta bypass (`robotstxt.py:57-59`)
    bypassRobotsSeeds: Boolean = false,
    // false = round-1-shaped corpus: no Content-Encoding, Referrer-Policy,
    // Set-Cookie or meta-refresh traps — the equal-work A/B baseline for
    // benchmarking the heavier per-page pipeline (BASELINE.md)
    richTraps: Boolean = true,
    // non-null = append data:/file: seeds (contract 6e); file: URLs point
    // under this directory — populate it with Corpus.writeLocalFiles first
    localSeedsDir: String = null,
    // emit Cache-Control response headers (contract 6f rfc2616 variant);
    // drawn from an independent RNG stream so flag-off corpora are
    // byte-identical to older rounds
    cacheHeaders: Boolean = false,
    // tier-2 cookie corpus: odd hosts become subdomains of their even
    // neighbor (sub.hK.test) and Set-Cookie headers carry Domain/Path/
    // Max-Age/Secure attributes + multi-header responses (independent RNG
    // stream; page bodies/latencies stay identical to the flag-off spec)
    cookieTraps: Boolean = false,
    // cookiejar-meta seeds (`cookies.py:52-66,79-81`): ~30% of seeds carry
    // meta["cookiejar"] ∈ {jA, jB} and ~12% meta["dont_merge_cookies"]
    // (independent RNG stream; flag-off seed lists are byte-identical).
    // Same-host seeds sharing a jar spread across epochs under per-slot
    // delay, so later ones SEND what earlier ones stored — per-jar headers
    // observably diverge from the default jar's.
    cookieJarSeeds: Boolean = false,
    // request-meta control seeds (contract step 7d): appends seeds that
    // target known 3xx/503/404 pages with dont_redirect / dont_retry /
    // max_retry_times / handle_httpstatus metas, so every meta observably
    // changes the fetch log or the httperror counters
    metaControlSeeds: Boolean = false,
    // download_slot meta seeds (contract step 7f): appends seeds on
    // DIFFERENT hosts sharing an explicit meta["download_slot"] pool (their
    // fetches serialize on one politeness sequence) plus plain seeds
    // targeting cross-host redirect pages (slot write-back inheritance:
    // the redirected fetch stays charged to the ORIGINAL host's slot).
    // Also flips every 3rd 302 page's Location to the NEXT host — flag-off
    // specs stay byte-identical.
    slotMetaSeeds: Boolean = false,
    // download_maxsize meta seeds (contract step 6g; pairs with a crawl
    // config of downloadMaxSize = 300 — Small corpus bodies span 93..516 B,
    // so both sides of the limit are populated): appends seeds overriding
    // the limit per request — up (1 GiB on a page oversize under 300), off
    // (0 on another oversize page), and down (64 B on a page that is fine
    // under 300) — so each override observably flips cancel vs fetch.
    sizeMetaSeeds: Boolean = false,
    // duplicate-seed seeds (contract step 0: start requests are
    // dont_filter=True, so duplicate seed URLs each fetch and seed
    // fingerprints never enter url_seen): re-appends the first 3 base
    // seeds at the tail of the list.
    dupSeeds: Boolean = false,
    // form corpus (contract step 7g; pair with cfg.submitForms): ~45% of
    // content pages carry a <form> — POST with text/hidden/checkbox inputs
    // and a submit button, GET with query-rewrite inputs matching an
    // existing ?a=&b= page, select-with-options, action-less, cross-host
    // and robots-blocked actions. Action targets land on the natural page
    // mix, so some are 301 (POST preserved) and some 302 (POST → GET).
    // Independent RNG stream — flag-off corpora stay byte-identical.
    formPages: Boolean = false,
    // Location-resolution trap pages (reference `redirect.py:163-173`):
    // plants a triple-slash scheme-relative 302 (///host/path → the
    // request scheme + host, NOT a path on the original host), a 301 whose
    // Location is a data: URI (non-http target: the response passes
    // through, no redirect) and a network-path //host/path 302, plus
    // seeds targeting all three. Flag-off corpora stay byte-identical.
    schemeTrapPages: Boolean = false,
    // offsite-redirect trap pages (contract 7h; pair with an allowedDomains
    // config): plants, at j=2 on hosts 1-3, a 302 and a meta-refresh whose
    // targets are OFF-domain hosts (schedule-time offsite filters them for
    // link-discovered requests) plus a seed directly on the third trap —
    // the seed's redirect inherits dont_filter=true and BYPASSES offsite,
    // so the off-domain host actually fetches. Flag-off corpora stay
    // byte-identical.
    offsiteTrapPages: Boolean = false) {

  /** Pages on host k: host 0 is the hot host; the rest share uniformly. */
  def pagesOnHost(k: Int): Int = {
    if (nHosts == 1) totalPages
    else if (k == 0) math.max(1, (totalPages * hotHostShare).toInt)
    else {
      val rest = totalPages - math.max(1, (totalPages * hotHostShare).toInt)
      val per = rest / (nHosts - 1)
      if (k <= rest - per * (nHosts - 1)) per + 1 else per
    }
  }
  def hostName(k: Int): String =
    if (cookieTraps && k % 2 == 1) s"sub.h${k - 1}.test" else s"h$k.test"

  /** Registrable parent domain of host k's subdomain pair (cookieTraps):
    * hosts 2m and 2m+1 share it, so a Domain-scoped cookie crosses them. */
  def pairDomain(k: Int): String = s"h${k - (k % 2)}.test"

  // prefix offsets memoized once (recomputed per executor after
  // deserialization — O(nHosts), trivial): pageGlobalIdx must be O(1) or a
  // 10^6-host corpus generation goes quadratic
  @transient private lazy val hostOffsets: Array[Int] = {
    val off = new Array[Int](nHosts + 1)
    var k = 0
    while (k < nHosts) { off(k + 1) = off(k) + pagesOnHost(k); k += 1 }
    off
  }

  /** Global page index of (host k, page j) — image FK + PRNG stream id. */
  def pageGlobalIdx(k: Int, j: Int): Int = hostOffsets(k) + j
}

object Corpus {

  private def rng(spec: CorpusSpec, stream: Long): Random =
    new Random(spec.seed * 0x9e3779b97f4a7c15L + stream)

  // ---- URLs ---------------------------------------------------------------

  /** Canonical URL of page (k, j). Every 10th page carries a query. */
  def pageUrl(spec: CorpusSpec, k: Int, j: Int): String = {
    val base = s"${spec.scheme}://${spec.hostName(k)}/p/$j"
    if (j % 10 == 0 && j > 0) s"$base?a=${j % 5}&b=${j % 7}" else base
  }

  /** Canonical URL of a robots-disallowed page (under /private/). */
  def privateUrl(spec: CorpusSpec, k: Int, m: Int): String =
    s"${spec.scheme}://${spec.hostName(k)}/private/$m"

  /** A raw href for page (k,j) in one of several equivalent trap forms —
    * all collapse to pageUrl under canonicalize_url. `form` selects. */
  def trapHref(spec: CorpusSpec, k: Int, j: Int, form: Int): String = {
    val host = spec.hostName(k)
    val query = if (j % 10 == 0 && j > 0) s"?b=${j % 7}&a=${j % 5}" else ""
    form % 4 match {
      case 0 => s"${spec.scheme}://${host.toUpperCase(java.util.Locale.ROOT)}/p/$j$query"
      case 1 => s"${spec.scheme}://$host/p/$j$query#sec${j % 3}"
      case 2 => s"/p/$j$query" // relative, canonical query order restored by sort
      case _ => s"${spec.scheme}://$host/%70/$j$query" // %70 = 'p', decodes to same path
    }
  }

  // ---- pages --------------------------------------------------------------

  /** Cache-Control header of page (k,j) — independent RNG stream (contract
    * 6f): max-age spread crossing the primed-crawl clock offset, no-store /
    * no-cache / must-revalidate / expiry-free mixes. */
  def cacheControlOf(spec: CorpusSpec, k: Int, j: Int): String = {
    if (!spec.cacheHeaders) return null
    val rc = rng(spec, 7000000003L * (spec.pageGlobalIdx(k, j) + 1))
    val roll = rc.nextDouble()
    if (roll < 0.45) null
    else if (roll < 0.70) s"max-age=${1 + rc.nextInt(30)}" // seconds
    else if (roll < 0.78) "no-store"
    else if (roll < 0.85) "no-cache"
    else if (roll < 0.92) s"max-age=${1 + rc.nextInt(10)}, must-revalidate"
    else "public" // no expiry info, no validators → not stored
  }

  /** Pure page generator. Status mix: 200 / 404 / 301 / 302 / 503. */
  def page(spec: CorpusSpec, k: Int, j: Int): PageRow = {
    val r = rng(spec, 1000000007L * (k + 1) + j)
    val url = pageUrl(spec, k, j)
    val gIdx = spec.pageGlobalIdx(k, j)
    val roll = r.nextDouble()
    val nK = spec.pagesOnHost(k)
    val cc = cacheControlOf(spec, k, j)
    if (spec.schemeTrapPages && j == 1 && k >= 1 && k <= 3 && spec.nHosts > 4) {
      // planted Location-resolution traps (flag-on only; `redirscheme`
      // conformance variant pins engine == oracle on all three)
      return (k: @unchecked) match {
        case 1 => // triple-slash scheme-relative → scheme://h2/p/0
          PageRow(url, 302, s"///${spec.hostName(2)}/p/0",
            Array.emptyByteArray, null, 25, cacheControl = cc)
        case 2 => // non-http(s) target: response passes through, no redirect
          PageRow(url, 301, "data:text/html,trap",
            Array.emptyByteArray, null, 25, cacheControl = cc)
        case 3 => // network-path relative → scheme://h4/p/1
          PageRow(url, 302, s"//${spec.hostName(4)}/p/1",
            Array.emptyByteArray, null, 25, cacheControl = cc)
      }
    }
    if (spec.offsiteTrapPages && j == 2 && k >= 1 && k <= 3 && spec.nHosts > 45) {
      // planted offsite-redirect traps (flag-on only; `offsiteredir`
      // conformance variant pins engine == oracle on all three): targets
      // are corpus hosts OUTSIDE the variant's allowedDomains
      return (k: @unchecked) match {
        case 1 => // 302 → off-domain: schedule-time offsite filters it (7h)
          PageRow(url, 302, s"${spec.scheme}://${spec.hostName(40)}/p/0",
            Array.emptyByteArray, null, 25, cacheControl = cc)
        case 2 => // meta-refresh → off-domain: same gate at the mr site
          PageRow(url, 200, null,
            (s"""<html><head><meta http-equiv="refresh" content="0; """ +
              s"""url=${spec.scheme}://${spec.hostName(41)}/p/0"></head>""" +
              "<body>moved</body></html>")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8),
            null, 25, cacheControl = cc)
        case 3 => // 302 → off-domain; a SEED lands here too (bypass path)
          PageRow(url, 302, s"${spec.scheme}://${spec.hostName(42)}/p/1",
            Array.emptyByteArray, null, 25, cacheControl = cc)
      }
    }
    if (roll < 0.04 && j > 0) { // 404
      PageRow(url, 404, null, Array.emptyByteArray, null, 10 + r.nextInt(100),
        cacheControl = cc)
    } else if (roll < 0.07 && nK > 1) { // 302 → another page same host —
      // or, under slotMetaSeeds, every 3rd one targets the NEXT host
      // (cross-host redirect: exercises slot write-back, contract 7f)
      val tgt = r.nextInt(nK)
      if (spec.slotMetaSeeds && j % 3 == 0 && spec.nHosts > 1) {
        val k2 = (k + 1) % spec.nHosts
        PageRow(url, 302,
          s"${spec.scheme}://${spec.hostName(k2)}/p/${tgt % spec.pagesOnHost(k2)}",
          Array.emptyByteArray, null, 10 + r.nextInt(100), cacheControl = cc)
      } else
        PageRow(url, 302, s"/p/$tgt", Array.emptyByteArray, null, 10 + r.nextInt(100),
          cacheControl = cc)
    } else if (roll < 0.08 && nK > 1) { // 301
      val tgt = r.nextInt(nK)
      PageRow(url, 301, s"${spec.scheme}://${spec.hostName(k)}/p/$tgt", Array.emptyByteArray, null, 10 + r.nextInt(100),
        cacheControl = cc)
    } else if (roll < 0.10) { // 503 retryable
      PageRow(url, 503, null, Array.emptyByteArray, null, 200 + r.nextInt(400),
        cacheControl = cc)
    } else if (roll < 0.125 && nK > 1 && spec.richTraps) { // meta-refresh traps
      val tgt = r.nextInt(nK)
      val mr = r.nextDouble()
      val html =
        if (mr < 0.40) // plain immediate refresh → redirect
          s"""<html><head><meta http-equiv="refresh" content="0; url=/p/$tgt"></head><body>moved</body></html>"""
        else if (mr < 0.60) // reversed attrs, single quotes, uppercase URL= → redirect
          s"""<html><head><meta content='5; URL=${spec.scheme}://${spec.hostName(k)}/p/$tgt' http-equiv='refresh'></head><body>moved</body></html>"""
        else if (mr < 0.80) // delay over METAREFRESH_MAXDELAY → content page
          s"""<html><head><meta http-equiv="refresh" content="200; url=/p/$tgt"></head><body><a href="/p/$tgt">slow</a></body></html>"""
        else // directive inside noscript is ignored → content page
          s"""<html><head><noscript><meta http-equiv="refresh" content="0; url=/p/$tgt"></noscript></head><body><a href="/p/$tgt">ns</a></body></html>"""
      PageRow(url, 200, null, html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        null, 10 + r.nextInt(100), cacheControl = cc)
    } else if (!spec.richTraps) {
      // round-1-shaped content page: raw body, no response-header traps
      val html = pageHtml(spec, k, j, r)
      val raw = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      PageRow(url, 200, null, raw, f"img$gIdx%09d", 10 + r.nextInt(490),
        cacheControl = cc)
    } else {
      val html = pageHtml(spec, k, j, r)
      val raw = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // Content-Encoding mix: most real fetches are compressed (reference
      // httpcompression middleware is on by default). Deterministic bytes:
      // Java's GZIP header carries mtime=0.
      val encRoll = r.nextDouble()
      val (body, enc) =
        if (encRoll < 0.40) (graft.extract.HttpCompression.gzipBytes(raw), "gzip")
        else if (encRoll < 0.50) (graft.extract.HttpCompression.deflateBytes(raw), "deflate")
        else if (encRoll < 0.53) (graft.extract.HttpCompression.gzipBytes(raw), "x-gzip")
        else if (encRoll < 0.56) (graft.extract.HttpCompression.zstdBytes(raw), "zstd")
        // brotli: no codec in this build — the unknown-coding keep path
        // (body opaque, NO httpcompression counters, reference parity)
        else if (encRoll < 0.575) (raw, "br")
        else (raw, null)
      // Referrer-Policy header traps: valid names, mixed case, comma lists
      // with unknown tokens (rightmost-valid wins), pure-unknown (falls back
      // to the configured default policy)
      val polRoll = r.nextDouble()
      val refPolicy =
        if (polRoll < 0.80) null
        else if (polRoll < 0.92) {
          val names = Array("no-referrer", "no-referrer-when-downgrade",
            "same-origin", "origin", "strict-origin", "origin-when-cross-origin",
            "strict-origin-when-cross-origin", "unsafe-url", "scrapy-default")
          names(r.nextInt(names.length))
        } else if (polRoll < 0.95) "UNSAFE-URL" // case-insensitive parse
        else if (polRoll < 0.98) "bogus-token, same-origin" // rightmost-valid
        else "totally-unknown" // → default policy
      // Set-Cookie traps: per-page session values (same-host pages overwrite
      // the same name → last-writer-by-seq wins), attribute noise, deletions.
      // cookieTraps swaps in the tier-2 battery from an INDEPENDENT stream
      // (ckRoll still drawn so the shared stream — and the latency draw
      // after it — stays byte-identical to the flag-off spec)
      val ckRoll = r.nextDouble()
      val setCookie =
        if (spec.cookieTraps) cookieTrapHeader(spec, k, j)
        else if (ckRoll < 0.80) null
        else if (ckRoll < 0.88) s"sid=v$j; Path=/; HttpOnly"
        else if (ckRoll < 0.92) s"pref=p${j % 3}"
        // non-ASCII collation traps: the two names share a prefix and then
        // diverge on a supplementary char (U+1F600, UTF-16 surrogates) vs a
        // high-BMP char (U+FFE5) — UTF-8 byte order and UTF-16 code-unit
        // order DISAGREE on which sorts first, so the Cookie-header render
        // must use one shared collation on both sides
        else if (ckRoll < 0.94) "z😀=emoji"
        else if (ckRoll < 0.955) "z￥=yen"
        else if (ckRoll < 0.97) "sid=; Max-Age=0" // deletion
        else "malformed-no-equals" // ignored
      // latency draw LAST (and widened for the timeout/autothrottle traps:
      // content pages span 10–500 ms so DOWNLOAD_TIMEOUT variants trip on
      // real 200s, not just slow 503s) — it must stay the final draw of this
      // page's RNG stream so earlier content bytes are unaffected
      PageRow(url, 200, null, body, f"img$gIdx%09d", 10 + r.nextInt(490), enc,
        refPolicy, setCookie, cacheControl = cc)
    }
  }

  /** Tier-2 Set-Cookie battery (cookieTraps; see graft.operators.Cookies):
    * Domain-scoped pair-shared cookies, path scoping, Secure, Max-Age
    * expiry mid-crawl, Max-Age=0 deletions, multi-header responses,
    * rejected foreign domains, malformed lines. Newline = separate
    * Set-Cookie headers of one response. */
  def cookieTrapHeader(spec: CorpusSpec, k: Int, j: Int): String = {
    val ck = rng(spec, 7500000011L * (spec.pageGlobalIdx(k, j) + 1))
    val roll = ck.nextDouble()
    val parent = spec.pairDomain(k)
    if (roll < 0.23) null
    else if (roll < 0.36) s"site=s${k - (k % 2)}; Domain=$parent; Path=/" // crosses the pair
    else if (roll < 0.44) s"p=v$j; Path=/p" // path-scoped: /p/* only, not /private/
    else if (roll < 0.50) s"sec=v$j; Secure" // https-only (sent in the https variant)
    else if (roll < 0.58) s"ttl=v$j; Max-Age=${1 + ck.nextInt(4)}" // expires mid-crawl
    else if (roll < 0.63) s"site=gone; Max-Age=0; Domain=$parent; Path=/" // deletion
    else if (roll < 0.70) s"a=1\npref=p${j % 3}; Path=/" // two headers, one response
    else if (roll < 0.76) s"pref=q$j" // default path (/p for /p/N pages)
    else if (roll < 0.82) s"evil=x; Domain=other-domain.example" // rejected (no match)
    // Expires battery (r5; clock origin = epoch 0 in the conformance runs,
    // so 1970 dates are small virtual times): RFC-1123, asctime 2-digit-
    // year, Max-Age-wins, Expires deletion, unparseable → session
    else if (roll < 0.87) s"exp=v$j; Expires=Thu, 01 Jan 1970 00:00:0${1 + ck.nextInt(4)} GMT" // expires mid-crawl
    else if (roll < 0.90) s"far=v$j; Expires=Sat Jan  1 00:00:30 72" // 2-digit year 72 → 1972, far future
    else if (roll < 0.93) s"both=b$j; Max-Age=${2 + ck.nextInt(3)}; Expires=Thu, 01 Jan 1970 00:00:01 GMT" // Max-Age WINS over the near-expired date
    else if (roll < 0.955) s"exp=gone; Expires=Thu, 01 Jan 1970 00:00:00 GMT; Path=/" // deletion via Expires
    else if (roll < 0.98) s"keep=v$j; Expires=not-a-real-date" // unparseable → session cookie
    else "malformed-no-equals" // ignored
  }

  private def pageHtml(spec: CorpusSpec, k: Int, j: Int, r: Random): String = {
    val nK = spec.pagesOnHost(k)
    val sb = new StringBuilder
    sb.append(s"<html><head><title>page $k/$j</title></head><body>\n")
    sb.append(s"""<img src="/i/${spec.pageGlobalIdx(k, j)}.raw">\n""")
    sb.append(s"<p>${caption(spec, spec.pageGlobalIdx(k, j))}</p>\n")
    val nLinks = 2 + r.nextInt(math.max(1, spec.maxLinks - 1))
    for (_ <- 0 until nLinks) {
      val roll = r.nextDouble()
      if (roll < 0.55 && nK > 1) { // same-host plain or relative
        val tgt = r.nextInt(nK)
        val href =
          if (r.nextBoolean()) s"/p/$tgt" + queryOf(tgt)
          else s"${spec.scheme}://${spec.hostName(k)}/p/$tgt" + queryOf(tgt)
        sb.append(s"""<a href="$href">to $tgt</a>\n""")
      } else if (roll < 0.70) { // trap variant, same host
        val tgt = r.nextInt(nK)
        sb.append(s"""<a href="${trapHref(spec, k, tgt, r.nextInt(4))}">trap $tgt</a>\n""")
      } else if (roll < 0.85 && spec.nHosts > 1) { // cross-host
        val hk = r.nextInt(spec.nHosts)
        val tgt = r.nextInt(spec.pagesOnHost(hk))
        sb.append(s"""<a href="${spec.scheme}://${spec.hostName(hk)}/p/$tgt${queryOf(tgt)}">x $hk/$tgt</a>\n""")
      } else if (roll < 0.90) { // robots-disallowed target
        sb.append(s"""<a href="/private/${r.nextInt(5)}">secret</a>\n""")
      } else if (roll < 0.95) { // denied extension — must be filtered
        sb.append(s"""<a href="/files/archive${r.nextInt(9)}.zip">zip</a>\n""")
      } else { // nofollow — must be skipped
        val tgt = r.nextInt(nK)
        sb.append(s"""<a href="/p/$tgt" rel="nofollow">nf $tgt</a>\n""")
      }
    }
    if (spec.formPages) sb.append(formBlock(spec, k, j))
    sb.append("</body></html>\n")
    sb.toString
  }

  /** Form battery (contract step 7g, independent RNG stream — flag-off page
    * bodies stay byte-identical). Only the FIRST form on a page is submitted
    * (from_response default formnumber=0); a second decoy form on some pages
    * pins that. Action targets use the natural /p/N mix, so downstream some
    * POSTs hit 301 pages (method preserved) and some 302 (converted to GET,
    * `redirect.py:177-181`). */
  def formBlock(spec: CorpusSpec, k: Int, j: Int): String = {
    val fr = rng(spec, 8300000023L * (spec.pageGlobalIdx(k, j) + 1))
    val roll = fr.nextDouble()
    val nK = spec.pagesOnHost(k)
    // status-class roll of a prospective target — the first draw of the
    // page's own (pure) stream, so a form can deterministically target a
    // 302 page (POST→GET conversion) or a 301 (method preserved) without
    // generating the page
    def statusRoll(j2: Int): Double =
      rng(spec, 1000000007L * (k + 1) + j2).nextDouble()
    def statusRollAt(k2: Int, j2: Int): Double =
      rng(spec, 1000000007L * (k2 + 1) + j2).nextDouble()
    def is302(j2: Int): Boolean = {
      val sr = statusRoll(j2); sr < 0.07 && !(sr < 0.04 && j2 > 0)
    }
    // a 301 roll is only ~1% of pages — search the own host first, then walk
    // the host ring (absolute action URL) so every form host can find one
    def find301: Option[String] =
      (0 until math.min(spec.nHosts, 16)).iterator
        .map(d => (k + d) % spec.nHosts)
        .flatMap { k2 =>
          (0 until spec.pagesOnHost(k2)).find { j2 =>
            val sr = statusRollAt(k2, j2); sr >= 0.07 && sr < 0.08
          }.map(j2 =>
            if (k2 == k) s"/p/$j2"
            else s"${spec.scheme}://${spec.hostName(k2)}/p/$j2")
        }.nextOption()
    if (roll < 0.55 || nK < 2) "" // no form
    else if (roll < 0.75) { // POST form: inputs + hidden + checkbox + button
      // ~40% of POST forms pin the redirect-method contract: target a known
      // 302 page (redirected request converts to GET, `redirect.py:177`) or
      // a known 301 (method+body preserved); the rest draw uniformly
      val sub = fr.nextDouble()
      val drawn = fr.nextInt(nK)
      val action =
        if (sub < 0.2) s"/p/${(0 until nK).find(is302).getOrElse(drawn)}"
        else if (sub < 0.4) find301.getOrElse(s"/p/$drawn")
        else s"/p/$drawn"
      s"""<form action="$action" method="post"><input type="text" name="q" value="find $j"/><input type="hidden" name="tok" value="tk$k-$j"/><input type="checkbox" name="opt" checked/><input type="checkbox" name="off"/><button type="submit" name="go" value="1">Go</button></form>\n"""
    } else if (roll < 0.85) { // GET form whose query matches a real ?a=&b= page
      val base = fr.nextInt(math.max(1, nK / 10))
      val tgt = base * 10 // pageUrl gives /p/N?a=N%5&b=N%7 for N%10==0, N>0
      if (tgt == 0 || tgt >= nK) "" // no in-range query page — skip
      else
        s"""<form action="/p/$tgt"><input name="a" value="${tgt % 5}"/><input name="b" value="${tgt % 7}"/><input type="submit" value="go"/></form>\n"""
    } else if (roll < 0.92) { // select + textarea + a decoy SECOND form
      val tgt = fr.nextInt(nK)
      s"""<form method="POST" action="/p/$tgt"><select name="pick"><option value="o1">first</option><option value="o2" selected>second</option></select><textarea name="note">n$j</textarea><input type="submit" name="s" value="ok"/></form>\n<form action="/p/0" method="post"><input name="decoy" value="never"/></form>\n"""
    } else if (roll < 0.96 && spec.nHosts > 1) { // cross-host POST action
      val hk = fr.nextInt(spec.nHosts)
      val tgt = fr.nextInt(spec.pagesOnHost(hk))
      s"""<form action="${spec.scheme}://${spec.hostName(hk)}/p/$tgt" method="post"><input name="x" value="v$j"/><input type="submit" value="go"/></form>\n"""
    } else if (roll < 0.98) { // robots-blocked action: dropped at robots check
      s"""<form action="/private/${fr.nextInt(5)}" method="post"><input name="p" value="1"/><input type="submit" value="go"/></form>\n"""
    } else // action-less form: submits to the page's own URL (base)
      s"""<form method="post"><input name="self" value="s$j"/><input type="submit" value="go"/></form>\n"""
  }

  private def queryOf(j: Int): String =
    if (j % 10 == 0 && j > 0) s"?a=${j % 5}&b=${j % 7}" else ""

  /** /private/ pages exist (status 200, no image) so robots filtering is the
    * thing that blocks them, not 404s. 5 per host. */
  def privatePage(spec: CorpusSpec, k: Int, m: Int): PageRow =
    PageRow(privateUrl(spec, k, m), 200,
      null, "<html><body>secret</body></html>".getBytes, null, 10)

  def allPages(spec: CorpusSpec): Seq[PageRow] = {
    val normal = for {
      k <- 0 until spec.nHosts
      j <- 0 until spec.pagesOnHost(k)
    } yield page(spec, k, j)
    val priv = for {
      k <- 0 until spec.nHosts
      m <- 0 until 5
    } yield privatePage(spec, k, m)
    normal ++ priv
  }

  // ---- images -------------------------------------------------------------

  def caption(spec: CorpusSpec, gIdx: Int): String = {
    val words = Array("amber", "basalt", "cirrus", "dune", "ember", "fjord",
      "glade", "harbor", "isle", "juniper", "karst", "lagoon")
    val r = rng(spec, 2000000011L * (gIdx + 1))
    val n = 3 + r.nextInt(5)
    val salad = Seq.fill(n)(words(r.nextInt(words.length))).mkString(" ")
    s"caption of img$gIdx: $salad"
  }

  /** Procedural pixels: 2-D gradient + mild seeded noise. ~5% of images are
    * pixel-duplicates of an earlier image (same pixels, different id) to
    * exercise phash dedup. */
  def pixels(spec: CorpusSpec, gIdx: Int): ImageOps.Pixels = {
    val r0 = rng(spec, 3000000019L * (gIdx + 1))
    val dupOf = if (gIdx > 20 && r0.nextDouble() < 0.05) r0.nextInt(gIdx) else gIdx
    val r = rng(spec, 3000000019L * (dupOf + 1) + 1)
    val w = 16 + r.nextInt(spec.imageMaxDim - 15)
    val h = 16 + r.nextInt(spec.imageMaxDim - 15)
    val rgb = new Array[Int](w * h)
    val cr = r.nextInt(256); val cg = r.nextInt(256); val cb = r.nextInt(256)
    // low-frequency sinusoidal texture: unique per image, JPEG-stable (no
    // per-pixel noise → phash survives lossy round-trips)
    val waves = Array.fill(3)(
      (1 + r.nextInt(3), 1 + r.nextInt(3), r.nextDouble() * math.Pi * 2, 10 + r.nextInt(30)))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gx = (x * 255) / math.max(w - 1, 1)
        val gy = (y * 255) / math.max(h - 1, 1)
        var tex = 0.0
        for ((fx, fy, ph, amp) <- waves)
          tex += amp * math.sin(2 * math.Pi * (fx * x.toDouble / w + fy * y.toDouble / h) + ph)
        val t = tex.toInt
        def clamp(v: Int) = math.max(0, math.min(255, v))
        val rr = clamp((cr + gx) / 2 + t)
        val gg = clamp((cg + gy) / 2 + t)
        val bb = clamp((cb + (gx + gy) / 2) / 2 + t)
        rgb(y * w + x) = (rr << 16) | (gg << 8) | bb
        x += 1
      }
      y += 1
    }
    ImageOps.Pixels(w, h, rgb)
  }

  /** Full ImageRow (exact input_hint shape) — fmt alternates png/jpeg. */
  def image(spec: CorpusSpec, gIdx: Int): ImageRow = {
    val px = pixels(spec, gIdx)
    val fmt = if (gIdx % 2 == 0) "png" else "jpeg"
    val bytes = ImageOps.encode(px, fmt)
    ImageRow(f"img$gIdx%09d", bytes, px.w, px.h, fmt, caption(spec, gIdx),
      Phash.phash64(px))
  }

  // ---- robots -------------------------------------------------------------

  /** Per-host robots.txt; None = fetch error (allow-all per reference).
    * Mix per FIXTURES.md §3. */
  def robots(spec: CorpusSpec, k: Int): Option[Array[Byte]] = {
    val r = rng(spec, 4000000007L * (k + 1))
    val roll = r.nextDouble()
    if (roll < 0.05) None // fetch-error host
    else if (roll < 0.10) Some(Array[Byte](0xff.toByte, 0xfe.toByte, 0x80.toByte)) // garbage → allow all
    else if (roll < 0.20) Some(Array.emptyByteArray) // empty → allow all
    else if (roll < 0.25) Some("User-agent: *\nDisallow: /\n".getBytes) // deny all
    else {
      val sb = new StringBuilder
      sb.append("# synthetic robots\n")
      if (r.nextDouble() < 0.3) {
        sb.append("User-agent: otherbot\nDisallow: /\n\n")
      }
      sb.append("User-agent: *\n")
      sb.append("Disallow: /private/\n")
      if (r.nextDouble() < 0.5) sb.append("Allow: /private/0\n") // override
      if (r.nextDouble() < 0.3) sb.append(s"Disallow: /p/${r.nextInt(10)}$$\n") // anchored
      if (r.nextDouble() < 0.3) sb.append("Disallow: /*.zip$\n")
      Some(sb.toString.getBytes)
    }
  }

  def allRobots(spec: CorpusSpec): Map[String, Option[Array[Byte]]] =
    (0 until spec.nHosts).map(k => spec.hostName(k) -> robots(spec, k)).toMap

  // ---- dns ------------------------------------------------------------------

  /** Deterministic resolver result for host k; None = unresolvable (slot
    * falls back to the host, like `dnscache.get(host, host)`). ~30% of hosts
    * share a small CDN-like IP pool, so per-IP slots genuinely coalesce. */
  def dnsIp(spec: CorpusSpec, k: Int): Option[String] = {
    val r = rng(spec, 6000000011L * (k + 1))
    val roll = r.nextDouble()
    if (roll < 0.05) None // resolution failure
    else if (roll < 0.35) Some(s"10.0.0.${r.nextInt(math.max(2, spec.nHosts / 10))}")
    else Some(s"10.1.${k / 256}.${k % 256}")
  }

  def allDns(spec: CorpusSpec): Map[String, String] =
    (0 until spec.nHosts).flatMap(k => dnsIp(spec, k).map(spec.hostName(k) -> _)).toMap

  // ---- seeds --------------------------------------------------------------

  /** Ordered seed list: sample of pages (raw trap forms), with duplicates.
    * Priorities mostly 0, some ±2. Start requests are dont_filter=True
    * (contract step 0), so duplicate URLs here each fetch. */
  def seeds(spec: CorpusSpec): Seq[SeedRow] = {
    val r = rng(spec, 5000000029L)
    val base = (0L until spec.seedCount.toLong).map { s =>
      val k = if (r.nextDouble() < 0.3) 0 else r.nextInt(spec.nHosts)
      val j = r.nextInt(spec.pagesOnHost(k))
      val url =
        if (r.nextDouble() < 0.3) trapHref(spec, k, j, r.nextInt(4)) match {
          case rel if rel.startsWith("/") => s"${spec.scheme}://${spec.hostName(k)}$rel"
          case abs => abs
        }
        else pageUrl(spec, k, j)
      val prio = r.nextDouble() match {
        case d if d < 0.1 => 2
        case d if d < 0.2 => -2
        case _ => 0
      }
      // bypass seeds target robots-disallowed /private/ pages WITH the
      // dont_obey_robotstxt meta — only robots bypassing lets them fetch
      // (the extra draws only happen when the knob is on: flag-off specs
      // generate byte-identical seed lists)
      if (spec.bypassRobotsSeeds && r.nextDouble() < 0.25)
        SeedRow(s, privateUrl(spec, k, 1 + r.nextInt(4)), prio,
          dontObeyRobots = true)
      else {
        // cookiejar meta (independent per-seed stream — base draws above
        // are untouched, so flag-off seed lists stay byte-identical)
        val (jar, dmc) =
          if (!spec.cookieJarSeeds) ("", false)
          else {
            val cr = rng(spec, 8300000087L * (s + 1))
            val roll = cr.nextDouble()
            if (roll < 0.30) ("j" + ('A' + cr.nextInt(2)).toChar, false)
            else if (roll < 0.42) ("", true)
            else ("", false)
          }
        SeedRow(s, url, prio, cookieJar = jar, dontMergeCookies = dmc)
      }
    }
    val extras = localSeeds(spec) ++ metaSeeds(spec) ++ slotSeeds(spec) ++
      sizeSeeds(spec) ++ schemeSeeds(spec) ++ offsiteSeeds(spec)
    // explicit duplicate seeds (contract step 0: dont_filter start requests
    // — each copy fetches; appended last so flag-off lists and the extras'
    // seq bases stay byte-identical)
    val dups =
      if (!spec.dupSeeds) Nil
      else base.take(3).zipWithIndex.map { case (s, i) =>
        s.copy(seq = base.size.toLong + extras.size + i)
      }
    base ++ extras ++ dups
  }

  /** Meta-control seeds (contract step 7d; appended when
    * `metaControlSeeds`): deterministic scans of the pure page function
    * find redirect/retry/404 pages, then each meta key gets a seed whose
    * behavior it observably changes — dont_redirect'd 3xx (ignored vs
    * handled), dont_retry'd + max_retry_times'd 503s (0 = instant
    * max_reached, 4 = extra retries), a handled 404. Scans only run with
    * the knob on (never at bench scale). */
  def metaSeeds(spec: CorpusSpec): Seq[SeedRow] = {
    if (!spec.metaControlSeeds) return Nil
    def find(n: Int)(pred: PageRow => Boolean): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      var cnt = 0
      val it = (0 until spec.nHosts).iterator.flatMap(k =>
        (0 until spec.pagesOnHost(k)).iterator.map(j => (k, j)))
      while (cnt < n && it.hasNext) {
        val (k, j) = it.next()
        if (pred(page(spec, k, j))) { out += ((k, j)); cnt += 1 }
      }
      out.result()
    }
    val redirects = find(3)(p => p.status == 301 || p.status == 302)
    val retryables = find(5)(_.status == 503)
    val notFound = find(2)(_.status == 404)
    def u(kj: (Int, Int)) = pageUrl(spec, kj._1, kj._2)
    val metas: Seq[SeedRow] =
      redirects.zipWithIndex.map {
        case (kj, 0) => SeedRow(0, u(kj), 0, dontRedirect = true)
        case (kj, 1) => SeedRow(0, u(kj), 0, dontRedirect = true,
          handleHttpstatus = "301,302")
        case (kj, _) => SeedRow(0, u(kj), 0, dontRedirect = true,
          handleHttpstatus = "all")
      } ++ retryables.zipWithIndex.map {
        case (kj, 0) => SeedRow(0, u(kj), 0, dontRetry = true)
        case (kj, 1) => SeedRow(0, u(kj), 0, maxRetryTimes = 0)
        case (kj, 2) => SeedRow(0, u(kj), 0, maxRetryTimes = 4)
        // dont_cache vs control: under httpcacheEnabled the control's
        // retries hit the stored 503 while the dont_cache seed's retries
        // re-download every time (cached flag diverges in the byte compare)
        case (kj, 3) => SeedRow(0, u(kj), 0, dontCache = true)
        case (kj, _) => SeedRow(0, u(kj), 0)
      } ++ notFound.zipWithIndex.map {
        case (kj, 0) => SeedRow(0, u(kj), 0, handleHttpstatus = "404")
        case (kj, _) => SeedRow(0, u(kj), 0)
      }
    val base = spec.seedCount.toLong + localSeeds(spec).size
    metas.zipWithIndex.map { case (s, i) => s.copy(seq = base + i) }
  }

  /** download_slot meta seeds (`slotMetaSeeds`, contract step 7f): seeds on
    * THREE distinct hosts pooled under one explicit `meta["download_slot"]`
    * (their fetches must serialize on the pool slot's single virtual-time
    * sequence) plus plain seeds targeting the planted cross-host 302 pages
    * (the redirected request inherits the written-back slot — charged to
    * the ORIGINAL host, reference `_enqueue_request` meta write-back). */
  def slotSeeds(spec: CorpusSpec): Seq[SeedRow] = {
    if (!spec.slotMetaSeeds) return Nil
    def find(n: Int)(pred: PageRow => Boolean): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      var cnt = 0
      val it = (0 until spec.nHosts).iterator.flatMap(k =>
        (0 until spec.pagesOnHost(k)).iterator.map(j => (k, j)))
      while (cnt < n && it.hasNext) {
        val (k, j) = it.next()
        if (pred(page(spec, k, j))) { out += ((k, j)); cnt += 1 }
      }
      out.result()
    }
    val pooled = (1 to 3).map(k =>
      SeedRow(0, pageUrl(spec, k % spec.nHosts, 0), 0,
        downloadSlot = "pool-a"))
    val crossRedirects = find(2)(p => p.status == 302 &&
      p.location != null && p.location.contains("://"))
      .map { case (k, j) => SeedRow(0, pageUrl(spec, k, j), 0) }
    val metas = pooled ++ crossRedirects
    val base = spec.seedCount.toLong + localSeeds(spec).size +
      metaSeeds(spec).size
    metas.zipWithIndex.map { case (s, i) => s.copy(seq = base + i) }
  }

  /** download_maxsize meta seeds (`sizeMetaSeeds`, contract step 6g; the
    * paired crawl config sets downloadMaxSize = 300): per-request overrides
    * of the size limit in each direction — a 1 GiB override and a 0
    * (= unlimited) override on pages whose raw body exceeds 300 B (fetched
    * fine despite the setting), and a 64 B override on a page under 300 B
    * (cancelled despite the setting). A third oversize page is seeded with
    * NO override so the setting's own cancel fires deterministically even
    * if the organic walk reaches no oversize page. The corpus pages
    * themselves are untouched — flag-off specs stay byte-identical. */
  def sizeSeeds(spec: CorpusSpec): Seq[SeedRow] = {
    if (!spec.sizeMetaSeeds) return Nil
    def find(n: Int)(pred: PageRow => Boolean): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      var cnt = 0
      val it = (0 until spec.nHosts).iterator.flatMap(k =>
        (0 until spec.pagesOnHost(k)).iterator.map(j => (k, j)))
      while (cnt < n && it.hasNext) {
        val (k, j) = it.next()
        if (pred(page(spec, k, j))) { out += ((k, j)); cnt += 1 }
      }
      out.result()
    }
    val big = find(3)(p => p.status == 200 && p.body != null &&
      p.body.length > 300)
    val small = find(1)(p => p.status == 200 && p.body != null &&
      p.body.length > 64 && p.body.length <= 300)
    val metas =
      big.zip(Seq(1073741824L, 0L, -1L)).map { case ((k, j), mx) =>
        SeedRow(0, pageUrl(spec, k, j), 0, downloadMaxSize = mx) } ++
      small.map { case (k, j) =>
        SeedRow(0, pageUrl(spec, k, j), 0, downloadMaxSize = 64L) }
    val base = spec.seedCount.toLong + localSeeds(spec).size +
      metaSeeds(spec).size + slotSeeds(spec).size
    metas.zipWithIndex.map { case (s, i) => s.copy(seq = base + i) }
  }

  /** Seeds targeting the three planted Location-resolution trap pages
    * (`schemeTrapPages`): a crawl must observably resolve the ///-relative
    * and //-relative 302s to the OTHER host and pass the data:-Location
    * 301 through to the HttpError drop. */
  def schemeSeeds(spec: CorpusSpec): Seq[SeedRow] = {
    if (!spec.schemeTrapPages) return Nil
    val base = spec.seedCount.toLong + localSeeds(spec).size +
      metaSeeds(spec).size + slotSeeds(spec).size + sizeSeeds(spec).size
    (1 to 3).map(k => SeedRow(base + k - 1, pageUrl(spec, k, 1), 0))
  }

  /** Offsite-trap seed (contract 7h; appended when `offsiteTrapPages`):
    * lands directly on the third trap page — a start request is
    * dont_filter=True and its redirect inherits the flag (request.replace),
    * so THIS redirect to an off-domain host bypasses the offsite check and
    * fetches, while the same page's organic rediscovery is filtered. */
  def offsiteSeeds(spec: CorpusSpec): Seq[SeedRow] = {
    if (!spec.offsiteTrapPages) return Nil
    val base = spec.seedCount.toLong + localSeeds(spec).size +
      metaSeeds(spec).size + slotSeeds(spec).size + sizeSeeds(spec).size +
      schemeSeeds(spec).size
    Seq(SeedRow(base, pageUrl(spec, 3, 2), 0))
  }

  /** data:/file: seeds appended when `localSeedsDir` is set (contract 6e):
    * the reference handler's golden data-URI shapes (`tests/
    * test_downloader_handlers.py:309-361`) — HTML with links, plain text,
    * base64, an invalid URI (ValueError, unretried) — plus file: URLs for an
    * HTML file with links, a non-HTML file, and a missing file
    * (FileNotFoundError, retried). */
  def localSeeds(spec: CorpusSpec): Seq[SeedRow] = {
    if (spec.localSeedsDir == null) return Nil
    val dir = spec.localSeedsDir
    val h1 = spec.hostName(1 % spec.nHosts)
    val h2 = spec.hostName(2 % spec.nHosts)
    val urls = Seq(
      s"""data:text/html,<html><body><a href="${spec.scheme}://$h1/p/1">one</a> """ +
        s"""<a href="${spec.scheme}://$h2/p/0">two</a> """ +
        s"""<a rel="nofollow" href="${spec.scheme}://$h1/p/2">nf</a></body></html>""",
      "data:,A%20brief%20note",
      "data:text/plain;base64,SGVsbG8sIHdvcmxkLg%3D%3D",
      "data:text/plain;base65,broken", // invalid marker → ValueError
      s"file://$dir/local.html",
      s"file://$dir/note.txt",
      s"file://$dir/missing.html", // → FileNotFoundError, retried
      s"file://$dir/subdir") // a directory → IsADirectoryError, retried
    urls.zipWithIndex.map { case (u, i) =>
      SeedRow(spec.seedCount.toLong + i, u, 0)
    }
  }

  /** Materialize the files the `localSeedsDir` file: seeds point at (the
    * conformance test's stand-in for a shared filesystem): an HTML page
    * linking back into the corpus, a relative file: link, a non-HTML file.
    * `missing.html` is deliberately not written. */
  def writeLocalFiles(spec: CorpusSpec, dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val h1 = spec.hostName(1 % spec.nHosts)
    val html =
      s"""<html><body><a href="${spec.scheme}://$h1/p/3">corpus</a>
         |<a href="note.txt">relative file link</a>
         |<a href="${spec.scheme}://$h1/p/4?b=1&a=2">query</a></body></html>
         |""".stripMargin
    java.nio.file.Files.write(d.resolve("local.html"),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(d.resolve("note.txt"),
      "just text, no links".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.createDirectories(d.resolve("subdir"))
  }

  // ---- canned specs -------------------------------------------------------

  val Tiny: CorpusSpec = CorpusSpec(nHosts = 1, totalPages = 20, seedCount = 3)
  val Small: CorpusSpec = CorpusSpec(nHosts = 50, totalPages = 2000, seedCount = 20)
  def bench(totalPages: Int = 200000): CorpusSpec =
    CorpusSpec(nHosts = math.max(1000, totalPages / 100), totalPages = totalPages,
      hotHostShare = 0.1, seedCount = math.max(500, totalPages / 100),
      imageMaxDim = 192) // bigger images: decode/phash CPU dominates like prod
}
