package graft.operators

/** Reference log-line formats (`scrapy/logformatter.py`) — the strings a
  * Scrapy operator greps for in crawl logs, reproduced byte-for-byte so a
  * graft crawl log is drop-in familiar:
  *
  *   - `crawled` — "Crawled (%(status)s) %(request)s%(request_flags)s
  *     (referer: %(referer)s)%(response_flags)s" (`logformatter.py:30`)
  *   - `scraped` — "Scraped from %(src)s\n%(item)s"
  *   - `dropped` — "Dropped: %(exception)s\n%(item)s"
  *   - `itemError` / `spiderError` / `downloadError` (short + long)
  *
  * Request/Response reprs are the reference `__repr__`s (`<GET url>` /
  * `<200 url>`); flag lists render as the CPython `str(list)` — single
  * quotes via [[PyRepr.strRepr]], so `['cached']` matches exactly. A null
  * referer renders as `None` (the `%s` of Python None).
  *
  * Pure per-row functions: `CrawlMain export <snap> fetch_log <out>
  * crawllog` maps the fetch log through [[crawled]]/[[downloadError]]
  * distributively.
  */
object LogFormat {

  /** `Request.__repr__` (`http/request/__init__.py`): `<METHOD url>`. */
  def requestRepr(method: String, url: String): String = s"<$method $url>"

  /** `Response.__repr__` (`http/response/__init__.py`): `<STATUS url>`. */
  def responseRepr(status: Int, url: String): String = s"<$status $url>"

  /** CPython `str(list_of_str)` — the flags rendering in CRAWLEDMSG. */
  def flagsRepr(flags: Seq[String]): String =
    flags.map(PyRepr.strRepr).mkString("[", ", ", "]")

  private def refererStr(referer: String): String =
    if (referer == null) "None" else referer

  /** `LogFormatter.crawled` rendered: the DEBUG line per fetched response.
    * `cached` responses carry the reference's `['cached']` response flag
    * (`core/downloader/middleware.py` sets it on cache hits). */
  def crawled(status: Int, method: String, url: String, referer: String,
      requestFlags: Seq[String] = Nil, responseFlags: Seq[String] = Nil): String = {
    val rf = if (requestFlags.isEmpty) "" else " " + flagsRepr(requestFlags)
    val pf = if (responseFlags.isEmpty) "" else " " + flagsRepr(responseFlags)
    s"Crawled ($status) ${requestRepr(method, url)}$rf " +
      s"(referer: ${refererStr(referer)})$pf"
  }

  /** `LogFormatter.scraped`: "Scraped from <status url>" + item on the
    * next line (os.linesep — the export runs on POSIX, "\n"). */
  def scraped(itemRepr: String, status: Int, url: String): String =
    s"Scraped from ${responseRepr(status, url)}\n$itemRepr"

  /** `LogFormatter.dropped`: WARNING on a DropItem from the pipeline. */
  def dropped(exceptionMsg: String, itemRepr: String): String =
    s"Dropped: $exceptionMsg\n$itemRepr"

  /** `LogFormatter.item_error`: ERROR while the item passes the pipeline. */
  def itemError(itemRepr: String): String = s"Error processing $itemRepr"

  /** `LogFormatter.spider_error`: ERROR from a spider callback. */
  def spiderError(method: String, url: String, referer: String): String =
    s"Spider error processing ${requestRepr(method, url)} " +
      s"(referer: ${refererStr(referer)})"

  /** `LogFormatter.download_error`: short without `errmsg`, long with. */
  def downloadError(method: String, url: String, errmsg: String = null): String =
    if (errmsg == null) s"Error downloading ${requestRepr(method, url)}"
    else s"Error downloading ${requestRepr(method, url)}: $errmsg"

  /** One fetch-log row → its reference log line: 599 rows are download
    * exceptions (no response object — the engine's download_error path),
    * everything else a `crawled` line; cache hits carry `['cached']`. */
  def fetchLogLine(status: Int, method: String, url: String, referer: String,
      cached: Boolean): String =
    if (status == 599) downloadError(method, url)
    else crawled(status, method, url, referer,
      responseFlags = if (cached) Seq("cached") else Nil)
}
