package graft.operators

/** RFC2616 cache policy — reference `scrapy/extensions/httpcache.py:59-245`
  * (RFC2616Policy), re-expressed as pure functions over (status, headers,
  * virtual now) so the batch cache operator ([[FetchCache]]) can apply them
  * columnar-ly. Time is always the caller's virtual clock — never the wall
  * clock (determinism invariant).
  */
object Rfc2616Policy {

  val MaxAge: Long = 3600L * 24 * 365 // one-year Firefox fallback

  /** `scrapy/utils/httpobj`-side parse_cachecontrol: directive map,
    * value-less directives map to None. */
  def parseCacheControl(header: String): Map[String, Option[String]] = {
    if (header == null || header.isEmpty) return Map.empty
    header.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { d =>
      d.split("=", 2) match {
        case Array(k) => k.toLowerCase(java.util.Locale.ROOT) -> None
        case Array(k, v) => k.toLowerCase(java.util.Locale.ROOT) -> Some(v.trim)
      }
    }.toMap
  }

  /** RFC 1123 date → epoch seconds; None on parse failure (reference
    * rfc1123_to_epoch). */
  def rfc1123ToEpoch(s: String): Option[Long] = {
    if (s == null || s.isEmpty) return None
    try Some(java.time.OffsetDateTime
      .parse(s, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
      .toEpochSecond)
    catch { case _: java.time.format.DateTimeParseException => None }
  }

  private def maxAgeOf(cc: Map[String, Option[String]]): Option[Long] =
    cc.get("max-age").flatten.flatMap(_.toLongOption).map(v => math.max(0L, v))

  /** `httpcache.py:84-89` should_cache_request: obey request no-store. */
  def shouldCacheRequest(requestCacheControl: String): Boolean =
    !parseCacheControl(requestCacheControl).contains("no-store")

  /** `httpcache.py:91-117` should_cache_response. */
  def shouldCacheResponse(status: Int, headers: Map[String, String],
      alwaysStore: Boolean = false): Boolean = {
    val cc = parseCacheControl(headers.getOrElse("Cache-Control", ""))
    if (cc.contains("no-store")) false
    else if (status == 304) false
    else if (alwaysStore) true
    else if (cc.contains("max-age") || headers.contains("Expires")) true
    else if (Set(300, 301, 308).contains(status)) true
    else if (Set(200, 203, 401).contains(status))
      headers.contains("Last-Modified") || headers.contains("ETag")
    else false
  }

  /** `httpcache.py:188-216` _compute_freshness_lifetime (Firefox model). */
  def freshnessLifetime(status: Int, headers: Map[String, String], nowSec: Long): Double = {
    val cc = parseCacheControl(headers.getOrElse("Cache-Control", ""))
    maxAgeOf(cc) match {
      case Some(ma) => ma.toDouble
      case None =>
        val date = headers.get("Date").flatMap(rfc1123ToEpoch).getOrElse(nowSec).toDouble
        if (headers.contains("Expires")) {
          // unparseable Expires = already expired (RFC 2616 §14.21)
          headers.get("Expires").flatMap(rfc1123ToEpoch)
            .map(e => math.max(0.0, e - date)).getOrElse(0.0)
        } else {
          val lastModified = headers.get("Last-Modified").flatMap(rfc1123ToEpoch)
          lastModified match {
            case Some(lm) if lm <= date => (date - lm) / 10.0 // heuristic
            case _ =>
              if (Set(300, 301, 308).contains(status)) MaxAge.toDouble
              else 0.0
          }
        }
    }
  }

  /** `httpcache.py:218-235` _compute_current_age. */
  def currentAge(headers: Map[String, String], nowSec: Long): Double = {
    val date = headers.get("Date").flatMap(rfc1123ToEpoch).getOrElse(nowSec)
    var age = if (nowSec > date) (nowSec - date).toDouble else 0.0
    for (a <- headers.get("Age").flatMap(_.toLongOption)) age = math.max(age, a.toDouble)
    age
  }

  /** `httpcache.py:119-160` is_cached_response_fresh. */
  def isFresh(cachedStatus: Int, cachedHeaders: Map[String, String],
      requestCacheControl: String, nowSec: Long): Boolean = {
    val cc = parseCacheControl(cachedHeaders.getOrElse("Cache-Control", ""))
    val ccReq = parseCacheControl(requestCacheControl)
    if (cc.contains("no-cache") || ccReq.contains("no-cache")) return false

    var lifetime = freshnessLifetime(cachedStatus, cachedHeaders, nowSec)
    val age = currentAge(cachedHeaders, nowSec)
    for (reqMax <- maxAgeOf(ccReq)) lifetime = math.min(lifetime, reqMax.toDouble)
    if (age < lifetime) return true

    if (ccReq.contains("max-stale") && !cc.contains("must-revalidate")) {
      ccReq("max-stale") match {
        case None => true // stale of any age accepted
        case Some(v) => v.toLongOption.exists(s => age < lifetime + math.max(0L, s))
      }
    } else false
  }

  /** In-chain freshness (contract 6f): is an entry stored at virtual
    * `storedTMs` still fresh at virtual `nowMs`? Lifetime from the stored
    * response's Cache-Control (max-age; 300/301/308 one-year fallback; else
    * 0 — the corpus carries no Date/Expires/validators), age = the virtual
    * time elapsed since the store, `no-cache` never fresh. */
  def freshAt(cachedStatus: Int, cacheControl: String, storedTMs: Long,
      nowMs: Long): Boolean = {
    val cc = parseCacheControl(cacheControl)
    if (cc.contains("no-cache")) return false
    val headers =
      if (cacheControl == null || cacheControl.isEmpty) Map.empty[String, String]
      else Map("Cache-Control" -> cacheControl)
    val lifetime = freshnessLifetime(cachedStatus, headers, nowSec = storedTMs / 1000)
    val ageSec = math.max(0L, nowMs - storedTMs) / 1000.0
    ageSec < lifetime
  }

  /** In-chain storability (contract 6f): should_cache_response over the
    * Cache-Control header alone. */
  def storable(status: Int, cacheControl: String): Boolean =
    shouldCacheResponse(status,
      if (cacheControl == null || cacheControl.isEmpty) Map.empty
      else Map("Cache-Control" -> cacheControl))

  /** `httpcache.py:162-173` is_cached_response_valid: after a revalidation
    * fetch, serve the cached copy on 304, or on a 5xx unless the cached
    * response demanded must-revalidate. */
  def isCachedResponseValid(cachedHeaders: Map[String, String], newStatus: Int): Boolean = {
    if (newStatus >= 500 &&
        !parseCacheControl(cachedHeaders.getOrElse("Cache-Control", ""))
          .contains("must-revalidate")) true
    else newStatus == 304
  }

  /** `httpcache.py:175-184` conditional validators a stale entry attaches to
    * its revalidation request. */
  def validators(cachedHeaders: Map[String, String]): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    for (lm <- cachedHeaders.get("Last-Modified")) b += ("If-Modified-Since" -> lm)
    for (et <- cachedHeaders.get("ETag")) b += ("If-None-Match" -> et)
    b.result()
  }
}
