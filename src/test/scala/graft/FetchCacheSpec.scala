package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FetchCache

class FetchCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("split, append, dedup and expiry round-trip") {
    import spark.implicits._
    val cacheDir = TestSpark.tempDir("fetch-cache") + "/cache"

    val batch1 = Seq(
      ("aa", 200, "bodyA".getBytes, 1000L),
      ("bb", 200, "bodyB".getBytes, 1000L)).toDF("fpHex", "status", "body", "fetchedAtMs")
    FetchCache.append(spark, cacheDir, batch1)

    // second batch: one dup (ignored, first-writer-wins), one new
    val batch2 = Seq(
      ("bb", 500, "changed".getBytes, 2000L),
      ("cc", 200, "bodyC".getBytes, 2000L)).toDF("fpHex", "status", "body", "fetchedAtMs")
    FetchCache.append(spark, cacheDir, batch2)

    val cache = spark.read.parquet(cacheDir)
    assert(cache.count() === 3)
    assert(cache.filter($"fpHex" === "bb").select("status").as[Int].head() === 200)

    val requests = Seq("aa", "cc", "dd", "ee").toDF("fpHex")
      .withColumn("url", concat(lit("http://h.test/"), $"fpHex"))
    val (hits, misses) = FetchCache.splitByCache(requests, cache)
    assert(hits.select("fpHex").as[String].collect().toSet === Set("aa", "cc"))
    assert(misses.select("fpHex").as[String].collect().toSet === Set("dd", "ee"))
    // hits carry the stored response
    assert(new String(hits.filter($"fpHex" === "aa")
      .select("cached_body").as[Array[Byte]].head()) === "bodyA")

    // expiry drops the old entries
    val fresh = FetchCache.expire(spark, cacheDir, nowMs = 2500L, maxAgeMs = 1000L)
    assert(fresh.select("fpHex").as[String].collect().toSet === Set("cc"))
  }

  // ---- RFC2616 policy (scenarios mirror the reference's
  // tests/test_downloadermiddleware_httpcache.py TestRFC2616Policy) --------
  import graft.operators.Rfc2616Policy._

  test("rfc2616 should_cache_response decision table") {
    // no-store never cached; 304 never cached
    assert(!shouldCacheResponse(200, Map("Cache-Control" -> "no-store, max-age=3600")))
    assert(!shouldCacheResponse(304, Map("Cache-Control" -> "max-age=3600")))
    // expiration hints cache anything
    assert(shouldCacheResponse(200, Map("Cache-Control" -> "max-age=3600")))
    assert(shouldCacheResponse(404, Map("Expires" -> "Wed, 21 Oct 2015 07:28:00 GMT")))
    // Firefox one-year fallback statuses
    assert(shouldCacheResponse(301, Map.empty))
    assert(shouldCacheResponse(308, Map.empty))
    assert(shouldCacheResponse(300, Map.empty))
    // 200/203/401 need at least one validator
    assert(!shouldCacheResponse(200, Map.empty))
    assert(shouldCacheResponse(200, Map("Last-Modified" -> "Wed, 21 Oct 2015 07:28:00 GMT")))
    assert(shouldCacheResponse(401, Map("ETag" -> "\"v1\"")))
    // anything else: only with always_store
    assert(!shouldCacheResponse(404, Map.empty))
    assert(shouldCacheResponse(404, Map.empty, alwaysStore = true))
    assert(!shouldCacheResponse(304, Map.empty, alwaysStore = true)) // 304 wins over always_store
  }

  test("rfc2616 freshness: max-age, Expires, heuristic, one-year fallback") {
    val now = 1_000_000L
    def date(epoch: Long): String = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .format(java.time.Instant.ofEpochSecond(epoch).atOffset(java.time.ZoneOffset.UTC))
    // max-age: fresh until age exceeds it
    val maxAge = Map("Cache-Control" -> "max-age=100", "Date" -> date(now))
    assert(isFresh(200, maxAge, "", now + 99))
    assert(!isFresh(200, maxAge, "", now + 100))
    // Expires header
    val expires = Map("Date" -> date(now), "Expires" -> date(now + 50))
    assert(isFresh(200, expires, "", now + 49))
    assert(!isFresh(200, expires, "", now + 51))
    // unparseable Expires = expired (RFC 2616 §14.21)
    assert(!isFresh(200, Map("Date" -> date(now), "Expires" -> "garbage"), "", now))
    // heuristic: (date - last-modified)/10
    val heur = Map("Date" -> date(now), "Last-Modified" -> date(now - 1000))
    assert(isFresh(200, heur, "", now + 99))
    assert(!isFresh(200, heur, "", now + 101))
    // 301 with no headers: one-year fallback
    assert(isFresh(301, Map("Date" -> date(now)), "", now + 3600 * 24 * 300))
    assert(!isFresh(301, Map("Date" -> date(now)), "", now + MaxAge + 10))
    // Age header raises current age
    assert(!isFresh(200, maxAge + ("Age" -> "150"), "", now))
  }

  test("rfc2616 no-cache, request max-age and max-stale directives") {
    val now = 2_000_000L
    def date(epoch: Long): String = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .format(java.time.Instant.ofEpochSecond(epoch).atOffset(java.time.ZoneOffset.UTC))
    val entry = Map("Cache-Control" -> "max-age=100", "Date" -> date(now))
    // response or request no-cache forces revalidation
    assert(!isFresh(200, entry + ("Cache-Control" -> "max-age=100, no-cache"), "", now + 1))
    assert(!isFresh(200, entry, "no-cache", now + 1))
    // request max-age tightens the lifetime
    assert(!isFresh(200, entry, "max-age=10", now + 11))
    assert(isFresh(200, entry, "max-age=10", now + 9))
    // max-stale (valueless) accepts any stale; bounded max-stale is a window
    assert(isFresh(200, entry, "max-stale", now + 5000))
    assert(isFresh(200, entry, "max-stale=50", now + 149))
    assert(!isFresh(200, entry, "max-stale=50", now + 151))
    // must-revalidate in the cached response defeats max-stale
    assert(!isFresh(200, entry + ("Cache-Control" -> "max-age=100, must-revalidate"),
      "max-stale", now + 101))
  }

  test("rfc2616 revalidation: validators, 304/5xx resolution") {
    import spark.implicits._
    val lm = "Wed, 21 Oct 2015 07:28:00 GMT"
    assert(validators(Map("Last-Modified" -> lm, "ETag" -> "\"v1\"")) ===
      Map("If-Modified-Since" -> lm, "If-None-Match" -> "\"v1\""))
    assert(isCachedResponseValid(Map.empty, 304))
    assert(isCachedResponseValid(Map.empty, 503)) // 5xx → serve stale copy
    assert(!isCachedResponseValid(Map("Cache-Control" -> "must-revalidate"), 503))
    assert(!isCachedResponseValid(Map.empty, 200)) // changed content wins

    // end-to-end split at virtual now: fresh hit / revalidate / miss
    val now = 3_000_000L
    def date(epoch: Long): String = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .format(java.time.Instant.ofEpochSecond(epoch).atOffset(java.time.ZoneOffset.UTC))
    val cache = Seq(
      FetchCache.Entry("aa", 200, "A".getBytes,
        Map("Cache-Control" -> "max-age=1000", "Date" -> date(now - 10))),
      FetchCache.Entry("bb", 200, "B".getBytes,
        Map("Cache-Control" -> "max-age=5", "Date" -> date(now - 100),
          "ETag" -> "\"b7\""))).toDS()
    val reqs = Seq(
      FetchCache.Req("aa", "http://h.test/a", ""),
      FetchCache.Req("bb", "http://h.test/b", ""),
      FetchCache.Req("cc", "http://h.test/c", "")).toDS()
    val split = FetchCache.splitRfc2616(spark, reqs, cache, now)
    assert(split.fresh.collect().map(_._1.fpHex).toSet === Set("aa"))
    val rv = split.revalidate.collect()
    assert(rv.map(_.fpHex).toSet === Set("bb"))
    assert(rv.head.validators === Map("If-None-Match" -> "\"b7\""))
    assert(split.misses.collect().map(_.fpHex).toSet === Set("cc"))
    split.unpersist() // release the split's cached join (no leaked cache)

    // revalidation fetch comes back 304 → cached body served; 200 → replaced
    val resolved = FetchCache.resolveRevalidated(spark, Seq(
      (rv.head, FetchCache.Entry("bb", 304, Array.emptyByteArray, Map.empty))).toDS())
      .collect()
    assert(new String(resolved.head.body) === "B")
    val replaced = FetchCache.resolveRevalidated(spark, Seq(
      (rv.head, FetchCache.Entry("bb", 200, "B2".getBytes, Map.empty))).toDS())
      .collect()
    assert(new String(replaced.head.body) === "B2")
  }
}
