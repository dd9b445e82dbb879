package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Fingerprint-keyed fetch cache (reference HttpCacheMiddleware with the
  * Dummy policy — cache everything, serve hits without a fetch:
  * `scrapy/extensions/httpcache.py:35-57`, middleware
  * `scrapy/downloadermiddlewares/httpcache.py:24-144`).
  *
  * Batch shape: a `fetch_cache` parquet table keyed by `fpHex`; before a
  * fetch batch goes to the network (or corpus), split it by a LEFT join on
  * the cache — hits carry the stored response, misses fetch and append.
  * Kept OUTSIDE the conformance epoch (a cache hit skips the politeness
  * slot, which changes virtual-time semantics vs the oracle's contract;
  * production crawls opt in).
  */
object FetchCache {

  /** (hits, misses): hits carry cached `status`/`body`; misses are the
    * original request rows. `requests` must carry `fpHex`. The cache side is
    * deduped defensively: append's read-then-write dedup is not atomic
    * across crash/retry or concurrent callers, and a duplicated fpHex would
    * otherwise multiply hits. */
  def splitByCache(requests: DataFrame, cache: DataFrame): (DataFrame, DataFrame) = {
    val hits = requests.join(
      cache.select(col("fpHex"),
        col("status").as("cached_status"), col("body").as("cached_body"))
        .dropDuplicates("fpHex"),
      Seq("fpHex"), "inner")
    val misses = requests.join(cache.select("fpHex"), Seq("fpHex"), "left_anti")
    (hits, misses)
  }

  /** Append newly fetched responses (fpHex, status, body, fetchedAtMs) to
    * the cache dir; first-writer-wins dedup against the existing cache. */
  def append(spark: SparkSession, cacheDir: String, fetched: DataFrame): Unit = {
    val existing =
      if (new java.io.File(cacheDir).exists())
        spark.read.parquet(cacheDir).select("fpHex")
      else spark.emptyDataFrame.withColumn("fpHex", lit(""))
    fetched
      .select("fpHex", "status", "body", "fetchedAtMs")
      .dropDuplicates("fpHex")
      .join(existing, Seq("fpHex"), "left_anti")
      .write.mode(SaveMode.Append).parquet(cacheDir)
  }

  /** RFC2616-lite freshness: drop entries older than `maxAgeMs` (the
    * FILES_EXPIRES analogue, `scrapy/pipelines/files.py:539-587`). */
  def expire(spark: SparkSession, cacheDir: String, nowMs: Long, maxAgeMs: Long): DataFrame =
    spark.read.parquet(cacheDir).filter(col("fetchedAtMs") >= nowMs - maxAgeMs)

  // ---- RFC2616 policy (graft.operators.Rfc2616Policy) ----------------------

  /** A cached response with its headers (RFC2616 storage row). */
  final case class Entry(fpHex: String, status: Int, body: Array[Byte],
      headers: Map[String, String])

  /** A request about to be fetched; `cacheControl` is its Cache-Control
    * header ("" = none). */
  final case class Req(fpHex: String, url: String, cacheControl: String)

  /** A revalidation request: the original plus the conditional validators
    * (If-Modified-Since / If-None-Match) and the stale entry to fall back
    * to on 304/5xx (`is_cached_response_valid`). */
  final case class Revalidate(fpHex: String, url: String,
      validators: Map[String, String], cached: Entry)

  /** The three RFC2616 split legs plus the cache-release handle: call
    * `unpersist()` once the legs have been consumed (mirrors
    * CrawlEngine.EpochResult.cleanup — without it every invocation leaks one
    * cached join until LRU eviction). */
  final case class Rfc2616Split(
      fresh: Dataset[(Req, Entry)],
      revalidate: Dataset[Revalidate],
      misses: Dataset[Req],
      unpersist: () => Unit)

  /** Split a fetch batch against an RFC2616 cache at virtual time `nowSec`:
    * (freshHits — served from cache, no fetch), (stale entries to
    * revalidate with conditional headers), (true misses). One equi-join on
    * the fingerprint; the policy evaluates per-row on executors. */
  def splitRfc2616(spark: SparkSession, requests: Dataset[Req],
      cache: Dataset[Entry], nowSec: Long): Rfc2616Split = {
    import spark.implicits._
    val joined = requests
      .joinWith(cache, requests("fpHex") === cache("fpHex"), "left_outer")
      .persist()
    val misses = joined.filter(_._2 == null).map(_._1)
    val hitsAll = joined.filter(_._2 != null)
    val fresh = hitsAll.filter { case (r, e) =>
      Rfc2616Policy.isFresh(e.status, e.headers, r.cacheControl, nowSec)
    }
    val revalidate = hitsAll.filter { case (r, e) =>
      !Rfc2616Policy.isFresh(e.status, e.headers, r.cacheControl, nowSec)
    }.map { case (r, e) =>
      Revalidate(r.fpHex, r.url, Rfc2616Policy.validators(e.headers), e)
    }
    Rfc2616Split(fresh, revalidate, misses, () => { joined.unpersist(); () })
  }

  /** Resolve revalidation fetches (`is_cached_response_valid`): on 304 — or
    * a 5xx the cached copy didn't forbid — serve the cached entry; else the
    * new response wins. Input pairs (revalidation row, new response). */
  def resolveRevalidated(spark: SparkSession,
      fetched: Dataset[(Revalidate, Entry)]): Dataset[Entry] = {
    import spark.implicits._
    fetched.map { case (rv, fresh) =>
      if (Rfc2616Policy.isCachedResponseValid(rv.cached.headers, fresh.status))
        rv.cached
      else fresh
    }
  }

  /** Responses eligible for storage under the policy
    * (`should_cache_response`; `alwaysStore` = HTTPCACHE_ALWAYS_STORE). */
  def storable(spark: SparkSession, responses: Dataset[Entry],
      alwaysStore: Boolean = false): Dataset[Entry] = {
    import spark.implicits._
    responses.filter(e => Rfc2616Policy.shouldCacheResponse(e.status, e.headers, alwaysStore))
  }
}
