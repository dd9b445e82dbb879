package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
    * original request rows. `requests` must carry `fpHex`. */
  def splitByCache(requests: DataFrame, cache: DataFrame): (DataFrame, DataFrame) = {
    val hits = requests.join(
      cache.select(col("fpHex"),
        col("status").as("cached_status"), col("body").as("cached_body")),
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
}
