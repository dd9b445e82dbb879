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
}
