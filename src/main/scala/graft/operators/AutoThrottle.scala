package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** AutoThrottle: adaptive per-host download delay
  * (`scrapy/extensions/throttle.py:104-129`, defaults
  * `default_settings.py:200-204`):
  *
  *   target = latency / targetConcurrency
  *   newDelay = clamp((oldDelay + target) / 2, minDelay, maxDelay)
  *   and never decreases on a non-2xx response.
  *
  * In the epoch model this is a per-host aggregation across the epoch's
  * fetch results feeding the next epoch's politeness plan. It sits OUTSIDE
  * the fixed-delay conformance contract (the oracle pins delayMs); enable
  * it for adaptive production crawls.
  */
object AutoThrottle {

  final case class HostDelay(host: String, delayMs: Long)

  def clampedUpdate(
      oldDelayMs: Long, latencyMs: Long, ok: Boolean,
      targetConcurrency: Double, minDelayMs: Long, maxDelayMs: Long): Long = {
    val target = (latencyMs / targetConcurrency).toLong
    val next = (oldDelayMs + target) / 2
    val bounded = math.min(math.max(next, minDelayMs), maxDelayMs)
    if (!ok && bounded < oldDelayMs) oldDelayMs else bounded
  }

  /** Fold an epoch's fetch results (host, latencyMs, status) into updated
    * per-host delays. Uses mean latency per host for the epoch (the
    * reference updates per response; per-epoch mean is the BSP analogue). */
  def updateDelays(
      spark: SparkSession,
      fetchResults: DataFrame, // host, latencyMs, status
      currentDelays: Dataset[HostDelay],
      startDelayMs: Long = 5000,
      minDelayMs: Long = 100,
      maxDelayMs: Long = 60000,
      targetConcurrency: Double = 1.0): Dataset[HostDelay] = {
    import spark.implicits._
    val agg = fetchResults
      .groupBy($"host")
      .agg(avg($"latencyMs").as("meanLatency"),
        min(when($"status" >= 200 && $"status" < 300, 1).otherwise(0)).as("allOk"))
    agg.join(currentDelays.toDF(), Seq("host"), "left")
      .select($"host", coalesce($"delayMs", lit(startDelayMs)).as("delayMs"),
        $"meanLatency", $"allOk")
      .as[(String, Long, Double, Int)]
      .map { case (host, old, latency, allOk) =>
        HostDelay(host, clampedUpdate(old, latency.toLong, allOk == 1,
          targetConcurrency, minDelayMs, maxDelayMs))
      }
  }
}
