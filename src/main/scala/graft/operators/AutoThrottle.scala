package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** AutoThrottle: adaptive per-host download delay — the exact
  * `_adjust_delay` policy (`scrapy/extensions/throttle.py:104-140`, defaults
  * `default_settings.py:200-204`):
  *
  *   target   = latency / targetConcurrency
  *   newDelay = max(target, (oldDelay + target) / 2)   // mean, floored at target
  *   newDelay = clamp(newDelay, minDelay, maxDelay)
  *   a non-200 response never LOWERS the delay (error pages are small and
  *   fast — adopting their latency would be a positive feedback loop).
  *
  * In the epoch model this is a per-slot fold over the epoch's fetch
  * results in global seq order, feeding the NEXT epoch's politeness plan
  * (CrawlConfig contract step 1a). When `cfg.autothrottle` is on, the
  * engine wires this into the dequeue via HostState.delayMs and the oracle
  * replays the identical fold, so conformance stays byte-exact.
  */
object AutoThrottle {

  final case class HostDelay(host: String, delayMs: Long)

  def clampedUpdate(
      oldDelayMs: Long, latencyMs: Long, status: Int,
      targetConcurrency: Double, minDelayMs: Long, maxDelayMs: Long): Long = {
    val target = (latencyMs / targetConcurrency).toLong
    val mean = (oldDelayMs + target) / 2
    val next = math.max(target, mean)
    val bounded = math.min(math.max(next, minDelayMs), maxDelayMs)
    if (status != 200 && bounded <= oldDelayMs) oldDelayMs else bounded
  }

  /** Fold an epoch's fetch results (host, latencyMs, status[, seq]) into
    * updated per-host delays by replaying the reference's PER-RESPONSE
    * update in fetch order — exact `throttle.py:104-129` semantics, not an
    * epoch-mean approximation (one slow 404 no longer freezes a host's
    * delay for the whole epoch). The per-host result list is bounded by the
    * politeness budget (≤ maxPerHostPerEpoch), so the collect_list is
    * map-side-combined and bounded, not data-sized. Rows may carry a `seq`
    * column to pin the replay order; otherwise latency/status order is
    * used (deterministic for a deterministic input). */
  def updateDelays(
      spark: SparkSession,
      fetchResults: DataFrame, // host, latencyMs, status [, seq]
      currentDelays: Dataset[HostDelay],
      startDelayMs: Long = 5000,
      minDelayMs: Long = 100,
      maxDelayMs: Long = 60000,
      targetConcurrency: Double = 1.0): Dataset[HostDelay] = {
    import spark.implicits._
    val withSeq =
      if (fetchResults.columns.contains("seq")) fetchResults
      else fetchResults.withColumn("seq",
        $"latencyMs" * 1000 + pmod($"status".cast("long"), lit(1000)))
    val agg = withSeq
      .groupBy($"host")
      .agg(sort_array(collect_list(
        struct($"seq".cast("long").as("seq"),
          $"latencyMs".cast("long").as("latencyMs"),
          $"status".cast("int").as("status")))).as("events"))
    agg.join(currentDelays.toDF(), Seq("host"), "left")
      .select($"host", coalesce($"delayMs", lit(startDelayMs)).as("delayMs"), $"events")
      .as[(String, Long, Seq[(Long, Long, Int)])]
      .map { case (host, start, events) =>
        var d = start
        for ((_, latency, status) <- events) {
          d = clampedUpdate(d, latency, status,
            targetConcurrency, minDelayMs, maxDelayMs)
        }
        HostDelay(host, d)
      }
  }
}
