package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.CrawlConfig

/** Structured Streaming face of the engine (SURVEY.md §2.10): the batch
  * epoch loop is the conformance path, but the same per-host politeness
  * semantics compose as a continuous pipeline for live ingestion:
  *
  *  - [[politenessGate]]: `flatMapGroupsWithState` keyed by host — the
  *    streaming analogue of the downloader slot (`scrapy/core/downloader/
  *    __init__.py:148-221`): per-host state carries `lastTMs`; each incoming
  *    candidate is assigned the next virtual slot `max(lastT + delay, now)`.
  *  - [[hostWindowStats]]: watermarked tumbling-window fetch counters per
  *    host (LogStats analogue, `scrapy/extensions/logstats.py:53-100`).
  */
object StreamingCrawl {

  /** A candidate fetch arriving on the stream. */
  final case class StreamRequest(host: String, url: String, eventTimeMs: Long)

  /** A politeness-scheduled fetch. */
  final case class ScheduledFetch(host: String, url: String, scheduledTMs: Long)

  final case class HostGateState(lastTMs: Long)

  /** Per-host politeness gate: assigns each request the earliest virtual
    * slot ≥ lastT + delay. State is bounded (one long per host). In a
    * production deployment with a real trigger interval, add
    * `ProcessingTimeTimeout` for idle-slot GC (`downloader/__init__.py:
    * 275-279`); with the default ASAP trigger, timeouts would spin empty
    * micro-batches. */
  def politenessGate(
      requests: Dataset[StreamRequest],
      cfg: CrawlConfig): Dataset[ScheduledFetch] = {
    import requests.sparkSession.implicits._
    val delay = cfg.delayMs
    requests
      .groupByKey(_.host)
      .flatMapGroupsWithState[HostGateState, ScheduledFetch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (host, rows, state: GroupState[HostGateState]) =>
          var lastT = state.getOption.map(_.lastTMs).getOrElse(Long.MinValue / 2)
          val out = rows.toSeq.sortBy(r => (r.eventTimeMs, r.url)).map { r =>
            val t = math.max(lastT + delay, r.eventTimeMs)
            lastT = t
            ScheduledFetch(host, r.url, t)
          }
          state.update(HostGateState(lastT))
          out.iterator
      }
  }

  /** One event on the adaptive stream: a candidate request
    * (`latencyMs = -1`) or a completed fetch result feeding the slot's
    * AutoThrottle adjustment (`latencyMs >= 0` + its status). */
  final case class SlotEvent(host: String, url: String, eventTimeMs: Long,
      latencyMs: Long = -1L, status: Int = 0)

  final case class SlotGateState(lastTMs: Long, delayMs: Long)

  /** Adaptive politeness gate — the streaming face of CrawlConfig contract
    * step 1a (AutoThrottle + DOWNLOAD_SLOTS): per-slot state carries
    * (lastT, delay); response events fold through the reference's
    * `_adjust_delay` ([[graft.operators.AutoThrottle.clampedUpdate]]) and
    * request events are scheduled at `max(lastT + currentDelay, now)`.
    * Events within a micro-batch apply in (eventTime, isResponse-first,
    * url) order, so a response arriving with a request batch adjusts the
    * delay the batch is scheduled under — the continuous analogue of the
    * epoch-BSP "delay resolved at epoch start" rule, at micro-batch
    * granularity. State stays two longs per slot. */
  def adaptivePolitenessGate(
      events: Dataset[SlotEvent],
      cfg: CrawlConfig): Dataset[ScheduledFetch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.host)
      .flatMapGroupsWithState[SlotGateState, ScheduledFetch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (host, rows, state: GroupState[SlotGateState]) =>
          var st = state.getOption.getOrElse(
            SlotGateState(Long.MinValue / 2, cfg.resolveSlotDelay(host, -1L)))
          var lastT = st.lastTMs
          var delay = st.delayMs
          val out = Vector.newBuilder[ScheduledFetch]
          for (r <- rows.toSeq.sortBy(r => (r.eventTimeMs, r.latencyMs < 0, r.url))) {
            if (r.latencyMs >= 0) {
              delay = graft.operators.AutoThrottle.clampedUpdate(
                delay, r.latencyMs, r.status, cfg.autothrottleTargetConcurrency,
                cfg.baseDelayOf(host), cfg.autothrottleMaxDelayMs)
            } else {
              val t = math.max(lastT + delay, r.eventTimeMs)
              lastT = t
              out += ScheduledFetch(host, r.url, t)
            }
          }
          state.update(SlotGateState(lastT, delay))
          out.result().iterator
      }
  }

  /** Watermarked tumbling-window per-host fetch counts. */
  def hostWindowStats(fetches: DataFrame, windowDur: String = "1 minute"): DataFrame = {
    fetches
      .withColumn("ts", (col("scheduledTMs") / 1000).cast("timestamp"))
      .withWatermark("ts", "2 minutes")
      .groupBy(col("host"), window(col("ts"), windowDur))
      .agg(count(lit(1)).as("fetches"))
      .select(col("host"), col("window.start").as("win_start"), col("fetches"))
  }
}
