package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PeriodicStats
import PeriodicStats._

/** Pins [[PeriodicStats]] against the reference batteries:
  * `tests/test_logstats.py` (rate calculations, final per-minute stats,
  * the None cases) and `tests/test_extension_periodic_log.py` (the
  * include/exclude matrix over its stats_dump_1/2 fixtures), plus a
  * CPython-generated `json.dumps(sort_keys=True, indent=4)` golden for
  * the encoder. */
class PeriodicStatsSpec extends AnyFunSuite {

  // stats_dump_1 / stats_dump_2 from test_extension_periodic_log.py,
  // insertion order preserved
  private def dump1: Seq[(String, StatVal)] = Seq(
    "log_count/INFO" -> StatLong(10),
    "log_count/WARNING" -> StatLong(1),
    "start_time" -> StatTime(1686905958993L), // 2023-06-16 08:59:18.993 UTC
    "scheduler/enqueued/memory" -> StatLong(190),
    "scheduler/enqueued" -> StatLong(190),
    "scheduler/dequeued/memory" -> StatLong(166),
    "scheduler/dequeued" -> StatLong(166),
    "downloader/request_count" -> StatLong(166),
    "downloader/request_method_count/GET" -> StatLong(166),
    "downloader/request_bytes" -> StatLong(56803),
    "downloader/response_count" -> StatLong(150),
    "downloader/response_status_count/200" -> StatLong(150),
    "downloader/response_bytes" -> StatLong(595698),
    "httpcompression/response_bytes" -> StatLong(3186068),
    "httpcompression/response_count" -> StatLong(150),
    "response_received_count" -> StatLong(150),
    "request_depth_max" -> StatLong(9),
    "dupefilter/filtered" -> StatLong(180),
    "item_scraped_count" -> StatLong(140))

  private def dump2: Seq[(String, StatVal)] = Seq(
    "log_count/INFO" -> StatLong(12),
    "log_count/WARNING" -> StatLong(1),
    "start_time" -> StatTime(1686905958993L),
    "scheduler/enqueued/memory" -> StatLong(337),
    "scheduler/enqueued" -> StatLong(337),
    "scheduler/dequeued/memory" -> StatLong(280),
    "scheduler/dequeued" -> StatLong(280),
    "downloader/request_count" -> StatLong(280),
    "downloader/request_method_count/GET" -> StatLong(280),
    "downloader/request_bytes" -> StatLong(95754),
    "downloader/response_count" -> StatLong(264),
    "downloader/response_status_count/200" -> StatLong(264),
    "downloader/response_bytes" -> StatLong(1046274),
    "httpcompression/response_bytes" -> StatLong(5614484),
    "httpcompression/response_count" -> StatLong(264),
    "response_received_count" -> StatLong(264),
    "request_depth_max" -> StatLong(16),
    "dupefilter/filtered" -> StatLong(320),
    "item_scraped_count" -> StatLong(248))

  // ── test_logstats.py ──────────────────────────────────────────────────

  test("LogStats rate calculations (test_stats_calculations)") {
    val ls = new LogStats(60.0)
    // spider_opened fires the first tick (LoopingCall start now=True)
    ls.spiderOpened(4802, 3201)
    assert(ls.pagesprev === 4802)
    assert(ls.itemsprev === 3201)

    ls.tick(4802, 3201)
    assert(ls.items === 3201 && ls.pages === 4802)
    assert(ls.irate === 0.0 && ls.prate === 0.0)

    // a minute later
    val line = ls.tick(5187, 3492)
    assert(ls.irate === 291.0 && ls.prate === 385.0)
    assert(line ===
      "Crawled 5187 pages (at 385 pages/min), scraped 3492 items (at 291 items/min)")

    // spider closes after 30 minutes (fromtimestamp values in the test)
    val (rpm, ipm) = ls.spiderClosed(Some(1655100172000L),
      Some(1655101972000L), 5187, 3492)
    assert(rpm === Some(172.9))
    assert(ipm === Some(116.4))
  }

  test("LogStats final stats None cases") {
    val ls = new LogStats(60.0)
    assert(ls.spiderClosed(None, None, 0, 0) === ((None, None)))
    assert(ls.spiderClosed(Some(1655100172000L), None, 0, 0) === ((None, None)))
    // zero elapsed
    assert(ls.spiderClosed(Some(1655100172000L), Some(1655100172000L), 5, 5) ===
      ((None, None)))
  }

  test("LogStats final stats keep only the sub-day elapsed remainder") {
    // CPython timedelta.seconds drops whole days: a 24h30m crawl divides
    // by 30 minutes, exactly like the reference's (finish-start).seconds
    val ls = new LogStats(60.0)
    val start = 0L
    val finish = 86400000L + 1800000L
    val (rpm, ipm) = ls.spiderClosed(Some(start), Some(finish), 300, 60)
    assert(rpm === Some(10.0))
    assert(ipm === Some(2.0))
  }

  test("LogStats line truncates fractional rates like %d") {
    val ls = new LogStats(30.0) // multiplier 2.0
    ls.spiderOpened(0, 0)
    // +7 pages in 30s → 14/min; +3 items → 6/min
    assert(ls.tick(7, 3) ===
      "Crawled 7 pages (at 14 pages/min), scraped 3 items (at 6 items/min)")
    val ls2 = new LogStats(90.0) // multiplier 2/3 → 4.66→4, 0.66→0
    ls2.spiderOpened(0, 0)
    assert(ls2.tick(7, 1) ===
      "Crawled 7 pages (at 4 pages/min), scraped 1 items (at 0 items/min)")
  }

  // ── test_extension_periodic_log.py ────────────────────────────────────

  private def keysOf(s: Seq[(String, StatVal)]): Seq[String] = s.map(_._1)
  private def numericKeys(s: Seq[(String, StatVal)]): Seq[String] =
    s.collect { case (k, StatLong(_)) => k
                case (k, StatDouble(_)) => k }

  private def deltaCheck(conf: PeriodicConf, cond: String => Boolean): Unit = {
    val pl = new PeriodicLog(conf)
    pl.spiderOpened(0L)
    val a = pl.logDelta(dump1)
    val b = pl.logDelta(dump1)
    val expected = numericKeys(dump1).filter(cond)
    assert(keysOf(a) === expected)
    assert(keysOf(b) === expected)
    // first call: raw values; second call, same stats: all-zero deltas
    assert(a.forall { case (k, v) => dump1.toMap.apply(k) == v })
    assert(b.forall { case (_, v) => v == StatLong(0) })
  }

  test("PeriodicLog delta include/exclude matrix") {
    deltaCheck(PeriodicConf(deltaEnabled = true), _ => true)
    deltaCheck(PeriodicConf(deltaEnabled = true,
      deltaInclude = Seq("downloader/")), _.contains("downloader/"))
    deltaCheck(PeriodicConf(deltaEnabled = true,
      deltaInclude = Seq("downloader/", "scheduler/")),
      k => k.contains("downloader/") || k.contains("scheduler/"))
    deltaCheck(PeriodicConf(deltaEnabled = true,
      deltaExclude = Seq("downloader/")), !_.contains("downloader/"))
    deltaCheck(PeriodicConf(deltaEnabled = true,
      deltaExclude = Seq("downloader/", "scheduler/")),
      k => !k.contains("downloader/") && !k.contains("scheduler/"))
    deltaCheck(PeriodicConf(deltaEnabled = true,
      deltaInclude = Seq("downloader/"), deltaExclude = Seq("bytes")),
      k => k.contains("downloader/") && !k.contains("bytes"))
  }

  private def statsCheck(conf: PeriodicConf, cond: String => Boolean): Unit = {
    val pl = new PeriodicLog(conf)
    pl.spiderOpened(0L)
    assert(keysOf(pl.logCrawlerStats(dump1)) === keysOf(dump1).filter(cond))
    assert(keysOf(pl.logCrawlerStats(dump1)) === keysOf(dump1).filter(cond))
  }

  test("PeriodicLog stats include/exclude matrix") {
    statsCheck(PeriodicConf(statsEnabled = true), _ => true)
    statsCheck(PeriodicConf(statsEnabled = true,
      statsInclude = Seq("downloader/")), _.contains("downloader/"))
    statsCheck(PeriodicConf(statsEnabled = true,
      statsInclude = Seq("downloader/", "scheduler/")),
      k => k.contains("downloader/") || k.contains("scheduler/"))
    statsCheck(PeriodicConf(statsEnabled = true,
      statsExclude = Seq("downloader/")), !_.contains("downloader/"))
    statsCheck(PeriodicConf(statsEnabled = true,
      statsExclude = Seq("downloader/", "scheduler/")),
      k => !k.contains("downloader/") && !k.contains("scheduler/"))
    statsCheck(PeriodicConf(statsEnabled = true,
      statsInclude = Seq("downloader/"), statsExclude = Seq("bytes")),
      k => k.contains("downloader/") && !k.contains("bytes"))
  }

  test("delta across two dumps subtracts the previous numeric stats") {
    val pl = new PeriodicLog(PeriodicConf(deltaEnabled = true))
    pl.spiderOpened(0L)
    pl.logDelta(dump1)
    val d = pl.logDelta(dump2).toMap
    assert(d("downloader/request_count") === StatLong(114)) // 280-166
    assert(d("item_scraped_count") === StatLong(108)) // 248-140
    assert(d("log_count/WARNING") === StatLong(0))
  }

  test("encoder matches CPython json.dumps(sort_keys=True, indent=4)") {
    // golden generated from CPython over stats_dump_1 (delta = its numeric
    // subset on a fresh PeriodicLog; stats = everything incl. the datetime)
    val pl = new PeriodicLog(PeriodicConf(deltaEnabled = true, statsEnabled = true))
    pl.spiderOpened(0L)
    val out = PeriodicStats.encode(Seq(
      "delta" -> pl.logDelta(dump1),
      "stats" -> pl.logCrawlerStats(dump1)))
    assert(out ===
      "{\n    \"delta\": {\n        \"downloader/request_bytes\": 56803,\n        \"downloader/request_count\": 166,\n        \"downloader/request_method_count/GET\": 166,\n        \"downloader/response_bytes\": 595698,\n        \"downloader/response_count\": 150,\n        \"downloader/response_status_count/200\": 150,\n        \"dupefilter/filtered\": 180,\n        \"httpcompression/response_bytes\": 3186068,\n        \"httpcompression/response_count\": 150,\n        \"item_scraped_count\": 140,\n        \"log_count/INFO\": 10,\n        \"log_count/WARNING\": 1,\n        \"request_depth_max\": 9,\n        \"response_received_count\": 150,\n        \"scheduler/dequeued\": 166,\n        \"scheduler/dequeued/memory\": 166,\n        \"scheduler/enqueued\": 190,\n        \"scheduler/enqueued/memory\": 190\n    },\n    \"stats\": {\n        \"downloader/request_bytes\": 56803,\n        \"downloader/request_count\": 166,\n        \"downloader/request_method_count/GET\": 166,\n        \"downloader/response_bytes\": 595698,\n        \"downloader/response_count\": 150,\n        \"downloader/response_status_count/200\": 150,\n        \"dupefilter/filtered\": 180,\n        \"httpcompression/response_bytes\": 3186068,\n        \"httpcompression/response_count\": 150,\n        \"item_scraped_count\": 140,\n        \"log_count/INFO\": 10,\n        \"log_count/WARNING\": 1,\n        \"request_depth_max\": 9,\n        \"response_received_count\": 150,\n        \"scheduler/dequeued\": 166,\n        \"scheduler/dequeued/memory\": 166,\n        \"scheduler/enqueued\": 190,\n        \"scheduler/enqueued/memory\": 190,\n        \"start_time\": \"2023-06-16 08:59:18\"\n    }\n}")
  }

  test("timing section and section ordering (time, delta, stats)") {
    val pl = new PeriodicLog(PeriodicConf(deltaEnabled = true,
      timingEnabled = true), interval = 60.0)
    val start = 1686905958993L
    pl.spiderOpened(start)
    val line = pl.logLine(dump1, start + 61000L, start)
    // sort_keys puts delta before time in the OUTPUT, but timing state
    // (time_prev) advanced; elapsed = 61.0s, first real interval = 61.0s
    assert(line.contains("\"elapsed\": 61.0"))
    assert(line.contains("\"log_interval\": 60.0"))
    assert(line.contains("\"log_interval_real\": 61.0"))
    assert(line.contains("\"start_time\": \"2023-06-16 08:59:18\""))
    assert(line.contains("\"utcnow\": \"2023-06-16 09:00:19\""))
    val line2 = pl.logLine(dump1, start + 121000L, start)
    assert(line2.contains("\"log_interval_real\": 60.0"))
    assert(line2.contains("\"elapsed\": 121.0"))
  }

  test("NotConfigured when nothing is enabled") {
    intercept[IllegalArgumentException] { PeriodicConf() }
  }
}
