package graft.operators

/** LogStats + PeriodicLog — the reference's periodic stats observability
  * extensions (`scrapy/extensions/logstats.py`, `periodic_log.py`),
  * re-expressed as pure tick-driven calculators over the engine's counter
  * map. The reference drives them from a wall-clock LoopingCall; the batch
  * engine drives them per epoch from the driver loop (virtual-time ticks) —
  * the MATH is the reference's, byte-for-byte on the emitted lines:
  *
  *  - LogStats (`logstats.py:46-103`): rate = (count − prev) · 60/interval;
  *    the looping call fires once at start(now) so `spider_opened` performs
  *    the first calculate_stats; the closing responses_per_minute /
  *    items_per_minute divide by `(finish − start).seconds / 60` — CPython
  *    `timedelta.seconds` (day remainder, NOT total_seconds — a crawl
  *    > 24h keeps only the sub-day part, modeled faithfully), None when
  *    either timestamp is missing or the elapsed minutes are 0.
  *  - PeriodicLog (`periodic_log.py:106-160`): `param_allowed` substring
  *    include/exclude (exclude-only ⇒ default-allow), delta over the
  *    NUMERIC stats only, insertion order preserved; the JSON line is
  *    `ScrapyJSONEncoder(sort_keys=True, indent=4)` — sorted keys, 4-space
  *    indent, datetimes as "YYYY-MM-DD HH:MM:SS", floats via CPython repr.
  *
  * Pinned by PeriodicStatsSpec: the `tests/test_logstats.py` calculation
  * battery and the `tests/test_extension_periodic_log.py` include/exclude
  * matrix over its two stats dumps, plus a CPython-generated JSON golden.
  */
object PeriodicStats {

  /** A stats value: the reference's _stats dict holds ints, floats and
    * datetimes (start_time). */
  sealed trait StatVal
  final case class StatLong(v: Long) extends StatVal
  final case class StatDouble(v: Double) extends StatVal
  /** Epoch millis UTC, rendered like ScrapyJSONEncoder datetimes. */
  final case class StatTime(epochMs: Long) extends StatVal
  final case class StatStr(v: String) extends StatVal

  // ------------------------------------------------------------- LogStats

  /** `logstats.py` LogStats. Call [[spiderOpened]] once (performs the
    * immediate first tick like LoopingCall.start(now=True)), then [[tick]]
    * per interval; [[spiderClosed]] returns the final per-minute rates. */
  final class LogStats(interval: Double = 60.0) {
    require(interval > 0, "LOGSTATS_INTERVAL must be set")
    val multiplier: Double = 60.0 / interval
    var pages: Long = 0L
    var items: Long = 0L
    var prate: Double = 0.0
    var irate: Double = 0.0
    var pagesprev: Long = 0L
    var itemsprev: Long = 0L

    def spiderOpened(pages0: Long, items0: Long): String = {
      pagesprev = 0L
      itemsprev = 0L
      tick(pages0, items0)
    }

    /** calculate_stats + the log line (`logstats.py:55-77`); `%d` of the
      * float rate truncates toward zero like CPython `%`-formatting. */
    def tick(pagesNow: Long, itemsNow: Long): String = {
      items = itemsNow
      pages = pagesNow
      irate = (items - itemsprev) * multiplier
      prate = (pages - pagesprev) * multiplier
      pagesprev = pages
      itemsprev = items
      s"Crawled $pages pages (at ${prate.toLong} pages/min), " +
        s"scraped $items items (at ${irate.toLong} items/min)"
    }

    /** calculate_final_stats (`logstats.py:84-103`): (responses_per_minute,
      * items_per_minute) from a FRESH stats read like the reference,
      * None-able. `minsElapsed` uses CPython `timedelta.seconds` — the
      * sub-day remainder of the elapsed time, microseconds dropped. */
    def spiderClosed(startTimeMs: Option[Long], finishTimeMs: Option[Long],
        pagesNow: Long, itemsNow: Long): (Option[Double], Option[Double]) =
      (startTimeMs, finishTimeMs) match {
        case (Some(s), Some(f)) =>
          val totalMs = f - s
          val dayMs = 86400000L
          val secondsInDay = Math.floorMod(totalMs, dayMs) / 1000L
          val minsElapsed = secondsInDay / 60.0
          if (minsElapsed == 0.0) (None, None)
          else (Some(pagesNow / minsElapsed), Some(itemsNow / minsElapsed))
        case _ => (None, None)
      }
  }

  // ---------------------------------------------------------- PeriodicLog

  /** PERIODIC_LOG_STATS / PERIODIC_LOG_DELTA config: booleans enable with
    * empty filters (the reference's `{"enabled": True}` fallback when the
    * setting is a bare True/"True"). */
  final case class PeriodicConf(
      statsEnabled: Boolean = false,
      statsInclude: Seq[String] = Nil,
      statsExclude: Seq[String] = Nil,
      deltaEnabled: Boolean = false,
      deltaInclude: Seq[String] = Nil,
      deltaExclude: Seq[String] = Nil,
      timingEnabled: Boolean = false) {
    require(statsEnabled || deltaEnabled || timingEnabled,
      "NotConfigured: enable stats, delta or timing")
  }

  final class PeriodicLog(conf: PeriodicConf, interval: Double = 60.0) {
    private var deltaPrev: Map[String, StatVal] = Map.empty
    private var timePrevMs: Long = 0L

    def spiderOpened(nowMs: Long): Unit = {
      timePrevMs = nowMs
      deltaPrev = Map.empty
    }

    /** `param_allowed` (`periodic_log.py:145-155`): substring matching;
      * no filters ⇒ allow; exclude hit ⇒ deny; exclude-only ⇒ allow;
      * otherwise any include hit. */
    def paramAllowed(name: String, include: Seq[String],
        exclude: Seq[String]): Boolean = {
      if (include.isEmpty && exclude.isEmpty) true
      else if (exclude.exists(name.contains(_))) false
      else if (exclude.nonEmpty && include.isEmpty) true
      else include.exists(name.contains(_))
    }

    private def numeric(v: StatVal): Boolean = v match {
      case _: StatLong | _: StatDouble => true
      case _ => false
    }

    /** log_delta: numeric stats only, previous-tick subtraction, insertion
      * order preserved. */
    def logDelta(stats: Seq[(String, StatVal)]): Seq[(String, StatVal)] = {
      val numStats = stats.filter { case (k, v) =>
        numeric(v) && paramAllowed(k, conf.deltaInclude, conf.deltaExclude)
      }
      val delta = numStats.map { case (k, v) =>
        val prev = deltaPrev.get(k)
        val d = (v, prev) match {
          case (StatLong(a), Some(StatLong(b))) => StatLong(a - b)
          case (StatLong(a), Some(StatDouble(b))) => StatDouble(a - b)
          case (StatLong(a), None) => StatLong(a)
          case (StatDouble(a), Some(StatLong(b))) => StatDouble(a - b)
          case (StatDouble(a), Some(StatDouble(b))) => StatDouble(a - b)
          case (StatDouble(a), None) => StatDouble(a)
          case _ => v
        }
        (k, d)
      }
      deltaPrev = numStats.toMap
      delta
    }

    def logCrawlerStats(stats: Seq[(String, StatVal)]): Seq[(String, StatVal)] =
      stats.filter { case (k, _) =>
        paramAllowed(k, conf.statsInclude, conf.statsExclude)
      }

    /** log_timing: interval, start_time, utcnow, real interval, elapsed. */
    def logTiming(nowMs: Long, startTimeMs: Long): Seq[(String, StatVal)] = {
      val out = Seq(
        "log_interval" -> StatDouble(interval),
        "start_time" -> StatTime(startTimeMs),
        "utcnow" -> StatTime(nowMs),
        "log_interval_real" -> StatDouble((nowMs - timePrevMs) / 1000.0),
        "elapsed" -> StatDouble((nowMs - startTimeMs) / 1000.0))
      timePrevMs = nowMs
      out
    }

    /** One periodic line: the enabled sections assembled in the reference's
      * order (time, delta, stats) and encoded like
      * `ScrapyJSONEncoder(sort_keys=True, indent=4)`. */
    def logLine(stats: Seq[(String, StatVal)], nowMs: Long,
        startTimeMs: Long): String = {
      val sections = Seq.newBuilder[(String, Seq[(String, StatVal)])]
      if (conf.timingEnabled) sections += ("time" -> logTiming(nowMs, startTimeMs))
      if (conf.deltaEnabled) sections += ("delta" -> logDelta(stats))
      if (conf.statsEnabled) sections += ("stats" -> logCrawlerStats(stats))
      encode(sections.result())
    }

    def spiderClosed(stats: Seq[(String, StatVal)], nowMs: Long,
        startTimeMs: Long): String = logLine(stats, nowMs, startTimeMs)
  }

  /** `json.dumps(data, sort_keys=True, indent=4)` with ScrapyJSONEncoder
    * value rendering: datetimes "YYYY-MM-DD HH:MM:SS" (UTC, no micros),
    * floats via CPython repr, ints plain, strings json-escaped. */
  def encode(data: Seq[(String, Seq[(String, StatVal)])]): String = {
    val sb = new StringBuilder
    if (data.isEmpty) return "{}"
    sb ++= "{\n"
    val outer = data.sortBy(_._1)
    outer.zipWithIndex.foreach { case ((sec, entries), i) =>
      sb ++= "    " ++= jsonStr(sec) ++= ": "
      if (entries.isEmpty) sb ++= "{}"
      else {
        sb ++= "{\n"
        val inner = entries.sortBy(_._1)
        inner.zipWithIndex.foreach { case ((k, v), j) =>
          sb ++= "        " ++= jsonStr(k) ++= ": " ++= renderVal(v)
          if (j < inner.length - 1) sb ++= ","
          sb ++= "\n"
        }
        sb ++= "    }"
      }
      if (i < outer.length - 1) sb ++= ","
      sb ++= "\n"
    }
    sb ++= "}"
    sb.toString
  }

  private def renderVal(v: StatVal): String = v match {
    case StatLong(x) => x.toString
    case StatDouble(x) =>
      if (x.isNaN) "NaN"
      else if (x.isPosInfinity) "Infinity"
      else if (x.isNegInfinity) "-Infinity"
      else PyRepr.floatRepr(x)
    case StatTime(ms) =>
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      jsonStr(fmt.format(new java.util.Date(ms)))
    case StatStr(s) => jsonStr(s)
  }

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < 0x20 || c > 0x7e => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.toString
  }
}
