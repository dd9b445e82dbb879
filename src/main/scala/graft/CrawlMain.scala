package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.{Corpus, CorpusSpec, CorpusWriter}
import graft.operators.CrawlDriver

/** Crawl driver CLI:
  *   runMain graft.CrawlMain gen  <tiny|small|bench[:pages]> <corpusDir>
  *   runMain graft.CrawlMain run  <corpusDir> <snapshotRoot> [maxEpochs] [media=0|1]
  *   runMain graft.CrawlMain log  <snapshotRoot>        # print fetch log
  */
object CrawlMain {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def specOf(name: String): CorpusSpec = name.split(":").toList match {
    case "tiny" :: Nil => Corpus.Tiny
    case "small" :: Nil => Corpus.Small
    // small corpus + data:/file: seeds under <dir> (contract 6e; pair with
    // GRAFT_LOCAL_SCHEMES=1 on the run side). `gen` writes the local files.
    case "smalllocal" :: dir => Corpus.Small.copy(localSeedsDir = dir.mkString(":"))
    // small corpus + Cache-Control headers (contract 6f; pair with
    // GRAFT_HTTPCACHE=1 GRAFT_HTTPCACHE_POLICY=rfc2616 on the run side)
    case "smallcache" :: Nil => Corpus.Small.copy(cacheHeaders = true)
    // small corpus + request-meta control seeds (contract 7d)
    case "smallmeta" :: Nil => Corpus.Small.copy(metaControlSeeds = true)
    // small corpus + tier-2 cookie traps + cookiejar-meta seeds
    case "smalljar" :: Nil =>
      Corpus.Small.copy(cookieTraps = true, cookieJarSeeds = true)
    // small corpus + form pages (contract 7g; pair with GRAFT_SUBMIT_FORMS=1)
    case "smallform" :: Nil => Corpus.Small.copy(formPages = true)
    // small corpus + Location-resolution traps (///-relative, data: target)
    case "smallscheme" :: Nil => Corpus.Small.copy(schemeTrapPages = true)
    case "bench" :: Nil => Corpus.bench()
    case "bench" :: n :: Nil => Corpus.bench(n.toInt)
    case "bench" :: n :: "notraps" :: Nil => // round-1-shaped A/B baseline
      Corpus.bench(n.toInt).copy(richTraps = false)
    // frontier-scale spec: pages spread over ~2/3 as many hosts (most hosts
    // hold 1-2 pages — the broad-crawl shape where the fetch batch is huge
    // and the distributed seq-assign path matters)
    case "wide" :: n :: rest if rest.size <= 1 =>
      CorpusSpec(nHosts = math.max(1000, (n.toInt * 2) / 3), totalPages = n.toInt,
        hotHostShare = 0.02,
        seedCount = rest.headOption.map(_.toInt).getOrElse(math.max(500, n.toInt / 50)))
    case other => sys.error(s"unknown corpus spec $other")
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: name :: dir :: rest =>
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val spec = specOf(name)
      if (spec.localSeedsDir != null) Corpus.writeLocalFiles(spec, spec.localSeedsDir)
      CorpusWriter.writeAll(spark, spec, dir,
        withImages = rest.headOption.forall(_ != "img=0"))
      println(s"corpus $name written to $dir")
      spark.stop()

    case "run" :: corpusDir :: root :: rest =>
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val maxEpochs = rest.headOption.map(_.toInt)
      val withMedia = rest.drop(1).headOption.forall(_ != "media=0")
      // politeness knobs via env (bench harness drives these)
      val cfg = CrawlConfig(
        delayMs = sys.env.getOrElse("GRAFT_DELAY_MS", "100").toLong,
        epochMs = sys.env.getOrElse("GRAFT_EPOCH_MS", "1000").toLong,
        maxPerHostPerEpoch = sys.env.getOrElse("GRAFT_PER_HOST", "16").toInt,
        maxFetchesPerEpoch = sys.env.getOrElse("GRAFT_MAX_FETCHES_PER_EPOCH", "0").toLong,
        autothrottle = sys.env.get("GRAFT_AUTOTHROTTLE").contains("1"),
        submitForms = sys.env.get("GRAFT_SUBMIT_FORMS").contains("1"),
        localSchemes = sys.env.get("GRAFT_LOCAL_SCHEMES").contains("1"),
        httpcacheEnabled = sys.env.get("GRAFT_HTTPCACHE").contains("1"),
        httpcachePolicy = sys.env.getOrElse("GRAFT_HTTPCACHE_POLICY", "dummy"),
        virtualClockStartMs = sys.env.getOrElse("GRAFT_CLOCK_START_MS", "0").toLong,
        seqCollectMax = sys.env.getOrElse("GRAFT_SEQ_COLLECT_MAX", "2000000").toLong,
        bloomLocalMinBytes = sys.env.getOrElse("GRAFT_BLOOM_LOCAL_MIN",
          (64L << 20).toString).toLong)
      val t0 = System.nanoTime()
      val res = CrawlDriver.run(spark, cfg, corpusDir, root,
        withMedia = withMedia, maxEpochsOverride = maxEpochs)
      val secs = (System.nanoTime() - t0) / 1e9
      val m = res.manifest
      println(s"epochs=${m.snapshotId} pageFetches=${m.pageFetches} " +
        s"frontier=${m.frontierCount} seconds=$secs " +
        s"urlsPerSec=${m.pageFetches / math.max(secs, 1e-9)} " +
        s"finishReason=${m.finishReason}")
      println("epochstats=" + res.epochStats
        .map { case (f, sec) => f"$f:$sec%.3f" }.mkString(","))
      m.counters.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"# $k=$v") }
      spark.stop()

    // LogStats + PeriodicLog replay (`scrapy/extensions/logstats.py`,
    // `periodic_log.py`): one tick per committed epoch manifest — the
    // reference-format "Crawled N pages (...)" line plus the PeriodicLog
    // stats/delta JSON over the counter table, and the closing
    // responses_per_minute / items_per_minute pair on the virtual
    // interval timeline. Reads manifests only — no Spark session.
    case "stats" :: root :: rest =>
      import operators.PeriodicStats
      import operators.PeriodicStats.{LogStats, PeriodicConf, PeriodicLog, StatLong}
      val interval = rest.headOption.map(_.toDouble).getOrElse(60.0)
      val ms = graft.plans.Snapshot.loadAll(root)
      require(ms.nonEmpty, s"no manifest under $root")
      val ls = new LogStats(interval)
      val pl = new PeriodicLog(
        PeriodicConf(statsEnabled = true, deltaEnabled = true), interval)
      pl.spiderOpened(0L)
      def pages(m: graft.plans.Manifest): Long = m.pageFetches
      // batch item analogue: stored media rows (file_count, contract 6g/
      // FILES_EXPIRES); 0 when media is off
      def items(m: graft.plans.Manifest): Long =
        m.counters.getOrElse("file_count", 0L)
      ms.zipWithIndex.foreach { case (m, i) =>
        val line =
          if (i == 0) ls.spiderOpened(pages(m), items(m))
          else ls.tick(pages(m), items(m))
        println(s"[logstats] epoch=${m.snapshotId} $line")
        val stats = m.counters.toSeq.sortBy(_._1)
          .map { case (k, v) => (k, StatLong(v): PeriodicStats.StatVal) }
        println(pl.logLine(stats, (i * interval * 1000).toLong, 0L))
      }
      val last = ms.last
      val (rpm, ipm) = ls.spiderClosed(Some(0L),
        Some(((ms.size - 1) * interval * 1000).toLong), pages(last), items(last))
      println(s"responses_per_minute=${rpm.map(_.toString).getOrElse("None")} " +
        s"items_per_minute=${ipm.map(_.toString).getOrElse("None")}")

    // feed-export analogue (`scrapy/extensions/feedexport.py`): crawl
    // outputs → json/csv/parquet via the built-in DataFrameWriter
    case "export" :: root :: table :: outDir :: rest =>
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val fmt = rest.headOption.getOrElse("json")
      val m = graft.plans.Snapshot.loadLatest(root).getOrElse(sys.error("no manifest"))
      val df = table match {
        case "fetch_log" => CrawlDriver.fetchLog(spark, m)
        case "media" => spark.read.parquet(m.mediaDirs: _*)
          .drop("bytes") // payloads stay in parquet; metadata exports
        case "counters" =>
          import spark.implicits._
          m.counters.toSeq.sortBy(_._1).toDF("counter", "value")
        case other => sys.error(s"unknown table $other (fetch_log|media|counters)")
      }
      fmt match {
        case "json" => df.write.mode("overwrite").json(outDir)
        case "csv" => df.drop("fp").write.mode("overwrite")
          .option("header", "true").csv(outDir)
        case "parquet" => df.write.mode("overwrite").parquet(outDir)
        case "xml" | "pickle" | "marshal" | "pprint" =>
          operators.FeedExport.export(spark, df,
            operators.FeedExport.Feed(fmt), outDir)
        case "crawllog" =>
          // reference crawl-log rendering (`logformatter.py` CRAWLEDMSG /
          // DOWNLOADERRORMSG): one line per fetch in seq order — the log a
          // Scrapy operator would grep. fetch_log only.
          if (table != "fetch_log") sys.error("crawllog renders fetch_log only")
          import spark.implicits._
          df.orderBy("seq")
            .select($"status", $"method", $"url", $"referer", $"cached")
            .as[(Int, String, String, String, Boolean)]
            .map { case (st, mth, url, ref, cached) =>
              operators.LogFormat.fetchLogLine(st, mth, url, ref, cached) }
            .coalesce(1)
            .write.mode("overwrite").text(outDir)
        case other => sys.error(s"unknown format $other")
      }
      println(s"exported $table as $fmt to $outDir")
      spark.stop()

    case "log" :: root :: Nil =>
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val m = graft.plans.Snapshot.loadLatest(root).getOrElse(sys.error("no manifest"))
      CrawlDriver.fetchLog(spark, m).show(100, truncate = false)
      spark.stop()

    case other =>
      System.err.println(s"usage: CrawlMain gen|run|log ... (got $other)")
      sys.exit(2)
  }
}
