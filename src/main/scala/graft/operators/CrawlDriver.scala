package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.plans.{Manifest, Snapshot}
import graft.urlkit.UrlKit

/** Driver-side epoch loop (the honest Spark-native shape of the reference's
  * engine pump, SURVEY.md §2.10): each epoch is a pure function of snapshot N
  * producing snapshot N+1, committed via atomic manifest rename — kill the
  * job anywhere and a re-run resumes from the last committed manifest with
  * identical final state (exactly-once by idempotent recompute).
  */
object CrawlDriver {

  final case class RunResult(manifest: Manifest, root: String,
      epochStats: Seq[(Long, Double)], // (pageFetches, wallSecs) per epoch
      // spider.state as persisted at spider_closed (SpiderState extension,
      // `extensions/spiderstate.py`; empty dict when never populated)
      spiderState: graft.operators.Py.PyDict = graft.operators.Py.PyDict(Nil))

  def dataDir(root: String, epoch: Int, table: String): String =
    s"$root/data/epoch$epoch/$table"

  /** Read the url_seen delta chain. Each delta dir is hive-partitioned by
    * `bucket`; Spark refuses multiple partitioned roots in one read, so union
    * per-dir reads (the union is free — no shuffle, schema identical). The
    * schema is explicit because an epoch with zero discoveries writes an
    * empty dir (no files → nothing to infer). */
  def readSeen(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map { d =>
      spark.read.schema("fpHex STRING, bucket INT").parquet(d)
        .select(col("fpHex"), col("bucket"))
    }.reduce(_.unionByName(_))

  // explicit schemas: an epoch touching nothing writes an EMPTY delta dir
  // (no files → nothing to infer), and a pre-round-3 host_state lacks
  // delayMs (parquet fills the missing column with null → coalesce -1)
  private val HostStateSchema = "host STRING, lastTMs BIGINT, robotsFetched BOOLEAN, delayMs BIGINT"
  private val RobotsSchema = "host STRING, body BINARY, ok BOOLEAN"
  private val CookieSchema = "host STRING, name STRING, value STRING, " +
    "path STRING, hostOnly BOOLEAN, expiresMs BIGINT, secure BOOLEAN, " +
    "jar STRING"
  // storedTMs/status/cacheControl since the 6f rfc2616 policy — a dummy
  // chain written before that reads with nulls (membership is all it needs)
  private val HttpCacheSchema =
    "fpHex STRING, storedTMs BIGINT, status INT, cacheControl STRING"

  /** Merge a host-state delta chain: per slot, the LATEST chain entry wins
    * (each delta row carries the slot's full new state). */
  def readHostState(spark: SparkSession, dirs: Seq[String]): Dataset[HostState] = {
    import spark.implicits._
    dirs.zipWithIndex.map { case (d, i) =>
      spark.read.schema(HostStateSchema).parquet(d)
        .select(col("host"), col("lastTMs"), col("robotsFetched"),
          coalesce(col("delayMs"), lit(-1L)).as("delayMs"))
        .withColumn("chainIdx", lit(i))
    }.reduce(_.unionByName(_))
      .groupBy($"host")
      .agg(max_by(struct($"lastTMs", $"robotsFetched", $"delayMs"),
        $"chainIdx").as("r"))
      .select($"host", $"r.lastTMs", $"r.robotsFetched", $"r.delayMs")
      .as[HostState]
  }

  /** Robots-cache chain: deltas are DISJOINT appends (one robots fetch per
    * host, ever) — the merge is a plain union, no per-key resolution. */
  def readRobotsCache(spark: SparkSession,
      dirs: Seq[String]): Dataset[CrawlEngine.RobotsCacheRow] = {
    import spark.implicits._
    dirs.map(d => spark.read.schema(RobotsSchema).parquet(d))
      .reduce(_.unionByName(_)).as[CrawlEngine.RobotsCacheRow]
  }

  /** offsite domains_seen chain (contract 7h): per-epoch deltas are
    * pairwise disjoint (each anti-joined against the full prior chain at
    * write time), so the read is a plain union — no merge shuffle. */
  def readOffsiteDomains(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import spark.implicits._
    if (dirs.isEmpty) spark.emptyDataset[String].toDF("domain")
    else dirs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }

  /** media_seen chain (FILES_EXPIRES reuse): latest store per image_id
    * wins — a re-download replaces the older entry's storedTMs/metadata. */
  def readMediaSeen(spark: SparkSession, dirs: Seq[String]): Dataset[MediaSeenRow] = {
    import spark.implicits._
    if (dirs.isEmpty) spark.emptyDataset[MediaSeenRow]
    else dirs.zipWithIndex.map { case (d, i) =>
      spark.read.parquet(d).withColumn("chainIdx", lit(i))
    }.reduce(_.unionByName(_))
      .groupBy($"image_id")
      .agg(max_by(struct($"storedTMs", $"w", $"h", $"fmt", $"caption",
        $"phash", $"checksumMd5"), $"chainIdx").as("r"))
      .select($"image_id", $"r.storedTMs", $"r.w", $"r.h", $"r.fmt",
        $"r.caption", $"r.phash", $"r.checksumMd5")
      .as[MediaSeenRow]
  }

  /** Cookie-jar chain: per (domain, path, name) the latest chain entry
    * wins (RFC 6265 §5.3 jar key — the `host` column holds the cookie
    * DOMAIN). An expired entry IS its key's delete tombstone: it shadows
    * older live entries and is never sent ([[Cookies.sendable]]), so the
    * merge keeps it. Pre-round-5 chains lack the attribute columns (filled
    * with host-only defaults) and used value == "" as the tombstone —
    * those legacy rows are dropped at read. */
  def readCookieJar(spark: SparkSession, dirs: Seq[String]): Dataset[CookieRow] = {
    import spark.implicits._
    if (dirs.isEmpty) spark.emptyDataset[CookieRow]
    else dirs.zipWithIndex.map { case (d, i) =>
      spark.read.schema(CookieSchema).parquet(d)
        .filter(!($"value" === "" && $"expiresMs".isNull)) // legacy tombstone
        .select($"host", $"name", $"value",
          coalesce($"path", lit("/")).as("path"),
          coalesce($"hostOnly", lit(true)).as("hostOnly"),
          coalesce($"expiresMs", lit(-1L)).as("expiresMs"),
          coalesce($"secure", lit(false)).as("secure"),
          // pre-cookiejar-meta chains have no jar column → default jar
          coalesce($"jar", lit("")).as("jar"))
        .withColumn("chainIdx", lit(i))
    }.reduce(_.unionByName(_))
      .groupBy($"jar", $"host", $"path", $"name")
      .agg(max_by(struct($"value", $"hostOnly", $"expiresMs", $"secure"),
        $"chainIdx").as("r"))
      .select($"host", $"name", $"r.value", $"path", $"r.hostOnly",
        $"r.expiresMs", $"r.secure", $"jar")
      .as[CookieRow]
  }

  /** HTTP-cache chain (contract 6d/6f). Under DummyPolicy stores are
    * disjoint appends (store-once: a stored fp always hits afterwards), so
    * the chain is a plain union — no shuffle, like the robots chain. Under
    * rfc2616 a stale entry's revalidation RE-stores the fp with a newer
    * storedTMs, so the read must resolve latest-wins (`latestWins = true`)
    * like host_state. At 10^10-fetch scale the rfc2616 chain should be
    * bucket-partitioned by fp like url_seen so this merge stays per-bucket;
    * the dummy path already avoids it entirely. */
  def readHttpCache(spark: SparkSession, dirs: Seq[String],
      latestWins: Boolean = true): DataFrame = {
    import spark.implicits._
    if (dirs.isEmpty)
      spark.emptyDataset[(String, Option[Long], Option[Int], Option[String])]
        .toDF("fpHex", "storedTMs", "status", "cacheControl")
    else if (!latestWins)
      dirs.map(d => spark.read.schema(HttpCacheSchema).parquet(d))
        .reduce(_.unionByName(_))
    else dirs.zipWithIndex.map { case (d, i) =>
      spark.read.schema(HttpCacheSchema).parquet(d).withColumn("chainIdx", lit(i))
    }.reduce(_.unionByName(_))
      .groupBy($"fpHex")
      .agg(max_by(struct($"storedTMs", $"status", $"cacheControl"),
        struct($"chainIdx", $"storedTMs")).as("r"))
      .select($"fpHex", $"r.storedTMs", $"r.status", $"r.cacheControl")
  }

  /** Initialize snapshot v0 from the ordered seed list. Start requests are
    * dont_filter=True (contract step 0: reference `Spider.start()` yields
    * `Request(url, dont_filter=True)`, `spiders/__init__.py:102-109`, and
    * the scheduler never consults the dupefilter for such requests,
    * `core/scheduler.py:343`) — so duplicate seed URLs each enqueue AND
    * fetch, and seed fingerprints are NOT recorded in url_seen: a later
    * organic link to a seeded URL is a dupefilter MISS and fetches again.
    * The v0 seen table is therefore EMPTY. */
  def init(spark: SparkSession, cfg: CrawlConfig, seeds: Dataset[SeedRow],
      root: String): Manifest = {
    import spark.implicits._
    val fpUdf = udf((u: String) => UrlKit.fingerprint(u))
    val hostUdf = udf((u: String) => UrlKit.hostOf(u))
    val frontier0 = seeds
      .withColumn("url", udf((u: String) => UrlKit.safeUrlString(u)).apply($"url"))
      .withColumn("fp", fpUdf($"url"))
      .withColumn("host", hostUdf($"url"))
      .select(
        $"url", $"fp", $"host", $"priority",
        lit(0).as("depth"), lit(true).as("isStart"),
        lit(-1).as("dEpoch"), $"seq".as("dParent"), lit(0).as("dLink"),
        lit(0).as("retryTimes"), lit(0).as("redirectTimes"),
        lit(true).as("dontFilter"),
        lit(null).cast("string").as("referer"),
        $"dontObeyRobots", lit(-1).as("ruleIdx"),
        $"cookieJar", $"dontMergeCookies",
        $"dontRedirect", $"dontRetry", $"maxRetryTimes",
        $"handleHttpstatus", $"dontCache", $"downloadSlot",
        $"downloadMaxSize",
        // start requests are plain GETs (contract 7g)
        lit("GET").as("method"), lit("").as("reqBody"),
        $"allowOffsite").as[FrontierRow]

    val fDir = dataDir(root, 0, "frontier")
    frontier0.write.mode(SaveMode.Overwrite).parquet(fDir)
    val nSeeds = spark.read.parquet(fDir).count()
    val seenDir = dataDir(root, 0, "seen")
    spark.emptyDataset[(String, Int)].toDF("fpHex", "bucket")
      .write.mode(SaveMode.Overwrite).parquet(seenDir)
    val hsDir = dataDir(root, 0, "host_state")
    spark.emptyDataset[HostState].write.mode(SaveMode.Overwrite).parquet(hsDir)
    val rcDir = dataDir(root, 0, "robots_cache")
    spark.emptyDataset[CrawlEngine.RobotsCacheRow].write.mode(SaveMode.Overwrite).parquet(rcDir)
    val cjDir = dataDir(root, 0, "cookie_jar")
    spark.emptyDataset[CookieRow].write.mode(SaveMode.Overwrite).parquet(cjDir)

    val m = Manifest(0, -1, fDir, Seq(seenDir), Seq(hsDir), Seq(rcDir), Nil, Nil,
      nextFetchSeq = 0L, frontierCount = nSeeds, pageFetches = 0L,
      counters = Map("scheduler/enqueued" -> nSeeds).filter(_._2 != 0),
      cookieJarDirs = Seq(cjDir))
    Snapshot.write(root, m)
    m
  }

  /** Run (or resume) the crawl until a stop condition. Returns the final
    * manifest. `corpusDir` must contain pages/, robots/, seeds/ (+ images/). */
  def run(spark: SparkSession, cfg: CrawlConfig, corpusDir: String,
      root: String, withMedia: Boolean = true,
      maxEpochsOverride: Option[Int] = None,
      // prime a fresh crawl with a prior crawl's HTTP-cache chain (the
      // reference's persistent HTTPCACHE_DIR across runs, contract 6d);
      // ignored on resume (the manifest's own chain wins)
      cachePrimeDirs: Seq[String] = Nil,
      // prime a fresh crawl with a prior crawl's media_seen chain (the
      // reference's persistent FILES_STORE across runs: stat_file sees the
      // earlier run's files); needs cfg.filesExpiresDays ≥ 0 to matter
      mediaPrimeDirs: Seq[String] = Nil,
      // the embedding "spider"'s hook over spider.state (`extensions/
      // spiderstate.py`): the state loaded at spider_opened is passed
      // through this just before spider_closed persists it — the batch
      // face of a spider mutating `self.state` during the crawl
      updateSpiderState: graft.operators.Py.PyDict => graft.operators.Py.PyDict =
        identity): RunResult = {
    import spark.implicits._
    // spider_opened: load the persisted spider.state (empty when absent)
    val spiderStateOpen = graft.plans.SpiderState.load(root)

    // Pre-partition the corpus ("the web") by its join key once and keep it
    // cached: every epoch's fetch join then reuses this partitioning and only
    // shuffles the politeness-bounded fetch batch. At real scale this is the
    // bucketed-table layout of the fetch-cache (SURVEY.md §4 partitioning).
    val joinParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pages = Snapshot.withDefaults(spark.read.parquet(s"$corpusDir/pages"),
        Seq("cacheControl" -> lit(null).cast("string"))) // pre-6f corpora
      .withColumnRenamed("url", "canonical")
      .repartition(joinParts, org.apache.spark.sql.functions.col("canonical"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val robotsCorpus = spark.read.parquet(s"$corpusDir/robots")
    val dns =
      if (new java.io.File(s"$corpusDir/dns").exists())
        spark.read.parquet(s"$corpusDir/dns")
      else null
    val images =
      if (withMedia && new java.io.File(s"$corpusDir/images").exists())
        spark.read.parquet(s"$corpusDir/images")
          .repartition(joinParts, org.apache.spark.sql.functions.col("image_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else null

    val epochStats = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var m = Snapshot.loadLatest(root).getOrElse {
      val m0 = init(spark, cfg,
        Snapshot.withDefaults(spark.read.parquet(s"$corpusDir/seeds"),
          Seq("dontObeyRobots" -> org.apache.spark.sql.functions.lit(false),
            "cookieJar" -> org.apache.spark.sql.functions.lit(""),
            "dontMergeCookies" -> org.apache.spark.sql.functions.lit(false),
            "dontRedirect" -> org.apache.spark.sql.functions.lit(false),
            "dontRetry" -> org.apache.spark.sql.functions.lit(false),
            "maxRetryTimes" -> org.apache.spark.sql.functions.lit(-1),
            "handleHttpstatus" -> org.apache.spark.sql.functions.lit(""),
            "dontCache" -> org.apache.spark.sql.functions.lit(false),
            "downloadSlot" -> org.apache.spark.sql.functions.lit(""),
            "downloadMaxSize" -> org.apache.spark.sql.functions.lit(-1L),
            "allowOffsite" -> org.apache.spark.sql.functions.lit(false)))
          .as[SeedRow], root)
      if (cachePrimeDirs.isEmpty && mediaPrimeDirs.isEmpty) m0
      else {
        val primed = m0.copy(
          httpCacheDirs = if (cachePrimeDirs.nonEmpty) cachePrimeDirs else m0.httpCacheDirs,
          mediaSeenDirs = if (mediaPrimeDirs.nonEmpty) mediaPrimeDirs else m0.mediaSeenDirs)
        Snapshot.write(root, primed)
        primed
      }
    }
    val maxEpochs = maxEpochsOverride.getOrElse(cfg.maxEpochs)

    // url_seen Bloom filter (advisory prescreen; exactness from the
    // anti-join), sharded per fp-bucket (graft.plans.BloomShards) — the same
    // bucketing the seen table is partitioned by, so the prescreen layout
    // survives a 10^10-fp seen set instead of saturating one bitmap. Each
    // shard's capacity GROWS with its bucket's exact seen count (saturated
    // shards are rebuilt from the bucket's seen partition, see below). Delta
    // shards are built distributed each epoch; resume restores the persisted
    // shard table (or rebuilds it per-bucket from the seen parquet, sized
    // from the actual per-bucket counts).
    import graft.plans.BloomShards
    val bloomItems = 4L * 1000 * 1000 // initial total; shards grow per bucket
    val bloomFpp = 0.03
    val shards: BloomShards =
      if (m.bloomPath.nonEmpty && new java.io.File(m.bloomPath).exists()) {
        BloomShards.load(spark, m.bloomPath, bloomItems, bloomFpp)
      } else if (m.seenDirs.nonEmpty &&
          readSeen(spark, m.seenDirs).limit(1).count() > 0) {
        val s = BloomShards.create(bloomItems, bloomFpp)
        val seenAll = readSeen(spark, m.seenDirs)
        val cnts = seenAll.groupBy("bucket").count()
          .as[(Int, Long)].collect().toMap
        val capOf = (b: Int) => BloomShards.grownCapacity(cnts.getOrElse(b, 0L))
        BloomShards.buildShards(spark, seenAll, capOf, bloomFpp).foreach(s.replace)
        s
      } else BloomShards.create(bloomItems, bloomFpp)
    // directory whose per-bucket shard files mirror the resident shards (the
    // bucket-local prescreen reads it on executors); empty = out of sync
    var bloomOnDisk: String =
      if (m.bloomPath.nonEmpty &&
        new java.io.File(m.bloomPath, "shard-000.bloom").exists()) m.bloomPath
      else ""

    // HTTP-cache-fp Bloom shards (round-4 verdict #1): with the cache ON,
    // per-epoch cache-membership resolution probes these shards first so
    // only maybe-cached frontier rows pay the exact join — O(cached slice),
    // not O(frontier) — and the per-slot cached counts bound the dequeue
    // admit (CrawlEngine.cacheAdmit). Advisory like the url_seen prescreen
    // (no false negatives ⇒ exactness from the join); rebuilt from the
    // chain at run start (covers resume AND cachePrimeDirs), grown per
    // bucket from per-epoch delta shards like the seen filter. At cache
    // sizes where broadcasting the shards would hurt (≫ bloomLocalMinBytes)
    // the same bucket-local shard-file layout BloomShards.save provides is
    // the escape hatch — not wired here because the probe would then need a
    // frontier exchange by fp bucket, which only pays off once the cache
    // rivals the frontier in size.
    val cacheBloomUdfBucket = udf((h: String) => Model.bucketOfHex(h))
    var cacheShards: graft.plans.BloomShards = null
    if (cfg.httpcacheEnabled) {
      cacheShards = BloomShards.create(bloomItems, bloomFpp)
      if (m.httpCacheDirs.nonEmpty) {
        val chain = readHttpCache(spark, m.httpCacheDirs, latestWins = false)
          .select(col("fpHex"))
          .withColumn("bucket", cacheBloomUdfBucket(col("fpHex")))
        val cnts = chain.groupBy("bucket").count().as[(Int, Long)].collect().toMap
        if (cnts.nonEmpty)
          BloomShards.buildShards(spark, chain,
            b => BloomShards.grownCapacity(cnts.getOrElse(b, 0L)), bloomFpp)
            .foreach(cacheShards.replace)
      }
    }

    // stop conditions (contract step 9) — evaluated at epoch boundaries on
    // manifest state; the returned reason is the CoreStats finish_reason
    // analogue, threshold reasons before "finished" (the order both sides
    // of the conformance pair implement)
    def stopReason(mm: Manifest): Option[String] =
      if (cfg.closespiderPageCount > 0 &&
          mm.pageFetches >= cfg.closespiderPageCount)
        Some("closespider_pagecount")
      else if (cfg.closespiderItemCount > 0 &&
          mm.counters.getOrElse("file_count", 0L) >= cfg.closespiderItemCount)
        Some("closespider_itemcount")
      else if (cfg.closespiderTimeoutS > 0 &&
          mm.virtualTMaxMs >= cfg.closespiderTimeoutS * 1000L)
        Some("closespider_timeout")
      else if (mm.frontierCount <= 0) Some("finished")
      else if (mm.snapshotId >= maxEpochs) Some("graft_max_epochs")
      else None
    while (stopReason(m).isEmpty) {
      val epoch = m.snapshotId
      val tEpoch = System.nanoTime()
      // withDefaults: resume from a pre-round-3/4 snapshot whose schema
      // predates delayMs / referer / dontObeyRobots (ADVICE r3)
      val frontier = Snapshot.withDefaults(spark.read.parquet(m.frontierDir),
        Seq("referer" -> lit(null).cast("string"),
          "dontObeyRobots" -> lit(false),
          "ruleIdx" -> lit(-1),
          "cookieJar" -> lit(""),
          "dontMergeCookies" -> lit(false),
          "dontRedirect" -> lit(false),
          "dontRetry" -> lit(false),
          "maxRetryTimes" -> lit(-1),
          "handleHttpstatus" -> lit(""),
          "dontCache" -> lit(false),
          "downloadSlot" -> lit(""),
          "downloadMaxSize" -> lit(-1L),
          "method" -> lit("GET"), // pre-7g snapshots are all-GET
          "reqBody" -> lit(""),
          "allowOffsite" -> lit(false))).as[FrontierRow]
      val urlSeen = readSeen(spark, m.seenDirs)
      // the merged host-state view feeds three joins inside the epoch (slot
      // state, delay updates, the next delta) — materialize the chain merge
      // once instead of re-running it per use
      val hostState = readHostState(spark, m.hostStateDirs).persist()
      val robotsCache = readRobotsCache(spark, m.robotsCacheDirs)
      val cookieJar = readCookieJar(spark, m.cookieJarDirs)
      // dummy chains never re-store a fp → plain-union read (no merge
      // shuffle); rfc2616 resolves latest-wins. Two joins consume the view
      // per epoch — persist the (politeness-relevant, fp-keyed) table once.
      val httpCache =
        if (!cfg.httpcacheEnabled) null
        else readHttpCache(spark, m.httpCacheDirs,
          latestWins = cfg.httpcachePolicy == "rfc2616").persist()

      // prescreen evaluation mode (engine sizing knob, ignored by the
      // oracle): broadcast while the resident filter is small — one
      // in-memory probe per candidate, no extra exchange; switch to
      // bucket-local shard files once it crosses bloomLocalMinBytes, so
      // executor memory stays bounded by resident-bucket size at 10^10 fps
      val useLocalBloom = cfg.bloomLocalMinBytes >= 0 &&
        shards.approxBytes >= cfg.bloomLocalMinBytes
      var bloomBc: org.apache.spark.broadcast.Broadcast[BloomShards] = null
      val bloomMode: CrawlEngine.BloomPrescreen =
        if (useLocalBloom) {
          if (bloomOnDisk.isEmpty) { // resume from pre-r4 format / fresh run
            val p = dataDir(root, epoch, "bloom_resident")
            BloomShards.save(spark, p, shards)
            bloomOnDisk = p
          }
          CrawlEngine.BucketLocalShards(bloomOnDisk)
        } else {
          bloomBc = spark.sparkContext.broadcast(shards)
          CrawlEngine.BroadcastShards(bloomBc)
        }
      val cacheBloomBc =
        if (cacheShards == null) None
        else Some(spark.sparkContext.broadcast(cacheShards))
      val mediaSeen =
        if (cfg.filesExpiresDays < 0 || m.mediaSeenDirs.isEmpty) null
        else readMediaSeen(spark, m.mediaSeenDirs).toDF()
      // lifetime offsite domains_seen (contract 7h): deltas are disjoint by
      // construction (each is anti-joined against the full prior chain), so
      // the read is a plain union like the robots chain
      val offsiteDoms =
        if (m.offsiteDomainsDirs.isEmpty) null
        else readOffsiteDomains(spark, m.offsiteDomainsDirs)
      val r = CrawlEngine.runEpoch(spark, cfg, epoch, m.nextFetchSeq,
        frontier, urlSeen, hostState, robotsCache, cookieJar, pages, robotsCorpus,
        dns, images, withMedia, Some(bloomMode), frontierCountHint = m.frontierCount,
        httpCache = httpCache, cacheBloom = cacheBloomBc, mediaSeen = mediaSeen,
        offsiteDomains = offsiteDoms)

      val timing = sys.env.contains("GRAFT_TIMING")
      var tW = System.nanoTime()
      def lapW(name: String): Unit = if (timing) {
        val now = System.nanoTime()
        System.err.println(f"[graft-timing] write:$name ${(now - tW) / 1e9}%.2fs")
        tW = now
      }
      val e1 = epoch + 1
      val fDir = dataDir(root, e1, "frontier")
      val seenDir = dataDir(root, e1, "seen_delta")
      val hsDir = dataDir(root, e1, "host_state_delta")
      val rcDir = dataDir(root, e1, "robots_cache_delta")
      val cjDir = dataDir(root, e1, "cookie_jar_delta")
      val hcDir = dataDir(root, e1, "http_cache_delta")
      val flDir = dataDir(root, e1, "fetch_log")
      val frontierCount = r.nextFrontierCount
      // the six snapshot tables are independent — write them as concurrent
      // Spark jobs (wall time = the slowest write, not the sum)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      // snapshot write parallelism scales with the session's shuffle
      // parallelism (≈ cluster size), not a hardcoded 8: the fetch log is
      // O(epoch fetches) — at 10^7-fetch epochs on a real cluster, 8 write
      // tasks would serialize the write phase. shufflePartitions/4 ≈ 8 on
      // this box (measured optimal: one local disk absorbs all writes — 8
      // tasks beat 16 by ~10%) and grows into the hundreds on a cluster
      // where each executor brings its own disk; GRAFT_WRITE_PARTS pins it
      // per substrate. Media decode is CPU-bound and never coalesced. Small
      // state tables (host_state/robots/cookies) stay at the floor to avoid
      // a thousand tiny files per epoch.
      val writeParts = sys.env.get("GRAFT_WRITE_PARTS").map(_.toInt)
        .getOrElse(math.max(8, joinParts / 4))
      val smallParts = 8
      val seenDelta = r.seenDelta.persist()
      val seenWrite = Future {
        // repartition BY BUCKET (not coalesce): each of the NumBuckets write
        // tasks owns exactly its bucket dir → one file per bucket per epoch,
        // the layout compaction/bloom-rebuild scans cheaply. (coalesce(k) ×
        // partitionBy would fan out to k × NumBuckets small files.)
        seenDelta.repartition(Model.NumBuckets, col("bucket"))
          .write.partitionBy("bucket")
          .mode(SaveMode.Overwrite).parquet(seenDir)
      }
      val writeJobs = scala.collection.mutable.ArrayBuffer[Future[Unit]](
        Future(r.nextFrontier.write.mode(SaveMode.Overwrite).parquet(fDir)),
        seenWrite,
        Future(r.hostStateDelta.coalesce(smallParts).write.mode(SaveMode.Overwrite).parquet(hsDir)),
        Future(r.robotsDelta.coalesce(smallParts).write.mode(SaveMode.Overwrite).parquet(rcDir)),
        Future(r.cookieDelta.coalesce(smallParts).write.mode(SaveMode.Overwrite).parquet(cjDir)),
        Future(r.fetchLog.coalesce(writeParts).write.mode(SaveMode.Overwrite).parquet(flDir)))
      if (r.httpCacheDelta != null)
        writeJobs += Future(r.httpCacheDelta.coalesce(smallParts)
          .write.mode(SaveMode.Overwrite).parquet(hcDir))
      var newMediaDir: String = null
      val mediaDirs =
        if (withMedia && images != null) {
          val mDir = dataDir(root, e1, "media")
          newMediaDir = mDir
          writeJobs += Future(r.media.write.mode(SaveMode.Overwrite).parquet(mDir))
          m.mediaDirs :+ mDir
        } else m.mediaDirs
      val msDir = dataDir(root, e1, "media_seen_delta")
      var mediaSeenDirs =
        if (r.mediaSeenDelta != null && withMedia && images != null) {
          writeJobs += Future(r.mediaSeenDelta.coalesce(smallParts)
            .write.mode(SaveMode.Overwrite).parquet(msDir))
          m.mediaSeenDirs :+ msDir
        } else m.mediaSeenDirs
      // merge this epoch's per-bucket delta filters into the resident shards
      // while the writes run (same parallel phase; the delta scan happens on
      // executors from the cached delta) — the save happens after the
      // saturation check below
      val bloomF = seenWrite.map { _ =>
        if (r.seenDeltaCount > 0) {
          val caps = shards.capacities // delta shards must match resident sizing
          BloomShards.buildShards(spark, seenDelta, b => caps(b), bloomFpp)
            .foreach(shards.merge)
        }
      }
      writeJobs.foreach(Await.result(_, Duration.Inf))
      Await.result(bloomF, Duration.Inf)
      seenDelta.unpersist(false)
      lapW("all-writes")

      // periodic url_seen compaction: PER-BUCKET merge of the delta chain —
      // one exchange keyed by the bucket the files are already laid out by
      // (at real scale a bucketed table makes even that exchange a no-op),
      // then a spillable within-partition sort + O(1)-memory adjacent dedup.
      // Never a global distinct over the full 10^10-fp seen set.
      var seenDirs = m.seenDirs :+ seenDir
      if (seenDirs.size > 8) {
        val cDir = dataDir(root, e1, "seen_compact")
        readSeen(spark, seenDirs)
          .repartition(Model.NumBuckets, $"bucket")
          .sortWithinPartitions($"fpHex")
          .as[(String, Int)]
          .mapPartitions { it =>
            var last: String = null
            it.filter { case (fpHex, _) =>
              val keep = fpHex != last
              last = fpHex
              keep
            }
          }
          .toDF("fpHex", "bucket")
          .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(cDir)
        seenDirs = Seq(cDir)
      }

      // state-table delta chains: append this epoch's delta; when a chain
      // passes 8 dirs, compact it to one merged dir (host_state/cookie_jar:
      // latest-entry-wins merge, tombstones dropped; robots: plain union) —
      // same policy as the url_seen chain above
      var hostStateDirs = m.hostStateDirs :+ hsDir
      if (hostStateDirs.size > 8) {
        val cDir = dataDir(root, e1, "host_state_compact")
        readHostState(spark, hostStateDirs).coalesce(smallParts)
          .write.mode(SaveMode.Overwrite).parquet(cDir)
        hostStateDirs = Seq(cDir)
      }
      var robotsCacheDirs = m.robotsCacheDirs :+ rcDir
      if (robotsCacheDirs.size > 8) {
        val cDir = dataDir(root, e1, "robots_cache_compact")
        readRobotsCache(spark, robotsCacheDirs).coalesce(smallParts)
          .write.mode(SaveMode.Overwrite).parquet(cDir)
        robotsCacheDirs = Seq(cDir)
      }
      var httpCacheDirs =
        if (r.httpCacheDelta != null) m.httpCacheDirs :+ hcDir else m.httpCacheDirs
      if (httpCacheDirs.size > 8) {
        val cDir = dataDir(root, e1, "http_cache_compact")
        readHttpCache(spark, httpCacheDirs,
            latestWins = cfg.httpcachePolicy == "rfc2616").coalesce(smallParts)
          .write.mode(SaveMode.Overwrite).parquet(cDir)
        httpCacheDirs = Seq(cDir)
      }
      // cache-fp Bloom upkeep (mirrors the seen-shard flow): merge this
      // epoch's store delta (politeness-bounded) at resident capacities;
      // rebuild any saturated bucket from the chain (membership only —
      // plain-union read; rfc2616 re-stores may double-count an fp, which
      // only triggers a rebuild early, never a false negative)
      if (cacheShards != null && r.httpCacheDelta != null) {
        val deltaDf = spark.read.schema(HttpCacheSchema).parquet(hcDir)
          .select(col("fpHex"))
          .withColumn("bucket", cacheBloomUdfBucket(col("fpHex")))
        val caps = cacheShards.capacities
        BloomShards.buildShards(spark, deltaDf, b => caps(b), bloomFpp)
          .foreach(cacheShards.merge)
        val sat = cacheShards.saturatedBuckets
        if (sat.nonEmpty) {
          val newCaps = sat.map(b =>
            b -> BloomShards.grownCapacity(cacheShards.counts(b))).toMap
          BloomShards.buildShards(spark,
            readHttpCache(spark, httpCacheDirs, latestWins = false)
              .select(col("fpHex"))
              .withColumn("bucket", cacheBloomUdfBucket(col("fpHex")))
              .filter(col("bucket").isin(sat: _*)),
            newCaps, bloomFpp).foreach(cacheShards.replace)
        }
      }
      var cookieJarDirs = m.cookieJarDirs :+ cjDir
      if (cookieJarDirs.size > 8) {
        val cDir = dataDir(root, e1, "cookie_jar_compact")
        readCookieJar(spark, cookieJarDirs).coalesce(smallParts)
          .write.mode(SaveMode.Overwrite).parquet(cDir)
        cookieJarDirs = Seq(cDir)
      }
      if (mediaSeenDirs.size > 8) {
        val cDir = dataDir(root, e1, "media_seen_compact")
        readMediaSeen(spark, mediaSeenDirs).coalesce(smallParts)
          .write.mode(SaveMode.Overwrite).parquet(cDir)
        mediaSeenDirs = Seq(cDir)
      }
      // offsite domains_seen chain (contract 7h): append this epoch's NEW
      // domains (already anti-joined in the engine — disjoint deltas);
      // compact by plain union like robots
      var offsiteDomainsDirs =
        if (r.offsiteDomainsDelta != null) {
          val odDir = dataDir(root, e1, "offsite_domains_delta")
          r.offsiteDomainsDelta.coalesce(1)
            .write.mode(SaveMode.Overwrite).parquet(odDir)
          m.offsiteDomainsDirs :+ odDir
        } else m.offsiteDomainsDirs
      if (offsiteDomainsDirs.size > 8) {
        val cDir = dataDir(root, e1, "offsite_domains_compact")
        readOffsiteDomains(spark, offsiteDomainsDirs).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(cDir)
        offsiteDomainsDirs = Seq(cDir)
      }

      // saturated-shard rebuild: a bucket whose exact seen count outgrew its
      // filter capacity gets a fresh 2×-headroom filter built from its full
      // seen partition — doubling means O(log n) rebuilds per bucket over the
      // whole crawl. Without this, a saturated shard's fpp → 1 and the
      // prescreen silently degrades to a no-op that still pays its UDF.
      val saturated = shards.saturatedBuckets
      if (saturated.nonEmpty) {
        val newCaps = saturated.map(b =>
          b -> BloomShards.grownCapacity(shards.counts(b))).toMap
        System.err.println(s"[graft] bloom rebuild: buckets=${saturated.size} " +
          s"maxNewCap=${newCaps.values.max}")
        BloomShards.buildShards(spark,
          readSeen(spark, seenDirs).filter(col("bucket").isin(saturated: _*)),
          newCaps, bloomFpp).foreach(shards.replace)
      }
      val bloomPath = dataDir(root, e1, "bloom")
      BloomShards.save(spark, bloomPath, shards)
      bloomOnDisk = bloomPath

      // CLOSESPIDER_ITEMCOUNT without FILES_EXPIRES (contract step 9): the
      // expiry-off media path is deliberately count-free (no extra job in
      // the bench hot path) — with the threshold armed, take the freshly
      // written media delta's row count from the parquet FOOTERS
      // (metadata-only, no data scan)
      val rCounters =
        if (cfg.closespiderItemCount > 0 && !r.counters.contains("file_count")
            && newMediaDir != null)
          r.counters + ("file_count" -> spark.read.parquet(newMediaDir).count())
        else r.counters
      val mergedCounters = (m.counters.keySet ++ rCounters.keySet).map { k =>
        // request_depth_max is a running MAX (reference stats.max_value,
        // contract 7e); everything else sums
        if (k == "request_depth_max")
          k -> math.max(m.counters.getOrElse(k, 0L), rCounters.getOrElse(k, 0L))
        else
          k -> (m.counters.getOrElse(k, 0L) + rCounters.getOrElse(k, 0L))
      }.toMap

      m = Manifest(e1, epoch, fDir, seenDirs, hostStateDirs, robotsCacheDirs,
        m.fetchLogDirs :+ flDir, mediaDirs,
        r.nextFetchSeq, frontierCount, m.pageFetches + r.pageFetchCount,
        mergedCounters, bloomPath, cookieJarDirs = cookieJarDirs,
        httpCacheDirs = httpCacheDirs, mediaSeenDirs = mediaSeenDirs,
        offsiteDomainsDirs = offsiteDomainsDirs,
        // virtual high-water mark is a running MAX (contract step 9)
        virtualTMaxMs = math.max(m.virtualTMaxMs, r.virtualTMaxMs))
      Snapshot.write(root, m)
      if (bloomBc != null) bloomBc.destroy()
      cacheBloomBc.foreach(_.destroy())
      hostState.unpersist(false)
      if (httpCache != null) httpCache.unpersist(false)
      r.cleanup() // drop only this epoch's caches; the corpus stays resident
      val epochSecs = (System.nanoTime() - tEpoch) / 1e9
      epochStats += ((r.pageFetchCount, epochSecs))
      val prescreen =
        if (r.prescreenDefNew < 0) ""
        else {
          val tot = r.prescreenDefNew + r.prescreenMaybe
          val rate = if (tot == 0) 1.0 else r.prescreenDefNew.toDouble / tot
          f" prescreenNew=${r.prescreenDefNew} maybe=${r.prescreenMaybe} " +
            f"hitRate=$rate%.3f"
        }
      System.err.println(f"[graft] epoch=$epoch fetches=${r.pageFetchCount} " +
        f"frontier=$frontierCount secs=$epochSecs%.2f$prescreen")
    }
    pages.unpersist(false)
    if (images != null) images.unpersist(false)
    // record the finish reason on the final manifest (CoreStats
    // finish_reason analogue) — same snapshot id, atomic replace
    val reason = stopReason(m).getOrElse("finished")
    if (m.finishReason != reason) {
      m = m.copy(finishReason = reason)
      Snapshot.write(root, m)
    }
    // spider_closed: persist spider.state (pickle protocol 4, CPython
    // byte-compatible) — the reference dumps unconditionally
    val spiderStateClosed = updateSpiderState(spiderStateOpen)
    graft.plans.SpiderState.save(root, spiderStateClosed)
    RunResult(m, root, epochStats.toSeq, spiderStateClosed)
  }

  /** Full fetch log of a finished run, ordered. */
  def fetchLog(spark: SparkSession, m: Manifest): DataFrame = {
    if (m.fetchLogDirs.isEmpty) spark.emptyDataFrame
    else Snapshot.withDefaults(spark.read.parquet(m.fetchLogDirs: _*),
      // pre-7g fetch logs predate the method column (all-GET crawls);
      // pre-6a-split logs predate proxyAuth (credential-less proxies)
      Seq("method" -> org.apache.spark.sql.functions.lit("GET"),
        "proxyAuth" -> org.apache.spark.sql.functions.lit(null)
          .cast("string")))
      .orderBy("seq")
  }
}

/** spark-submit entry point:
  * `runMain graft.CrawlMain <corpusDir> <snapshotRoot> [maxEpochs] [cpus]` */
object CrawlMainHolder {
  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-crawl")
    .config("spark.sql.shuffle.partitions", math.max(cpus.toIntOption.getOrElse(8) * 2, 8))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
