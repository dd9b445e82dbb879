package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{Corpus, CorpusWriter}
import graft.operators.CrawlDriver

/** FILES_EXPIRES media reuse (reference `pipelines/files.py:539-567`
  * media_to_download uptodate path): a crawl primed with a prior crawl's
  * media_seen chain re-downloads ONLY expired media; fresh media replay
  * stored metadata without decode. */
class MediaExpirySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = Corpus.Tiny
  private lazy val corpusDir = {
    val d = TestSpark.tempDir("corpus-mediaexp")
    CorpusWriter.writeAll(spark, spec, d, withImages = true)
    d
  }
  private val dayMs = 86400000L

  test("expiry off: no file counters, no media_seen chain (plan unchanged)") {
    val res = CrawlDriver.run(spark, CrawlConfig(maxEpochs = 6), corpusDir,
      TestSpark.tempDir("snap-mexp-off"), withMedia = true)
    assert(res.manifest.mediaSeenDirs.isEmpty)
    assert(!res.manifest.counters.keys.exists(_.startsWith("file_")))
  }

  test("primed re-crawl: all-fresh replays, all-expired re-downloads, mixed splits exactly") {
    val cfg = CrawlConfig(maxEpochs = 10, filesExpiresDays = 1)
    // ---- crawl 1: cold store — everything downloads --------------------
    val r1 = CrawlDriver.run(spark, cfg, corpusDir,
      TestSpark.tempDir("snap-mexp-1"), withMedia = true)
    val media1 = spark.read.parquet(r1.manifest.mediaDirs: _*)
      .as[MediaRow].collect().sortBy(r => (r.image_id, r.url))
    assert(media1.nonEmpty)
    assert(r1.manifest.mediaSeenDirs.nonEmpty)
    // contract step 0: seeded URLs rediscovered organically re-fetch (seed
    // fps never enter url_seen), so even the COLD crawl re-meets a few
    // image pages — their first fetch downloads+stores, the re-fetch hits
    // the fresh self-stored entry (files.py stat_file age 0 → uptodate).
    // file_count counts every media event; downloads = distinct images.
    val distinctIds = media1.map(_.image_id).distinct.length.toLong
    assert(distinctIds < media1.length.toLong,
      "expected step-0 re-fetches of image pages in the cold crawl")
    assert(r1.manifest.counters("file_count") === media1.length.toLong)
    assert(r1.manifest.counters("file_status_count/downloaded") === distinctIds)
    assert(r1.manifest.counters("file_status_count/uptodate") ===
      media1.length.toLong - distinctIds)
    val seen1 = CrawlDriver.readMediaSeen(spark, r1.manifest.mediaSeenDirs).collect()
    assert(seen1.map(_.image_id).sorted === media1.map(_.image_id).distinct.sorted.toSeq)

    // ---- crawl 2: primed, same virtual timeline — every stored row is
    // re-met at exactly its storing t (deterministic walk) → age 0, all
    // uptodate, zero decodes, metadata replayed byte-identically ----------
    val r2 = CrawlDriver.run(spark, cfg, corpusDir,
      TestSpark.tempDir("snap-mexp-2"), withMedia = true,
      mediaPrimeDirs = r1.manifest.mediaSeenDirs)
    assert(r2.manifest.counters("file_status_count/uptodate") === media1.length.toLong)
    assert(!r2.manifest.counters.contains("file_status_count/downloaded"))
    val media2 = spark.read.parquet(r2.manifest.mediaDirs: _*)
      .as[MediaRow].collect().sortBy(r => (r.image_id, r.url))
    assert(media2.toSeq === media1.toSeq, "uptodate replay must reproduce rows")

    // ---- crawl 3: primed, clock 2 days later — every primed row expired:
    // each image's FIRST fetch re-downloads (and re-stores at the walk t);
    // the step-0 re-fetches then hit the fresh self-stored entries again
    val r3 = CrawlDriver.run(spark,
      cfg.copy(virtualClockStartMs = 2 * dayMs), corpusDir,
      TestSpark.tempDir("snap-mexp-3"), withMedia = true,
      mediaPrimeDirs = r1.manifest.mediaSeenDirs)
    assert(r3.manifest.counters("file_status_count/downloaded") === distinctIds)
    assert(r3.manifest.counters("file_status_count/uptodate") ===
      media1.length.toLong - distinctIds)
    // the re-download refreshed the chain: latest-wins storedTMs moved by 2 days
    val seen3 = CrawlDriver.readMediaSeen(spark, r3.manifest.mediaSeenDirs)
      .collect().map(s => s.image_id -> s.storedTMs).toMap
    val seen1T = seen1.map(s => s.image_id -> s.storedTMs).toMap
    assert(seen3 === seen1T.map { case (k, v) => k -> (v + 2 * dayMs) })

    // ---- crawl 4: mixed-age store (production shape: entries from runs
    // at different times) — EXACTLY the aged half re-downloads ------------
    val aged = seen1.map(_.image_id).sorted.zipWithIndex
      .collect { case (id, i) if i % 2 == 0 => id }.toSet
    val agedDir = TestSpark.tempDir("mexp-aged-delta")
    spark.createDataset(seen1.toSeq.map(s =>
        if (aged(s.image_id)) s.copy(storedTMs = s.storedTMs - 2 * dayMs) else s))
      .write.mode("overwrite").parquet(agedDir)
    val r4 = CrawlDriver.run(spark, cfg, corpusDir,
      TestSpark.tempDir("snap-mexp-4"), withMedia = true,
      mediaPrimeDirs = Seq(agedDir))
    assert(r4.manifest.counters("file_status_count/downloaded") === aged.size.toLong)
    assert(r4.manifest.counters("file_status_count/uptodate") ===
      (media1.length - aged.size).toLong)
    // only expired media re-downloaded: the re-store puts each aged id back
    // at its crawl-timeline t (== seen1's, deterministic walk) while fresh
    // ids keep their primed entry — the merged chain equals seen1 exactly
    val seen4 = CrawlDriver.readMediaSeen(spark, r4.manifest.mediaSeenDirs)
      .collect().map(s => s.image_id -> s.storedTMs).toMap
    assert(seen4 === seen1T)
    // and the media output is still the full, correct row set
    val media4 = spark.read.parquet(r4.manifest.mediaDirs: _*)
      .as[MediaRow].collect().sortBy(r => (r.image_id, r.url))
    assert(media4.toSeq === media1.toSeq)
  }
}
