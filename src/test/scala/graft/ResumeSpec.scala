package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{Corpus, CorpusWriter}
import graft.operators.CrawlDriver
import graft.media.{ImageOps, Phash}

/** Snapshot/resume semantics (north rule: "checkpointed per-partition ...
  * so a killed job resumes exactly") + media-row invariants on a real run. */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kill after 3 epochs, resume → identical final state as uninterrupted run") {
    import spark.implicits._
    val corpusDir = TestSpark.tempDir("corpus-resume")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = false)
    val cfg = CrawlConfig(maxEpochs = 30)

    // uninterrupted
    val rootA = TestSpark.tempDir("snap-uninterrupted")
    val a = CrawlDriver.run(spark, cfg, corpusDir, rootA, withMedia = false)

    // interrupted after 3 epochs, then resumed (fresh driver call = new JVM
    // semantics: state only from the manifest)
    val rootB = TestSpark.tempDir("snap-resumed")
    CrawlDriver.run(spark, cfg, corpusDir, rootB, withMedia = false,
      maxEpochsOverride = Some(3))
    val b = CrawlDriver.run(spark, cfg, corpusDir, rootB, withMedia = false)

    assert(a.manifest.snapshotId === b.manifest.snapshotId)
    assert(a.manifest.pageFetches === b.manifest.pageFetches)
    assert(a.manifest.counters === b.manifest.counters)
    // full row incl. Referer/Cookie headers: pins that the cookie jar and
    // referer state survive the kill/resume boundary exactly
    val logA = CrawlDriver.fetchLog(spark, a.manifest)
      .select($"seq", $"url", $"virtualTMs", $"status", $"referer", $"cookies")
      .as[(Long, String, Long, Int, Option[String], Option[String])].collect().toSeq
    val logB = CrawlDriver.fetchLog(spark, b.manifest)
      .select($"seq", $"url", $"virtualTMs", $"status", $"referer", $"cookies")
      .as[(Long, String, Long, Int, Option[String], Option[String])].collect().toSeq
    assert(logA === logB)
    val seenA = CrawlDriver.readSeen(spark, a.manifest.seenDirs)
      .select("fpHex").as[String].collect().toSet
    val seenB = CrawlDriver.readSeen(spark, b.manifest.seenDirs)
      .select("fpHex").as[String].collect().toSet
    assert(seenA === seenB)
  }

  test("resume from a pre-round-3 snapshot schema (missing columns backfilled)") {
    import spark.implicits._
    val corpusDir = TestSpark.tempDir("corpus-migrate")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = false)
    val cfg = CrawlConfig(maxEpochs = 30)

    val rootA = TestSpark.tempDir("snap-migrate-full")
    val a = CrawlDriver.run(spark, cfg, corpusDir, rootA, withMedia = false)

    val rootB = TestSpark.tempDir("snap-migrate-old")
    CrawlDriver.run(spark, cfg, corpusDir, rootB, withMedia = false,
      maxEpochsOverride = Some(3))
    // age the snapshot to the round-2 schema: drop the columns round 3+
    // added (HostState.delayMs, BloomShardRow.capacity/n) — resume must
    // backfill their defaults instead of throwing an analysis error
    val m = graft.plans.Snapshot.loadLatest(rootB).get
    def rewriteWithout(dir: String, cols: Seq[String]): Unit = {
      val tmp = dir + ".tmp-old"
      spark.read.parquet(dir).drop(cols: _*)
        .write.mode("overwrite").parquet(tmp)
      val p = java.nio.file.Paths.get(dir)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), p)
    }
    m.hostStateDirs.foreach(d => rewriteWithout(d, Seq("delayMs")))
    // frontier: drop the round-3/4 request-meta columns (referer,
    // dontObeyRobots, ruleIdx) — resume backfills null/false/-1; on this
    // corpus (no bypass seeds, no rules) final counts/counters are unchanged
    rewriteWithout(m.frontierDir, Seq("referer", "dontObeyRobots", "ruleIdx"))
    // bloom: rewrite the binary shard dir as the round-2-era parquet table
    // WITHOUT capacity/n columns — load must detect the old format and
    // backfill sizing from defaults. The filter CONTENTS must carry over:
    // the prescreen's exactness rests on the persisted filter being a
    // superset of the seen set (a real old snapshot satisfies that), so the
    // aging only changes the format, not the bits
    locally {
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      val rows = (0 until Model.NumBuckets).flatMap { b =>
        graft.plans.BloomShards.loadBucket(m.bloomPath, b, conf)
          .map { case (f, _, _) => (b, graft.plans.BloomShards.toBytes(f)) }
      }
      val p = java.nio.file.Paths.get(m.bloomPath)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      rows.toDF("bucket", "bits").write.parquet(m.bloomPath)
    }
    val b = CrawlDriver.run(spark, cfg, corpusDir, rootB, withMedia = false)
    // AutoThrottle is off (delayMs is semantically -1 throughout) and the
    // bloom filter is advisory, so the final state must match exactly —
    // EXCEPT downloader/request_bytes (contract 6h counts the Referer
    // header per fetch, and the aged snapshot's frontier legitimately LOST
    // its referer values to the null backfill): the resumed total must be
    // strictly smaller by the missing Referer header bytes, everything else
    // byte-equal
    assert(a.manifest.pageFetches === b.manifest.pageFetches)
    val key = "downloader/request_bytes"
    assert(a.manifest.counters - key === b.manifest.counters - key)
    assert(b.manifest.counters(key) < a.manifest.counters(key),
      "backfilled-referer resume should count fewer request bytes")
  }

  test("an orphaned (uncommitted) epoch directory is ignored on resume") {
    import spark.implicits._
    val corpusDir = TestSpark.tempDir("corpus-orphan")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = false)
    val cfg = CrawlConfig(maxEpochs = 30)
    val root = TestSpark.tempDir("snap-orphan")
    CrawlDriver.run(spark, cfg, corpusDir, root, withMedia = false,
      maxEpochsOverride = Some(2))
    // simulate a crash mid-epoch-3: data written, manifest NOT committed
    val junk = CrawlDriver.dataDir(root, 3, "frontier")
    spark.range(5).map(i => s"junk$i").write.parquet(junk)
    val resumed = CrawlDriver.run(spark, cfg, corpusDir, root, withMedia = false)
    // the resumed run overwrote the junk and completed normally
    assert(resumed.manifest.frontierCount === 0)
    assert(resumed.manifest.pageFetches > 0)
  }

  test("media rows satisfy the input_hint invariants on a real crawl") {
    import spark.implicits._
    val corpusDir = TestSpark.tempDir("corpus-media")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = true)
    val root = TestSpark.tempDir("snap-media")
    val res = CrawlDriver.run(spark, CrawlConfig(maxEpochs = 10), corpusDir, root,
      withMedia = true)
    assert(res.manifest.mediaDirs.nonEmpty)
    val media = spark.read.parquet(res.manifest.mediaDirs: _*).as[MediaRow].collect()
    assert(media.nonEmpty, "crawl should persist media rows")
    val images = spark.read.parquet(s"$corpusDir/images").as[ImageRow]
      .collect().map(i => i.image_id -> i).toMap
    for (mrow <- media) {
      val img = images(mrow.image_id)
      // caption byte-equality
      assert(mrow.caption === img.caption, s"caption mismatch for ${mrow.image_id}")
      // dims from decode match corpus dims
      assert((mrow.w, mrow.h) === ((img.w, img.h)))
      // md5 checksum of stored bytes (files.py:61-75 semantics)
      assert(mrow.checksumMd5 === ImageOps.md5Hex(img.bytes))
      // phash: exact for png, near for jpeg (decode-side recompute)
      val d = Phash.hamming(mrow.phash, img.phash)
      if (img.fmt == "png") assert(d === 0, s"png phash must be exact (${mrow.image_id})")
      else assert(d <= 8, s"jpeg phash drifted $d bits (${mrow.image_id})")
      // PSNR >= 40 dB for lossy vs original procedural pixels
      val gIdx = mrow.image_id.drop(3).toInt
      val orig = Corpus.pixels(Corpus.Tiny, gIdx)
      val dec = ImageOps.decode(img.bytes).get
      assert(ImageOps.psnr(orig, dec) >= 40.0, s"PSNR < 40dB for ${mrow.image_id}")
    }
  }
}
