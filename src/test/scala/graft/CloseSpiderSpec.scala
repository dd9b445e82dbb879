package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{Corpus, CorpusWriter}
import graft.operators.CrawlDriver

/** CloseSpider threshold analogues + CoreStats finish_reason (contract
  * step 9, reference `extensions/closespider.py` / `corestats.py`): all
  * thresholds cut at EPOCH boundaries — the epoch that crosses completes
  * first — and the recorded reason follows the documented precedence. The
  * virtual-clock CLOSESPIDER_TIMEOUT is additionally pinned engine-vs-
  * oracle by the `closetimeout` conformance variant. */
class CloseSpiderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("natural exhaustion records finish_reason=finished") {
    val corpusDir = TestSpark.tempDir("corpus-close-fin")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = false)
    val res = CrawlDriver.run(spark, CrawlConfig(maxEpochs = 50), corpusDir,
      TestSpark.tempDir("snap-close-fin"), withMedia = false)
    assert(res.manifest.frontierCount === 0L)
    assert(res.manifest.finishReason === "finished")
    // the virtual high-water mark advanced and persisted
    assert(res.manifest.virtualTMaxMs > 0L)
  }

  test("CLOSESPIDER_PAGECOUNT cut records its reason and overshoots only within the final epoch") {
    val corpusDir = TestSpark.tempDir("corpus-close-pc")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = false)
    val res = CrawlDriver.run(spark,
      CrawlConfig(maxEpochs = 50, closespiderPageCount = 5), corpusDir,
      TestSpark.tempDir("snap-close-pc"), withMedia = false)
    assert(res.manifest.finishReason === "closespider_pagecount")
    assert(res.manifest.pageFetches >= 5L)
    assert(res.manifest.frontierCount > 0L, "crawl should have been cut early")
  }

  test("CLOSESPIDER_ITEMCOUNT cuts on stored media items (file_count)") {
    val corpusDir = TestSpark.tempDir("corpus-close-ic")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = true)
    // unrestricted baseline: how many items a full Tiny crawl stores (the
    // expiry-off path is count-free by design — count the media rows)
    val full = CrawlDriver.run(spark, CrawlConfig(maxEpochs = 50), corpusDir,
      TestSpark.tempDir("snap-close-ic-full"), withMedia = true)
    val fullItems = spark.read.parquet(full.manifest.mediaDirs: _*).count()
    assert(fullItems > 3L, s"Tiny corpus stored only $fullItems items")
    val res = CrawlDriver.run(spark,
      CrawlConfig(maxEpochs = 50, closespiderItemCount = 3), corpusDir,
      TestSpark.tempDir("snap-close-ic"), withMedia = true)
    assert(res.manifest.finishReason === "closespider_itemcount")
    val items = res.manifest.counters.getOrElse("file_count", 0L)
    assert(items >= 3L && items < fullItems,
      s"cut run stored $items of $fullItems — threshold did not bite early")
  }

  test("precedence: pagecount beats itemcount beats timeout when all hold") {
    val corpusDir = TestSpark.tempDir("corpus-close-prec")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = true)
    val res = CrawlDriver.run(spark,
      CrawlConfig(maxEpochs = 50, closespiderPageCount = 1,
        closespiderItemCount = 1, closespiderTimeoutS = 1), corpusDir,
      TestSpark.tempDir("snap-close-prec"), withMedia = true)
    assert(res.manifest.finishReason === "closespider_pagecount")
  }
}
