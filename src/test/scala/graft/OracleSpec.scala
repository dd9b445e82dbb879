package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{Corpus, CorpusSpec}
import graft.oracle.Oracle
import graft.urlkit.UrlKit

class OracleSpec extends AnyFunSuite {

  def runSpec(spec: CorpusSpec, cfg: CrawlConfig): Oracle.Result = {
    val pages = Corpus.allPages(spec).map(p => p.url -> p).toMap
    Oracle.run(cfg, Corpus.seeds(spec), pages, Corpus.allRobots(spec))
  }

  test("tiny corpus crawl terminates and fetches pages in order") {
    val r = runSpec(Corpus.Tiny, CrawlConfig(maxEpochs = 50))
    assert(r.fetchLog.nonEmpty)
    // seq strictly increasing, epochs non-decreasing
    assert(r.fetchLog.map(_.seq) === r.fetchLog.indices.map(_.toLong))
    assert(r.fetchLog.map(_.epoch) === r.fetchLog.map(_.epoch).sorted)
    // politeness: per-host fetch times strictly increasing, spaced >= delay
    val cfg = CrawlConfig()
    for ((_, rows) <- r.fetchLog.groupBy(_.host)) {
      val ts = rows.sortBy(_.seq).map(_.virtualTMs)
      ts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= cfg.delayMs, s"politeness violated: $a -> $b")
        case _ =>
      }
    }
    // a robots fetch happens before any page fetch of that host
    for ((host, rows) <- r.fetchLog.groupBy(_.host)) {
      val first = rows.minBy(_.seq)
      assert(first.isRobots, s"first fetch on $host should be robots.txt")
    }
  }

  test("determinism: same inputs, same log") {
    val a = runSpec(Corpus.Tiny, CrawlConfig(maxEpochs = 20))
    val b = runSpec(Corpus.Tiny, CrawlConfig(maxEpochs = 20))
    // Array[Byte] fields need value comparison — normalize to hex
    def norm(r: Oracle.Result) =
      r.fetchLog.map(f => (f.epoch, f.seq, f.host, f.url, UrlKit.toHex(f.fp),
        f.virtualTMs, f.status, f.isRobots))
    assert(norm(a) === norm(b))
    assert(a.urlSeen === b.urlSeen)
    assert(a.counters === b.counters)
  }

  test("trap URLs collapse: no two page fetches share a fingerprint") {
    val r = runSpec(Corpus.Small, CrawlConfig(maxEpochs = 6))
    // start requests are dont_filter=True and their fps never enter url_seen
    // (contract step 0) — a seeded URL rediscovered organically via a trap
    // variant legitimately fetches AGAIN under the same fp, so seed fps are
    // exempt from the one-url-per-fp invariant
    val seedFps = Corpus.seeds(Corpus.Small).map(s =>
      UrlKit.toHex(UrlKit.fingerprint(UrlKit.safeUrlString(s.url)))).toSet
    val pageFps = r.fetchLog.filterNot(_.isRobots)
      // retries legitimately re-fetch the same fp
      .groupBy(f => UrlKit.toHex(f.fp))
    for ((fp, rows) <- pageFps if rows.size > 1 && !seedFps(fp)) {
      // re-fetches of one fp only via retry (same url, 503 then later)
      assert(rows.map(_.url).distinct.size === 1, s"fp $fp fetched with different urls")
    }
    // the exemption must be exercised: at least one seed fp re-fetched via a
    // canonically-equal variant (that's what step 0 changes observably)
    assert(pageFps.exists { case (fp, rows) =>
      seedFps(fp) && rows.map(_.url).distinct.size > 1 },
      "no seed fp was organically re-fetched — step-0 exemption unexercised")
  }

  test("small corpus: counters are consistent") {
    val r = runSpec(Corpus.Small, CrawlConfig(maxEpochs = 8))
    val c = r.counters
    assert(c("scheduler/dequeued") > 0)
    assert(c("dupefilter/filtered") > 0, "corpus must exercise the dupefilter")
    assert(c("robotstxt/forbidden") > 0, "corpus must exercise robots filtering")
    assert(c.getOrElse("retry/count", 0L) > 0, "corpus must exercise retries")
    // every non-robots fetch was dequeued
    val pageFetches = r.fetchLog.count(!_.isRobots)
    assert(pageFetches + c("robotstxt/forbidden") === c("scheduler/dequeued"))
    // url_seen >= enqueued without dontFilter retries
    assert(r.urlSeen.size.toLong <= c("scheduler/enqueued"))
  }

  test("depth limit stops expansion; BFO vs DFO differ") {
    val dfo = runSpec(Corpus.Tiny, CrawlConfig(maxEpochs = 10, depthLimit = 2))
    assert(dfo.epochs <= 10)
    val bfo = runSpec(Corpus.Tiny,
      CrawlConfig(maxEpochs = 10, depthLimit = 2, queueOrder = "fifo", depthPriority = 1))
    // same url-seen universe is not guaranteed (budget cutoffs), but both run
    assert(bfo.fetchLog.nonEmpty && dfo.fetchLog.nonEmpty)
  }
}
