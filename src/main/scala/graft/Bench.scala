package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusWriter
import graft.operators.CrawlDriver

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  *  - `queries`: per-query wall seconds of every SparkEntry query on
  *    SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS].
  *  - crawl throughput (frontier URLs processed/sec) on a generated bench
  *    corpus at two parallelism levels (N and 4N cores, same input), plus
  *    scaling efficiency = thr(4N) / (4 · thr(N)) — the sandbox stand-in for
  *    the north rule's two-cluster-size criterion (see BASELINE.md).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 2, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def crawlThroughput(cpus: Int, corpusDir: String, epochs: Int): (Double, Long) = {
    val root = java.nio.file.Files.createTempDirectory(s"bench-snap-$cpus").toString
    val spark = session(cpus)
    val t0 = System.nanoTime()
    val res = CrawlDriver.run(spark, CrawlConfig(), corpusDir, root,
      withMedia = false, maxEpochsOverride = Some(epochs))
    val secs = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (res.manifest.pageFetches / secs, res.manifest.pageFetches)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "60000").toInt
    val benchEpochs = sys.env.getOrElse("SPARK_GRAFT_BENCH_EPOCHS", "4").toInt

    // ---- 1) operator queries on the sf tables -----------------------------
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val queriesSecs = results.map(_._2).sum

    // ---- 2) crawl scaling: N vs 4N cores on the same corpus ---------------
    val corpusDir = java.nio.file.Files.createTempDirectory("bench-corpus").toString
    CorpusWriter.writeAll(spark, CrawlMain.specOf(s"bench:$benchPages"),
      corpusDir, withImages = false)
    spark.stop()

    val n = math.max(cpus / 4, 1)
    val (thrN, fetchesN) = crawlThroughput(n, corpusDir, benchEpochs)
    val (thr4N, fetches4N) = crawlThroughput(cpus, corpusDir, benchEpochs)
    val efficiency = thr4N / (4.0 * thrN)
    require(fetchesN == fetches4N,
      s"parallelism changed the crawl! $fetchesN vs $fetches4N") // determinism guard

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    println(
      f"""{"metric":"crawl_urls_per_sec","value":$thr4N%.1f,"unit":"urls/sec","queries":$qs,"sf":"$sfDir","queries_total_sec":$queriesSecs%.1f,"crawl":{"pages":$benchPages,"epochs":$benchEpochs,"fetches":$fetches4N,"throughput_n":$thrN%.1f,"throughput_4n":$thr4N%.1f,"cores_n":$n,"cores_4n":$cpus,"scaling_efficiency":$efficiency%.3f}}""")
  }
}
