package graft.corpus

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import graft._

/** Distributed corpus materialization: every row is a pure function of
  * (spec, index), so generation parallelizes with `spark.range` and no
  * cross-partition state. Written once per spec, read by the engine.
  */
object CorpusWriter {

  /** (host k, page j) for a flattened page index, via prefix offsets. */
  private def offsets(spec: CorpusSpec): Array[Int] = {
    val off = new Array[Int](spec.nHosts + 1)
    var k = 0
    while (k < spec.nHosts) { off(k + 1) = off(k) + spec.pagesOnHost(k); k += 1 }
    off
  }

  def writeAll(spark: SparkSession, spec: CorpusSpec, dir: String,
      withImages: Boolean = true): Unit = {
    import spark.implicits._
    val off = offsets(spec)
    val bcOff = spark.sparkContext.broadcast(off)
    val total = off(spec.nHosts)

    val pages: Dataset[PageRow] = spark.range(0, total + spec.nHosts * 5L)
      .mapPartitions { it =>
        val o = bcOff.value
        it.map { gi =>
          if (gi < o(spec.nHosts)) {
            // binary search host
            var lo = 0; var hi = spec.nHosts
            while (lo + 1 < hi) {
              val mid = (lo + hi) / 2
              if (o(mid) <= gi) lo = mid else hi = mid
            }
            Corpus.page(spec, lo, (gi - o(lo)).toInt)
          } else {
            val r = gi - o(spec.nHosts)
            Corpus.privatePage(spec, (r / 5).toInt, (r % 5).toInt)
          }
        }
      }
    pages.write.mode(SaveMode.Overwrite).parquet(s"$dir/pages")

    if (withImages) {
      spark.range(0, total.toLong)
        .mapPartitions(it => it.map(gi => Corpus.image(spec, gi.toInt)))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/images")
    }

    spark.range(0, spec.nHosts.toLong)
      .flatMap(k => Corpus.robots(spec, k.toInt).map(b => RobotsRow(spec.hostName(k.toInt), b)))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/robots")

    spark.range(0, spec.nHosts.toLong)
      .flatMap(k => Corpus.dnsIp(spec, k.toInt)
        .map(ip => (spec.hostName(k.toInt), ip)))
      .toDF("host", "ip")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/dns")

    spark.createDataset(Corpus.seeds(spec))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/seeds")
  }
}
