package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{BloomShardRow, BloomShards}

/** Sharded url_seen Bloom prescreen: per-bucket capacity tracking, the
  * saturation → rebuild path, and the no-false-negatives invariant the
  * prescreen's exactness argument rests on. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val fpp = 0.03

  /** (fpHex, bucket) of synthetic url #i — one fingerprint authority. */
  private def fpOf(i: Int): (String, Int) = {
    val fp = graft.urlkit.UrlKit.fingerprint(s"http://h${i % 97}.test/p/$i")
    (graft.urlkit.UrlKit.toHex(fp), Model.bucketOf(fp))
  }

  private def seenDf(n: Int, offset: Int = 0) = {
    import spark.implicits._
    (0 until n).map(i => fpOf(i + offset)).toDF("fpHex", "bucket")
  }

  test("distributed shard build tracks exact per-bucket counts and capacities") {
    val shards = BloomShards.create(64L * 1024, fpp) // 1024 per shard
    val df = seenDf(20000)
    val rows = BloomShards.buildShards(spark, df, b => shards.capacities(b), fpp)
    rows.foreach(shards.merge)
    assert(shards.counts.sum === 20000L)
    // every inserted fp must hit (no false negatives — exactness invariant)
    for (i <- 0 until 20000 by 37) {
      val (hex, b) = fpOf(i)
      assert(shards.mightContain(b, hex), s"false negative at $i")
    }
  }

  test("saturation is detected and the rebuild restores nominal fpp") {
    // shards sized for 1024 items each take ~312k fps (≈4.9k/bucket):
    // 5x oversaturated — fpp must degrade, rebuild must restore it
    val shards = BloomShards.create(64L * 1024, fpp)
    val n = 312500
    val df = seenDf(n).persist()
    df.count()
    BloomShards.buildShards(spark, df, b => shards.capacities(b), fpp)
      .foreach(shards.merge)

    val saturated = shards.saturatedBuckets
    assert(saturated.size === Model.NumBuckets,
      s"all buckets should be saturated at 5x capacity, got ${saturated.size}")

    // measured fpp on fps NOT inserted: saturated filter is useless (>>2x fpp)
    def measuredFpp(s: BloomShards): Double = {
      val probes = 20000
      var hits = 0
      for (i <- 0 until probes) {
        val (hex, b) = fpOf(n + 1000 + i)
        if (s.mightContain(b, hex)) hits += 1
      }
      hits.toDouble / probes
    }
    val fppBefore = measuredFpp(shards)
    assert(fppBefore > 2 * fpp,
      f"expected a saturated filter to exceed 2x nominal fpp, got $fppBefore%.4f")

    // rebuild saturated buckets at grown capacity (the CrawlDriver path)
    val newCaps = saturated.map(b =>
      b -> BloomShards.grownCapacity(shards.counts(b))).toMap
    BloomShards.buildShards(spark, df, newCaps, fpp).foreach(shards.replace)
    df.unpersist()

    assert(shards.saturatedBuckets.isEmpty, "rebuild must clear saturation")
    assert(shards.counts.sum === n.toLong) // counts preserved exactly
    val fppAfter = measuredFpp(shards)
    assert(fppAfter <= 2 * fpp,
      f"rebuilt filter fpp $fppAfter%.4f must stay within 2x nominal ${fpp}")
    // no false negatives survive the rebuild
    for (i <- 0 until n by 997) {
      val (hex, b) = fpOf(i)
      assert(shards.mightContain(b, hex), s"false negative after rebuild at $i")
    }
  }

  test("grown capacity doubles headroom and respects the floor") {
    assert(BloomShards.grownCapacity(0) === BloomShards.MinShardItems)
    assert(BloomShards.grownCapacity(1000) === 2048) // highestOneBit(1000)*4
    assert(BloomShards.grownCapacity(5000) === 16384)
    assert(BloomShards.grownCapacity(1 << 20) === (1L << 22))
  }

  test("loadBucket reads exactly one bucket's shard (the executor-side probe)") {
    val shards = BloomShards.create(64L * 1024, fpp)
    BloomShards.buildShards(spark, seenDf(3000), b => shards.capacities(b), fpp)
      .foreach(shards.merge)
    val dir = TestSpark.tempDir("bloom-bucket")
    BloomShards.save(spark, dir, shards)
    val conf = spark.sparkContext.hadoopConfiguration
    for (b <- Seq(0, 17, 63)) {
      val (f, cap, n) = BloomShards.loadBucket(dir, b, conf).get
      assert(cap === shards.capacities(b))
      assert(n === shards.counts(b))
      // probe agreement with the resident shard (same bits, same answers)
      for (i <- 0 until 3000 by 97) {
        val (hex, _) = fpOf(i)
        assert(f.mightContain(hex) === shards.mightContain(b, hex))
      }
    }
    assert(BloomShards.loadBucket(TestSpark.tempDir("bloom-missing"), 0, conf).isEmpty)
  }

  test("delta merge rejects capacity mismatch (sizing contract)") {
    val shards = BloomShards.create(64L * 1024, fpp)
    val wrong = BloomShardRow(0,
      BloomShards.toBytes(org.apache.spark.util.sketch.BloomFilter.create(4096, fpp)),
      capacity = 4096, n = 0)
    intercept[IllegalArgumentException](shards.merge(wrong))
  }

  test("save/load round-trips filters, capacities and counts") {
    val shards = BloomShards.create(64L * 1024, fpp)
    BloomShards.buildShards(spark, seenDf(5000), b => shards.capacities(b), fpp)
      .foreach(shards.merge)
    // grow one bucket so the restored table carries heterogeneous capacities
    val b0 = 7
    val grown = BloomShards.grownCapacity(100000)
    val f = org.apache.spark.util.sketch.BloomFilter.create(grown, fpp)
    f.putString("sentinel")
    shards.replace(BloomShardRow(b0, BloomShards.toBytes(f), grown, 1))

    val dir = TestSpark.tempDir("bloom-roundtrip")
    BloomShards.save(spark, dir, shards)
    val restored = BloomShards.load(spark, dir, 64L * 1024, fpp)
    assert(restored.capacities.toSeq === shards.capacities.toSeq)
    assert(restored.counts.toSeq === shards.counts.toSeq)
    assert(restored.mightContain(b0, "sentinel"))
    for (i <- 0 until 5000 by 173) {
      val (hex, b) = fpOf(i)
      if (b != b0) assert(restored.mightContain(b, hex))
    }
  }
}
