package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.Model

/** Serialized per-bucket Bloom filter row (persisted next to the snapshot). */
final case class BloomShardRow(bucket: Int, bits: Array[Byte])

/** URL-seen Bloom filter sharded by fingerprint bucket ([[Model.bucketOf]] —
  * the same key the seen table is partitioned by), so the prescreen
  * co-partitions with url_seen instead of saturating one fixed-size bitmap
  * (north rule: "partitioned Bloom/cuckoo-filter URL-seen set").
  *
  * Advisory only: a hit still pays the exact LEFT ANTI join; a miss is
  * definitely-new (no false negatives), so exactness is preserved. Each
  * epoch's delta shards are built DISTRIBUTED (one aggregation keyed by
  * bucket — the scan of the new fingerprints happens on executors), then the
  * 64 small filters merge into the resident shards on the driver and persist
  * with the manifest. At 10^10 fps this layout holds: shard count scales with
  * [[Model.NumBuckets]] and each shard stays bounded by its bucket's load,
  * where a single filter's fpp would silently degrade to 1
  * (reference dupefilter analogue: `scrapy/dupefilters.py:94-105`).
  */
final class BloomShards(val filters: Array[BloomFilter]) extends Serializable {
  def mightContain(bucket: Int, fpHex: String): Boolean =
    filters(bucket).mightContain(fpHex)

  /** Merge a per-bucket delta filter (must share (items, fpp) sizing). */
  def merge(bucket: Int, delta: BloomFilter): Unit =
    filters(bucket).mergeInPlace(delta)

  def toRows: Seq[BloomShardRow] =
    filters.zipWithIndex.map { case (f, b) => BloomShardRow(b, BloomShards.toBytes(f)) }
}

object BloomShards {

  def toBytes(f: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  def fromBytes(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  /** Per-shard capacity so the TOTAL capacity matches `totalItems`. All
    * shards (resident, delta, restored) must use the same sizing or
    * `mergeInPlace` rejects them as incompatible. */
  def itemsPerShard(totalItems: Long): Long =
    math.max(totalItems / Model.NumBuckets, 1024L)

  def create(totalItems: Long, fpp: Double): BloomShards =
    new BloomShards(Array.fill(Model.NumBuckets)(
      BloomFilter.create(itemsPerShard(totalItems), fpp)))

  /** Distributed per-bucket filter build over a (fpHex, bucket) frame: one
    * partial-aggregated groupBy — executors scan the fingerprints, the driver
    * only receives ≤ NumBuckets serialized filters. */
  def buildShards(spark: SparkSession, seen: DataFrame,
      totalItems: Long, fpp: Double): Seq[BloomShardRow] = {
    import spark.implicits._
    val items = itemsPerShard(totalItems)
    val agg = new Aggregator[String, BloomFilter, Array[Byte]] {
      override def zero: BloomFilter = BloomFilter.create(items, fpp)
      override def reduce(b: BloomFilter, s: String): BloomFilter = { b.putString(s); b }
      override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = { a.mergeInPlace(b); a }
      override def finish(b: BloomFilter): Array[Byte] = toBytes(b)
      override def bufferEncoder = Encoders.javaSerialization[BloomFilter]
      override def outputEncoder = Encoders.BINARY
    }
    val bloomUdaf = udaf(agg, Encoders.STRING)
    seen.groupBy($"bucket")
      .agg(bloomUdaf($"fpHex").as("bits"))
      .as[(Int, Array[Byte])]
      .collect()
      .map { case (b, bits) => BloomShardRow(b, bits) }
      .toSeq
  }

  /** Restore resident shards from a persisted shard table (resume path);
    * buckets absent from the table stay fresh. */
  def load(spark: SparkSession, path: String, totalItems: Long, fpp: Double): BloomShards = {
    import spark.implicits._
    val shards = create(totalItems, fpp)
    spark.read.parquet(path).as[BloomShardRow].collect().foreach { r =>
      shards.filters(r.bucket) = fromBytes(r.bits)
    }
    shards
  }

  /** Persist the resident shards (overwrites; 64 small rows). */
  def save(spark: SparkSession, path: String, shards: BloomShards): Unit = {
    import spark.implicits._
    spark.createDataset(shards.toRows)
      .repartition(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }
}
