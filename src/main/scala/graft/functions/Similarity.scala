package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY training-data ops):
  * brute-force cosine top-k is the exact baseline (`SparkEntry.q_ann_topk`);
  * the IVF variant is the scale path — a coarse quantizer buckets vectors,
  * queries probe only the nearest `nProbe` buckets, cutting the candidate
  * set by ~nLists/nProbe at a small recall cost.
  */
object Similarity {

  private def cosExpr(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / " +
    s"(sqrt(aggregate($a, 0D, (acc, x) -> acc + x * x)) * " +
    s" sqrt(aggregate($b, 0D, (acc, x) -> acc + x * x)))")

  private def cosine(a: Seq[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic farthest-point (maximin) centroid selection: start from
    * the min-id vector, then repeatedly take the vector LEAST similar to any
    * chosen centroid (ties by vec_id). Spreads centroids across the data's
    * actual clusters — unlike first-N-by-id, which degenerates when ids
    * correlate with clusters. Each step is one distributed top-1 scan
    * (TakeOrderedAndProject — no full sort); only nLists 1-row results reach
    * the driver. At 10^9 vectors, run the selection over a deterministic
    * hash-sample (pmod(xxhash64(vec_id), S) = 0) — centroid quality needs a
    * sample, not the corpus.
    */
  def maximinCentroids(spark: SparkSession, e: DataFrame, // vec_id, emb
      nLists: Int): Seq[(Int, Array[Double])] = {
    import spark.implicits._
    val first = e.orderBy($"vec_id").limit(1)
      .select($"emb").as[Seq[Double]].head().toArray
    val chosen = scala.collection.mutable.ArrayBuffer[Array[Double]](first)
    while (chosen.size < nLists) {
      val cs = chosen.toArray
      val maxSimUdf = udf((emb: Seq[Double]) => cs.map(c => cosine(emb, c)).max)
      val next = e.select($"vec_id", $"emb", maxSimUdf($"emb").as("ms"))
        .orderBy($"ms".asc, $"vec_id".asc).limit(1)
        .select($"emb").as[Seq[Double]].head().toArray
      chosen += next
    }
    chosen.toSeq.zipWithIndex.map { case (c, i) => (i, c) }
  }

  /** Scaled-integer fixed point for centroid means: Long sums are
    * order-independent (unlike float sums), so k-means refinement is
    * deterministic under any partitioning — the engine's determinism
    * invariant. 2^24 scale ≈ 6e-8 precision; 10^9 unit-range values per
    * cluster stay far below Long overflow. */
  private val MeanScale = (1L << 24).toDouble

  private class MeanAgg extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Double], (Array[Long], Long), Seq[Double]] {
    override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)
    override def reduce(b: (Array[Long], Long), emb: Seq[Double]): (Array[Long], Long) = {
      val arr = if (b._1.isEmpty) new Array[Long](emb.length) else b._1
      var i = 0
      while (i < emb.length) { arr(i) += math.round(emb(i) * MeanScale); i += 1 }
      (arr, b._2 + 1)
    }
    override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) =
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    override def finish(r: (Array[Long], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty else r._1.toSeq.map(v => v / MeanScale / r._2)
    override def bufferEncoder = org.apache.spark.sql.Encoders.kryo[(Array[Long], Long)]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Trained coarse quantizer: maximin init (well-spread, but outlier-
    * biased) + deterministic Lloyd iterations pulling centroids to cluster
    * means. Each iteration = one assignment aggregation + one mean
    * aggregation; only nLists mean vectors reach the driver. Empty lists
    * keep their previous centroid. */
  def trainCentroids(spark: SparkSession, e: DataFrame, // vec_id, emb
      nLists: Int, iters: Int = 3): Seq[(Int, Array[Double])] = {
    import spark.implicits._
    var cents = maximinCentroids(spark, e, nLists)
    val meanUdaf = udaf(new MeanAgg, implicitly[org.apache.spark.sql.Encoder[Seq[Double]]])
    for (_ <- 1 to iters) {
      val cdf = spark.createDataFrame(cents).toDF("list_id", "centroid")
      val means = e.crossJoin(broadcast(cdf))
        .withColumn("sim", cosExpr("emb", "centroid"))
        .groupBy($"vec_id")
        .agg(max_by($"list_id", struct($"sim", -$"list_id")).as("list_id"),
          first($"emb").as("emb"))
        .groupBy($"list_id")
        .agg(meanUdaf($"emb").as("mean"))
        .as[(Int, Seq[Double])].collect().toMap
      cents = cents.map { case (lid, old) =>
        (lid, means.get(lid).filter(_.nonEmpty).map(_.toArray).getOrElse(old))
      }
    }
    cents
  }

  /** IVF top-k. The quantizer is broadcast (nLists is small by design);
    * vector→list assignment and query→probe selection are partial-aggregated
    * `max_by`/bounded `collect_list` GROUP BYs — one map-side-combined
    * shuffle each, never a window sort over the vectors×centroids cross
    * product. Only the final per-query rank (candidates already cut to the
    * probed lists) uses a window. */
  def ivfTopK(
      spark: SparkSession,
      embeddings: DataFrame, // vec_id, embedding
      queryIds: Seq[Long],
      k: Int = 3,
      nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val e = embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      .persist()
    val centroids = spark.createDataFrame(
      trainCentroids(spark, e, nLists)).toDF("list_id", "centroid")

    // assign every vector to its nearest centroid: max_by aggregation —
    // map-side partial agg collapses the crossJoin before the shuffle
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("sim", cosExpr("emb", "centroid"))
      .groupBy($"vec_id")
      .agg(
        max_by($"list_id", struct($"sim", -$"list_id")).as("list_id"),
        first($"emb").as("ve")) // all rows of a vec_id carry the same emb
      .persist()

    // queries probe their nProbe nearest lists: per query there are exactly
    // nLists sims — collect, sort, slice (bounded by nLists, not the data)
    val queries = e.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id".as("query_id"), $"emb".as("qe"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("sim", cosExpr("qe", "centroid"))
      .groupBy($"query_id")
      .agg(
        first($"qe").as("qe"),
        slice(sort_array(collect_list(
          struct((-$"sim").as("nsim"), $"list_id".as("list_id")))), 1, nProbe).as("top"))
      .select($"query_id", $"qe", explode($"top.list_id").as("list_id"))

    // candidate join restricted to probed lists, then exact top-k
    val wRank = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    probes.join(assigned, Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", cosExpr("qe", "ve"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"))
  }

  /** The vector→list assignment alone (for tests that check IVF's only error
    * source is probe misses, i.e. exact-rank-within-probed-lists). */
  def ivfAssignment(spark: SparkSession, embeddings: DataFrame, nLists: Int): DataFrame = {
    import spark.implicits._
    val e = embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val centroids = spark.createDataFrame(
      trainCentroids(spark, e, nLists)).toDF("list_id", "centroid")
    e.crossJoin(broadcast(centroids))
      .withColumn("sim", cosExpr("emb", "centroid"))
      .groupBy($"vec_id")
      .agg(max_by($"list_id", struct($"sim", -$"list_id")).as("list_id"))
  }

  /** Exact brute-force top-k (ground truth for recall measurement). */
  def bruteTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long], k: Int = 3): DataFrame = {
    import spark.implicits._
    val e = embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val q = e.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id".as("query_id"), $"emb".as("qe"))
    val v = e.select($"vec_id".as("neighbor_id"), $"emb".as("ve"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    q.crossJoin(v)
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("cos", cosExpr("qe", "ve"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id")
  }
}
