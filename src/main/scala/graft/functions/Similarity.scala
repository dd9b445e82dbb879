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

  /** r6 optimization: the cosine kernel is the codegen'd graft_dot
    * expression (the interpreted aggregate/zip_with HOF chain evaluated
    * per candidate pair was the hot path), with each side's norm hoisted
    * to a per-vector column computed once BELOW the joins. FP-identical to
    * the r5 form: same ascending-index add/mul fold, sqrt of the same sum,
    * the same two doubles multiplied — outputs are unchanged bit-for-bit. */
  private def dotExpr(a: String, b: String) = expr(s"graft_dot($a, $b)")
  private def normExpr(a: String) = expr(s"sqrt(graft_dot($a, $a))")

  private def cosine(a: Seq[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Trained coarse quantizer over a deterministic hash-sample: maximin
    * (farthest-point) init — well-spread, unlike first-N-by-id which
    * degenerates when ids correlate with clusters — refined by Lloyd
    * iterations toward cluster means. Training runs DRIVER-SIDE over a
    * bounded sample (the standard quantizer recipe — faiss-style training
    * on a sample, not the corpus): one count + one collect job regardless
    * of nLists/iters, instead of an O(nLists + iters) chain of cluster
    * jobs. The sample is `pmod(xxhash64(vec_id), S) = 0` — deterministic
    * under any partitioning; datasets at or under `sampleCap` train on
    * everything (so small-SF results are exact and reproducible). */
  def trainCentroids(spark: SparkSession, e: DataFrame, // vec_id, emb
      nLists: Int, iters: Int = 3, sampleCap: Int = 2048): Seq[(Int, Array[Double])] = {
    import spark.implicits._
    val n = e.count()
    val stride = math.max(n / math.max(sampleCap, nLists), 1L)
    val sampled =
      if (stride <= 1L) e
      else {
        val s = e.filter(pmod(xxhash64($"vec_id"), lit(stride)) === 0)
        // pathological hash clumping could under-sample below nLists
        if (s.limit(nLists).count() < nLists) e.orderBy($"vec_id").limit(sampleCap) else s
      }
    val sample = sampled.select($"vec_id", $"emb").as[(Long, Seq[Double])]
      .collect().sortBy(_._1).map(_._2.toArray)
    require(sample.nonEmpty, "cannot train a quantizer on an empty dataset")

    // maximin init: start from the min-id vector, repeatedly take the
    // sample vector least similar to any chosen centroid (ties by position)
    val chosen = scala.collection.mutable.ArrayBuffer[Array[Double]](sample.head)
    val maxSim = Array.fill(sample.length)(-2.0)
    while (chosen.size < math.min(nLists, sample.length)) {
      val newest = chosen.last
      var argmin = 0; var best = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        val s = math.max(maxSim(i), cosine(sample(i), newest))
        maxSim(i) = s
        if (s < best) { best = s; argmin = i }
        i += 1
      }
      chosen += sample(argmin)
    }
    while (chosen.size < nLists) chosen += chosen.head // degenerate tiny inputs

    // Lloyd refinement over the sample (deterministic: fixed iteration
    // order); empty clusters keep their previous centroid
    var cents = chosen.toArray
    for (_ <- 1 to iters) {
      val dim = cents(0).length
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val counts = new Array[Long](nLists)
      for (v <- sample) {
        var bestL = 0; var bestS = -2.0
        var l = 0
        while (l < nLists) {
          val s = cosine(v, cents(l))
          if (s > bestS) { bestS = s; bestL = l }
          l += 1
        }
        var d = 0
        while (d < dim) { sums(bestL)(d) += v(d); d += 1 }
        counts(bestL) += 1
      }
      cents = cents.zipWithIndex.map { case (old, l) =>
        if (counts(l) == 0) old else sums(l).map(_ / counts(l))
      }
    }
    cents.toSeq.zipWithIndex.map { case (c, i) => (i, c) }
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
      .withColumn("nrm", normExpr("emb"))
      .persist()
    val centroids = spark.createDataFrame(
      trainCentroids(spark, e, nLists)).toDF("list_id", "centroid")
      .withColumn("cnrm", normExpr("centroid"))

    // assign every vector to its nearest centroid: max_by aggregation —
    // map-side partial agg collapses the crossJoin before the shuffle
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("sim", dotExpr("emb", "centroid") / ($"nrm" * $"cnrm"))
      .groupBy($"vec_id")
      .agg(
        max_by($"list_id", struct($"sim", -$"list_id")).as("list_id"),
        first($"emb").as("ve"), // all rows of a vec_id carry the same emb
        first($"nrm").as("vnrm"))
      .persist()

    // queries probe their nProbe nearest lists: per query there are exactly
    // nLists sims — collect, sort, slice (bounded by nLists, not the data)
    val queries = e.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id".as("query_id"), $"emb".as("qe"), $"nrm".as("qnrm"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("sim", dotExpr("qe", "centroid") / ($"qnrm" * $"cnrm"))
      .groupBy($"query_id")
      .agg(
        first($"qe").as("qe"), first($"qnrm").as("qnrm"),
        slice(sort_array(collect_list(
          struct((-$"sim").as("nsim"), $"list_id".as("list_id")))), 1, nProbe).as("top"))
      .select($"query_id", $"qe", $"qnrm", explode($"top.list_id").as("list_id"))

    // candidate join restricted to probed lists, then exact top-k
    val wRank = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    probes.join(assigned, Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", dotExpr("qe", "ve") / ($"qnrm" * $"vnrm"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"))
  }

  /** Embedding near-dup edge list at scale: every vector's nearest neighbor
    * restricted to its `nProbe` nearest IVF lists — the 100 TB shape of
    * `q_embedding_neardup`. Label-blocking (the exact small-sf oracle query)
    * is O(n²) within a block when labels are few; IVF blocking bounds the
    * candidate set at ~nProbe·n/nLists PER VECTOR regardless of the label
    * distribution, and the block key is learned from the data itself. The
    * argmax stays a map-side-combined max_by — no window over the candidate
    * join. Recall is gated in OperatorsSpec against the brute-force nn. */
  def ivfNearDup(
      spark: SparkSession,
      embeddings: DataFrame, // vec_id, embedding
      nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val e = embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      .withColumn("nrm", normExpr("emb"))
      .persist()
    val centroids = spark.createDataFrame(
      trainCentroids(spark, e, nLists)).toDF("list_id", "centroid")
      .withColumn("cnrm", normExpr("centroid"))

    // membership: nearest list per vector (one bounded max_by shuffle)
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("sim", dotExpr("emb", "centroid") / ($"nrm" * $"cnrm"))
      .groupBy($"vec_id")
      .agg(
        max_by($"list_id", struct($"sim", -$"list_id")).as("list_id"),
        first($"emb").as("ve"), first($"nrm").as("vnrm"))

    // probing: every vector expands to its nProbe nearest lists (bounded by
    // nLists per vector pre-aggregation, nProbe rows after)
    val probes = e.crossJoin(broadcast(centroids))
      .withColumn("sim", dotExpr("emb", "centroid") / ($"nrm" * $"cnrm"))
      .groupBy($"vec_id")
      .agg(
        first($"emb").as("qe"), first($"nrm").as("qnrm"),
        slice(sort_array(collect_list(
          struct((-$"sim").as("nsim"), $"list_id".as("list_id")))), 1, nProbe).as("top"))
      .select($"vec_id", $"qe", $"qnrm", explode($"top.list_id").as("list_id"))

    // candidate join co-partitioned on list_id; nearest via max_by
    val cands = assigned.select($"list_id", $"vec_id".as("cand_id"), $"ve", $"vnrm")
    probes.join(cands, Seq("list_id"))
      .filter($"vec_id" =!= $"cand_id")
      .withColumn("cos", dotExpr("qe", "ve") / ($"qnrm" * $"vnrm"))
      .groupBy($"vec_id")
      .agg(max_by($"cand_id", struct($"cos", -$"cand_id")).as("nn_id"))
  }

  /** The vector→list assignment alone (for tests that check IVF's only error
    * source is probe misses, i.e. exact-rank-within-probed-lists). */
  def ivfAssignment(spark: SparkSession, embeddings: DataFrame, nLists: Int): DataFrame = {
    import spark.implicits._
    val e = embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      .withColumn("nrm", normExpr("emb"))
    val centroids = spark.createDataFrame(
      trainCentroids(spark, e, nLists)).toDF("list_id", "centroid")
      .withColumn("cnrm", normExpr("centroid"))
    e.crossJoin(broadcast(centroids))
      .withColumn("sim", dotExpr("emb", "centroid") / ($"nrm" * $"cnrm"))
      .groupBy($"vec_id")
      .agg(max_by($"list_id", struct($"sim", -$"list_id")).as("list_id"))
  }

  /** Exact brute-force top-k (ground truth for recall measurement). */
  def bruteTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long], k: Int = 3): DataFrame = {
    import spark.implicits._
    val e = embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      .withColumn("nrm", normExpr("emb"))
    val q = e.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id".as("query_id"), $"emb".as("qe"), $"nrm".as("qnrm"))
    val v = e.select($"vec_id".as("neighbor_id"), $"emb".as("ve"), $"nrm".as("vnrm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    q.crossJoin(v)
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("cos", dotExpr("qe", "ve") / ($"qnrm" * $"vnrm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id")
  }
}
