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

  /** Per-row codegen'd expressions over the trained (driver-side) quantizer
    * — the r6 shape of assignment and probe selection (guide §2.4: remove
    * shuffles outright). The r5 form crossJoined every vector with the
    * broadcast centroid table and aggregated back with max_by /
    * collect_list: one nLists-fold row blowup plus one shuffle per use.
    * The quantizer is already a driver-side array after training, so the
    * argmax/top-nProbe over nLists sims is a per-row expression — NO
    * crossJoin, NO Exchange, map-only.
    *
    * FP/tie equivalence with the r5 aggregates (outputs bit-identical):
    * sims are the same `graft_dot(emb, cent_k)/(nrm*cnrm_k)` doubles
    * (cnrm_k computed driver-side by the same ascending-index fold +
    * sqrt the normExpr column ran); `array_position(sims, array_max(sims))`
    * picks the max with ties to the FIRST index = max_by(struct(sim,
    * -list_id)); `slice(array_sort(struct(-sim, list_id)), 1, nProbe)`
    * orders exactly like sort_array over the collected structs. */
  private def centSims(cents: Seq[(Int, Array[Double])],
      emb: String, nrm: String): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{lit, typedlit, call_function}
    cents.map { case (_, c) =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      val cnrm = math.sqrt(s) // same fold normExpr runs on the centroid col
      // typedlit: the centroid is ONE constant ArrayData reference in the
      // generated code — an `array(d0, d1, …)` SQL literal would be a
      // CreateArray rebuilt per row and per centroid, and 16 × dim element
      // writes per row dominated the codegen size and first-run compile
      call_function("graft_dot", col(emb), typedlit(c.toSeq)) /
        (col(nrm) * lit(cnrm))
    }
  }
  /** the per-row sims array bound as ONE projected column: downstream
    * argmax/top-nProbe expressions reference `sims` elements instead of
    * duplicating the 16 dot-product subtrees per use — the analyzed tree
    * stays linear in nLists and the first-run Catalyst/codegen cost (the
    * dominant cost of these queries at small scale) drops with it. */
  private def withSims(df: DataFrame, cents: Seq[(Int, Array[Double])],
      emb: String, nrm: String): DataFrame =
    df.withColumn("sims", array(centSims(cents, emb, nrm): _*))
  /** nearest list id per row: first index (0-based) of the max sim. */
  private def assignCol: org.apache.spark.sql.Column =
    (array_position(col("sims"), array_max(col("sims"))) - 1L).cast("int")
  /** the nProbe nearest list ids per row, ordered by (-sim, list_id). */
  private def probeCol(nLists: Int, nProbe: Int): org.apache.spark.sql.Column = {
    val pairs = (0 until nLists).map { i =>
      struct((-element_at(col("sims"), i + 1)).as("nsim"),
        lit(i).as("list_id"))
    }
    slice(array_sort(array(pairs: _*)), 1, nProbe).getField("list_id")
  }

  /** IVF top-k. The quantizer is a driver-side literal (nLists is small by
    * design); vector→list assignment and query→probe selection are per-row
    * codegen'd expressions (see [[centSims]]) — map-only, no crossJoin, no
    * Exchange. Only the final per-query rank (candidates already cut to the
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
    val cents = trainCentroids(spark, e, nLists)

    // assign every vector to its nearest centroid: per-row argmax
    val assigned = withSims(e, cents, "emb", "nrm")
      .select($"vec_id", assignCol.as("list_id"),
        $"emb".as("ve"), $"nrm".as("vnrm"))

    // queries probe their nProbe nearest lists: per-row sort over nLists
    // sims (bounded by nLists, not the data)
    val probes = withSims(e.filter($"vec_id".isin(queryIds: _*)), cents, "emb", "nrm")
      .select($"vec_id".as("query_id"), $"emb".as("qe"), $"nrm".as("qnrm"),
        explode(probeCol(nLists, nProbe)).as("list_id"))

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
    val cents = trainCentroids(spark, e, nLists)

    // membership: nearest list per vector (per-row argmax, map-only — r6,
    // see centSims; the r5 crossJoin+max_by shape paid a shuffle here)
    val assigned = withSims(e, cents, "emb", "nrm")
      .select($"vec_id", assignCol.as("list_id"),
        $"emb".as("ve"), $"nrm".as("vnrm"))

    // probing: every vector expands to its nProbe nearest lists (per-row
    // sort over nLists sims, map-only)
    val probes = withSims(e, cents, "emb", "nrm")
      .select($"vec_id", $"emb".as("qe"), $"nrm".as("qnrm"),
        explode(probeCol(nLists, nProbe)).as("list_id"))

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
    val cents = trainCentroids(spark, e, nLists)
    withSims(e, cents, "emb", "nrm").select($"vec_id", assignCol.as("list_id"))
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
