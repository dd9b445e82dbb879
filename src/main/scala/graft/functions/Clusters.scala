package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster assignment over near-dup candidate edges — the step after LSH
  * candidate generation in a dedup pipeline (pick one representative per
  * connected component of the candidate graph; the reference pipeline stops
  * at pairwise dupes, a 100 TB corpus needs the grouping).
  *
  * Algorithm: hash-min label propagation — every node starts labeled with
  * itself, each round takes the min label over its neighborhood, converges
  * in O(graph diameter) rounds. Deterministic (min over a total order, no
  * RNG, invariant 4). Each round is ONE shuffle (join + min-agg) and ONE
  * job (the convergence count rides an observe() metric on the round's
  * eager localCheckpoint, which also keeps plans constant-size). Near-dup graphs are
  * short-diameter (dupes of a doc are dupes of each other), so rounds stay
  * in the single digits; for adversarial long-chain graphs the
  * two-phase large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce") halves the exponent — documented alternative,
  * not needed at the observed diameters.
  */
object Clusters {

  /** Connected components of the undirected graph given as an edge list.
    * Returns one row per node that appears in `edges`: (node, cluster)
    * where cluster = the component's minimum node id. Isolated documents
    * never enter the candidate graph and keep themselves as implicit
    * singletons — callers left-join and coalesce to the doc id. */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 25,
      // bounded small-graph fast path (r6, guide §1.2: the cheapest correct
      // execution of a tiny graph is no distributed iteration at all): when
      // the edge count fits the explicit cap, collect the edges and
      // run driver-side union-find — one job instead of O(diameter) rounds
      // of join+agg+checkpoint. Same pattern as the engine's seqCollectMax
      // (bounded driver collect with a distributed fallback); at scale the
      // count exceeds the cap and the hash-min loop below runs unchanged.
      collectMax: Long = sys.env.getOrElse("GRAFT_CC_COLLECT_MAX",
        (1L << 20).toString).toLong): DataFrame = {
    // raw pair stream persisted once: the count, the driver collect, and
    // BOTH direction branches of the fallback's symmetrization read the
    // cache instead of recomputing the (possibly expensive) edge plan
    val raw = edges.select(col(src).as("a"), col(dst).as("b")).persist()
    val nEdges = raw.count()
    if (collectMax > 0 && nEdges <= collectMax) {
      val out = driverComponents(edges.sparkSession, raw)
      raw.unpersist(false)
      return out
    }
    // r6 optimization: sym is hash-partitioned on the join key before the
    // persist, so every round's neighborhood join reuses the cached
    // partitioning (InMemoryRelation preserves outputPartitioning) instead
    // of re-shuffling the edge table each iteration (guide §2.4: two
    // operations keyed the same way share one exchange).
    val sym = raw.select(col("a").as("nbr"), col("b").as("node"))
      .union(raw.select(col("b").as("nbr"), col("a").as("node")))
      .distinct()
      .repartition(col("nbr"))
      .persist()
    var labels = sym.select(col("node")).distinct()
      .withColumn("cluster", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // min label over the neighborhood (map-side partial min, one shuffle)
      val nbrMin = sym
        .join(labels.select(col("node").as("nbr"), col("cluster")), "nbr")
        .groupBy("node").agg(min("cluster").as("nbrMin"))
      // r6: the moved count rides an observe() metric collected DURING the
      // checkpoint materialization — one job per round; the r5 probe paid a
      // shuffle join of next×labels every round, and the first r6 cut
      // (moved flag + filter/limit over the checkpointed rows) still paid a
      // separate probe job per round (guide §2.4: remove shuffles — and
      // jobs — outright). moved ⟺ the neighborhood min beat the label.
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("nbrMin"), col("cluster")))
            .as("cluster"),
          coalesce(col("nbrMin") < col("cluster"), lit(false)).as("moved"))
        .observe(obs, sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved"))
        .localCheckpoint()
      val changed = Option(obs.get("n_moved")).fold(0L)(_.asInstanceOf[Long])
      labels = next.select(col("node"), col("cluster"))
      converged = changed == 0L
      i += 1
    }
    sym.unpersist()
    raw.unpersist(false)
    labels
  }

  /** Driver-side exact components over a collected (bounded) edge list
    * (duplicate edges are harmless no-op unions):
    * union-find with path compression, then component label = min member
    * under the SAME total order the distributed `least`/`min` uses
    * (numbers: natural; strings: unsigned byte-wise UTF-8, Spark's
    * UTF8String collation — NOT Java String order, which differs for
    * supplementary characters). Output schema matches the loop: one row
    * per node appearing in `raw`, columns (node, cluster) of the input
    * key type. */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
      raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType, StringType}
    val dt = raw.schema.head.dataType
    val sparkOrd: Ordering[Any] = dt match {
      case StringType => new Ordering[Any] {
        def compare(x: Any, y: Any): Int = {
          val a = x.asInstanceOf[String].getBytes("UTF-8")
          val b = y.asInstanceOf[String].getBytes("UTF-8")
          var i = 0
          val n = math.min(a.length, b.length)
          while (i < n) {
            val c = (a(i) & 0xff) - (b(i) & 0xff)
            if (c != 0) return c
            i += 1
          }
          a.length - b.length
        }
      }
      case _ => new Ordering[Any] {
        def compare(x: Any, y: Any): Int =
          x.asInstanceOf[Comparable[Any]].compareTo(y)
      }
    }
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
      r
    }
    raw.collect().foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(ra, rb)
    }
    val minOf = new java.util.HashMap[Any, Any]()
    parent.keySet().forEach { n =>
      val r = find(n)
      val cur = minOf.get(r)
      if (cur == null || sparkOrd.lt(n, cur)) minOf.put(r, n)
    }
    val rows = new java.util.ArrayList[Row](parent.size())
    parent.keySet().forEach(n => rows.add(Row(n, minOf.get(find(n)))))
    spark.createDataFrame(rows,
      StructType(Seq(StructField("node", dt), StructField("cluster", dt))))
  }
}
