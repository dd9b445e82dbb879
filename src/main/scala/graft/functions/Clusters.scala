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
  * RNG, invariant 4). Each round is ONE shuffle (join + min-agg) plus a
  * LIMIT-1 convergence probe; lineage is cut per round with an eager
  * localCheckpoint so plans stay constant-size. Near-dup graphs are
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
      maxIter: Int = 25): DataFrame = {
    // r6 optimization: sym is hash-partitioned on the join key before the
    // persist, so every round's neighborhood join reuses the cached
    // partitioning (InMemoryRelation preserves outputPartitioning) instead
    // of re-shuffling the edge table each iteration (guide §2.4: two
    // operations keyed the same way share one exchange).
    val sym = edges.select(col(src).as("nbr"), col(dst).as("node"))
      .union(edges.select(col(dst).as("nbr"), col(src).as("node")))
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
    labels
  }
}
