package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY training-data ops):
  * brute-force cosine top-k is the exact baseline (`SparkEntry.q_ann_topk`);
  * this IVF variant is the scale path — a coarse quantizer buckets vectors,
  * queries probe only the nearest `nProbe` buckets, cutting the candidate
  * set by ~nLists/nProbe at a small recall cost.
  */
object Similarity {

  private def cosExpr(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / " +
    s"(sqrt(aggregate($a, 0D, (acc, x) -> acc + x * x)) * " +
    s" sqrt(aggregate($b, 0D, (acc, x) -> acc + x * x)))")

  /** Deterministic coarse centroids: the first `nLists` vectors by id.
    * (k-means would refine them; determinism matters more here.) */
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
    val centroids = e.orderBy($"vec_id").limit(nLists)
      .select($"vec_id".as("list_id"), $"emb".as("centroid"))

    // assign every vector to its nearest centroid (broadcast: centroids tiny)
    val wAssign = Window.partitionBy($"vec_id").orderBy($"simToCentroid".desc, $"list_id")
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("simToCentroid", cosExpr("emb", "centroid"))
      .withColumn("rn", row_number().over(wAssign))
      .filter($"rn" === 1)
      .select($"vec_id", $"emb", $"list_id")
      .persist()

    // queries probe their nProbe nearest lists
    val queries = e.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id".as("query_id"), $"emb".as("qe"))
    val wProbe = Window.partitionBy($"query_id").orderBy($"simToCentroid".desc, $"list_id")
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("simToCentroid", cosExpr("qe", "centroid"))
      .withColumn("rn", row_number().over(wProbe))
      .filter($"rn" <= nProbe)
      .select($"query_id", $"qe", $"list_id")

    // candidate join restricted to probed lists, then exact top-k
    val wRank = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    probes.join(assigned.withColumnRenamed("emb", "ve"), Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", cosExpr("qe", "ve"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"))
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
