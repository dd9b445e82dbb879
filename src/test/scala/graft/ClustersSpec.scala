package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Clusters

/** Hash-min connected components over candidate edges (the post-LSH
  * cluster-assignment step; q_neardup_clusters is the DuckDB-verified
  * end-to-end form over the real minhash pipeline). */
class ClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chain + triangle + pair, parallel/reversed edges, min-id labels") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain
      (5L, 6L), (6L, 7L), (5L, 7L), // triangle
      (8L, 9L), // pair
      (2L, 1L), (1L, 2L)) // reversed + duplicate edges collapse
      .toDF("a", "b")
    val cc = Clusters.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      8L -> 8L, 9L -> 8L))
  }

  test("long chain converges within the default round budget") {
    import spark.implicits._
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val cc = Clusters.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc === (1 to n).map(i => i.toLong -> 1L).toMap)
  }

  test("string node ids cluster by lexicographic min") {
    import spark.implicits._
    val edges = Seq(("doc-b", "doc-c"), ("doc-a", "doc-b")).toDF("a", "b")
    val cc = Clusters.connectedComponents(edges, "a", "b")
      .as[(String, String)].collect().toMap
    assert(cc === Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a"))
  }
}
