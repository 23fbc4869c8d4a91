package graft.functions

import graft.SparkSpec

/** kNN label propagation (catalog v14): majority vote over cosine
  * neighbors, deterministic tie-breaks. */
class KnnLabelSpec extends SparkSpec {
  import spark.implicits._

  // 2-D vectors: labeled cluster A near (1,0) labeled 1, cluster B
  // near (0,1) labeled 2; one stray A-direction vector labeled 9.
  private val labeled = Seq(
    (1L, Seq(1.0f, 0.0f), 1),
    (2L, Seq(0.9f, 0.1f), 1),
    (3L, Seq(1.0f, 0.1f), 1),
    (4L, Seq(0.0f, 1.0f), 2),
    (5L, Seq(0.1f, 0.9f), 2),
    (6L, Seq(0.1f, 1.0f), 2),
    (7L, Seq(0.8f, 0.2f), 9))
    .toDF("vec_id", "embedding", "label")

  test("majority of the k nearest labeled vectors wins") {
    val queries = Seq(
      (100L, Seq(1.0f, 0.05f), 0),
      (101L, Seq(0.05f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Vectors.knnLabelVote(labeled, queries,
        "embedding", "vec_id", "label", k = 3)
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L) === ((1, 3)))  // three cluster-A neighbors
    assert(got(101L) === ((2, 3)))
  }

  test("vote tie breaks to the smallest label") {
    // k=2 with exactly one neighbor from each cluster
    val queries = Seq((200L, Seq(1.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val two = Seq(
      (1L, Seq(1.0f, 0.0f), 5),
      (2L, Seq(0.0f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val got = Vectors.knnLabelVote(two, queries,
        "embedding", "vec_id", "label", k = 2)
      .as[(Long, Int, Long)].collect().head
    assert(got === ((200L, 3, 1L))) // 1 vote each → smaller label 3
  }

  test("k larger than the labeled set uses everyone") {
    val queries = Seq((300L, Seq(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Vectors.knnLabelVote(labeled, queries,
        "embedding", "vec_id", "label", k = 100)
      .as[(Long, Int, Long)].collect().head
    assert(got._2 === 1)  // labels: 1×3, 2×3, 9×1 → tie 1 vs 2 → 1
    assert(got._3 === 3L)
  }
}
