package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF recall-vs-nprobe evaluation (catalog v12): hits against the
  * exact scan can only grow as the probe set widens, and probing
  * every list IS the exact scan. */
class IvfRecallSpec extends SparkSpec {
  import spark.implicits._

  // Three well-separated directions plus noise dimensions; 30 vecs.
  private val emb = (0L until 30L).map { i =>
    val c = (i % 3).toInt
    val base = Array.fill(4)(0.05f * ((i * 7 % 5).toInt + 1))
    base(c) = 1.0f + 0.01f * i
    (i, base)
  }.toDF("vec_id", "embedding")

  private val centroids = Seq(
    0 -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
    1 -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
    2 -> Seq(0.0f, 0.0f, 1.0f, 0.0f))
  private val query = Seq(0.9f, 0.3f, 0.1f, 0.05f)
  private val k = 8

  private def hits(nprobe: Int): Long = {
    val exact = Vectors.topKCosine(emb, "embedding", query, k)
      .select("vec_id")
    val assigned = Vectors.ivfAssign(emb, "embedding", centroids)
    Vectors.ivfTopK(assigned, "embedding", centroids, query, k, nprobe)
      .join(exact, Seq("vec_id"), "left_semi").count()
  }

  test("recall@k is non-decreasing in nprobe") {
    val h = (1 to 3).map(hits)
    assert(h === h.sorted)
    assert(h.forall(_ <= k))
  }

  test("probing all lists recovers the exact top-k") {
    assert(hits(3) === k.toLong)
  }
}
