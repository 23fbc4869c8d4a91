package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The v15/v16 oracles pin engine-vs-DuckDB parity; this spec pins
  * the SEMANTICS on constructed geometry: hub suppression (the margin
  * criterion's reason to exist) and the IVF form's candidate
  * restriction. */
class MarginMiningSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("margin demotes the hub: raw-cosine best loses to the " +
    "direction-specific match") {
    // hub ≈ equally close to every query; y1 is specifically close to
    // x1 and far from everything else
    val a = emb(
      1L -> Seq(1f, 0f, 0.3f),
      2L -> Seq(0f, 1f, 0.3f),
      3L -> Seq(-1f, 0f, 0.3f),
      4L -> Seq(0f, -1f, 0.3f))
    val hub = 100L -> Seq(0f, 0f, 1f)
    val y1 = 101L -> Seq(0.9f, 0f, 0.1f)
    val b = emb(hub, y1,
      102L -> Seq(0.1f, 0.2f, -0.5f), 103L -> Seq(-0.2f, 0.1f, -0.5f))
    val out = Vectors.marginMining(a, b, "embedding", "vec_id", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // x1's raw-cosine best IS y1 here by construction, but the point
    // is the hub never wins for the queries it is only generically
    // close to: x2/x3/x4 have the hub as raw-best, yet the margin
    // normalizes it away for at least some of them — verify x1 -> y1
    // and that not every query pairs with the hub
    assert(out(1L) == 101L)
    assert(out.values.count(_ == 100L) < out.size)
  }

  test("IVF form scores only probed-cluster candidates (n_cand < |B|)" +
    " from the query's own cluster") {
    // two well-separated clusters; centroids = one seed per cluster.
    // (The best PAIR may legitimately differ from exact mining — the
    // neighborhoods are computed over different candidate sets; that
    // is the documented approximation. What must hold: candidates
    // come only from probed clusters.)
    val a = emb(1L -> Seq(1f, 0.1f), 2L -> Seq(-1f, 0.1f))
    val b = emb(
      10L -> Seq(1f, 0.2f), 11L -> Seq(0.9f, 0f),
      20L -> Seq(-1f, 0.2f), 21L -> Seq(-0.9f, 0f))
    val cents = Seq(0 -> Seq(1f, 0f), 1 -> Seq(-1f, 0f))
    val ivf = Vectors.marginMiningIvf(a, b, "embedding", "vec_id",
      k = 2, cents, nprobe = 1).collect()
    assert(ivf.length == 2)
    val byId = ivf.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getAs[Long]("n_cand")))).toMap
    assert(byId(1L)._2 == 2)                  // half of |B| = 4
    assert(byId(2L)._2 == 2)
    assert(Set(10L, 11L)(byId(1L)._1))        // x1's cluster only
    assert(Set(20L, 21L)(byId(2L)._1))        // x2's cluster only
  }

  test("quadratic-pair guard: refuses past maxExactPairs, allowExact " +
    "bypasses, unmaterialized caches fall back to a real count") {
    val a = emb((1L to 10L).map(i => i -> Seq(i.toFloat, 1f)): _*)
    val b = emb((1L to 10L).map(i => (100 + i) -> Seq(1f, i.toFloat)): _*)
    val e = intercept[IllegalArgumentException](
      Vectors.marginMining(a, b, "embedding", "vec_id", k = 2,
        maxExactPairs = 99L))
    assert(e.getMessage.contains("marginMiningIvf"))
    // deliberate opt-in still runs
    assert(Vectors.marginMining(a, b, "embedding", "vec_id", k = 2,
      allowExact = true, maxExactPairs = 99L).count() == 10L)
    // a cached-but-NOT-materialized input must not be trusted as an
    // exact stats leaf (ADVICE r6: pre-materialization stats are the
    // child plan's estimate under CBO) — the guard still fires via
    // the count() fallback
    val ac = a.cache()
    try {
      val e2 = intercept[IllegalArgumentException](
        Vectors.marginMining(ac, b, "embedding", "vec_id", k = 2,
          maxExactPairs = 99L))
      assert(e2.getMessage.contains("100 candidate pairs"))
    } finally ac.unpersist(blocking = true)
  }
}
