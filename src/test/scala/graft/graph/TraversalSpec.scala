package graft.graph

import graft.SparkSpec

/** Bounded k-hop BFS (catalog q47): min-hop distances, cycle
  * termination, early exit. */
class TraversalSpec extends SparkSpec {
  import spark.implicits._

  //      1 → 2 → 3 → 4 → 5   plus shortcut 1 → 3 and cycle 4 → 1
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (4L, 1L))
    .toDF("src", "dst")

  private def run(seed: Long, hops: Int): Map[Long, Long] = {
    val r = Traversal.khop(edges, seed, hops)
      .as[(Long, Long)].collect().toMap
    graft.CacheTracker.releaseAll()
    r
  }

  test("min-hop wins when multiple paths reach a node") {
    // 3 is reachable at hop 2 (1→2→3) and hop 1 (1→3): min = 1
    assert(run(1L, 3) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("cycle back to the seed does not loop or re-emit") {
    // 4 → 1 closes a cycle; 1 stays at hops 0
    val got = run(1L, 10)
    assert(got(1L) === 0L)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("hop budget truncates the frontier") {
    assert(run(1L, 1) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("isolated seed returns just itself at hops 0") {
    assert(run(99L, 3) === Map(99L -> 0L))
  }

  test("null endpoints are non-edges, not nodes (spec'd contract)") {
    // (1, null) and (null, 2) must contribute NOTHING: null never
    // appears as a reachable node, and a null src never relays. The
    // q47 oracle pins the same rule via `e.dst IS NOT NULL` in its
    // recursive CTE — this test anchors that oracle-side clause to
    // the engine's stated semantics (ADVICE r5).
    val withNulls = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (1L, null), (null, 2L), (2L, 3L))
      .toDF("src", "dst")
    val got = Traversal.khop(withNulls, 1L, 5)
      .as[(Long, Long)].collect().toMap
    graft.CacheTracker.releaseAll()
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
