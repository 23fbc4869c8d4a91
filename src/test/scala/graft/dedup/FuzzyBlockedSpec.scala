package graft.dedup

import graft.SparkSpec

/** Blocked edit-distance record linkage (Dedup.blockedEditDistancePairs). */
class FuzzyBlockedSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple pie with cream"),
    (2L, "apple pie with creams"), // same block "apple", dist 1
    (3L, "apple tart with cream"), // same block, dist 5 from #1
    (4L, "banana pie with cream"), // different block -> never compared
    (5L, "")) // empty text -> empty block
    .toDF("doc_id", "text")

  // Independent reference DP (not Spark's levenshtein).
  private def lev(a: String, b: String): Long = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length).toLong
  }

  test("pairs only within a block, ordered ids, exact distances") {
    val texts = docs.as[(Long, String)].collect().toMap
    val out = Dedup.blockedEditDistancePairs(docs, "text", "doc_id",
      blockToks = 1, prefixLen = 60, maxDist = 10)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    val expected = Seq((1L, 2L), (1L, 3L), (2L, 3L))
      .map { case (x, y) => (x, y, lev(texts(x), texts(y))) }
      .filter(_._3 <= 10)
    assert(out === expected)
    assert(out.head === ((1L, 2L, 1L))) // one trailing-s edit
  }

  test("maxDist prunes verified pairs") {
    val out = Dedup.blockedEditDistancePairs(docs, "text", "doc_id",
      blockToks = 1, prefixLen = 60, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L)))
  }

  test("cross-block pairs are never emitted even at huge maxDist") {
    val out = Dedup.blockedEditDistancePairs(docs, "text", "doc_id",
      blockToks = 1, prefixLen = 60, maxDist = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!out.exists { case (x, y) => x == 4L || y == 4L })
    assert(!out.exists { case (x, y) => x == 5L || y == 5L })
  }

  test("wider block key separates near-misses") {
    val out = Dedup.blockedEditDistancePairs(docs, "text", "doc_id",
      blockToks = 2, prefixLen = 60, maxDist = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // "apple pie" block = {1,2}; "apple tart" isolates #3
    assert(out === Set((1L, 2L)))
  }
}
