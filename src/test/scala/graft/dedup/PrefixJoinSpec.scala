package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-filtering exact set-similarity join (catalog d41):
  * output must EQUAL the brute-force all-pairs enumeration — the
  * recall-1-by-construction contract. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  // 12 docs: three near-dup families (small single-word edits of a
  // long base) + unrelated filler, so some pairs sit above 0.8
  // Jaccard, some between 0.5 and 0.8, most near zero.
  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val docs = Seq(
    0L -> base,
    1L -> base.replace("delta", "DELTA"),
    2L -> base.replace("sigma", "SIGMA"),
    3L -> base.replace("alpha beta gamma delta epsilon zeta",
      "one two three four five six"),
    4L -> "completely different words entirely here nothing shared",
    5L -> "completely different words entirely here nothing shared",
    6L -> ("foo bar " * 12).trim,
    7L -> (("foo bar " * 12).trim + " extra"),
    8L -> "short",
    9L -> "", // no shingles — must be ignored, not crash
    10L -> (base + " omega"),
    11L -> "unrelated tail omega psi chi phi just filler words here")
    .toDF("doc_id", "text")

  private def bruteForce(tNum: Int, tDen: Int): Set[(Long, Long)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.as[(Long, String)].collect().toSeq
      .map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      i = (sa & sb).size; u = sa.size + sb.size - i
      if i * tDen >= u * tNum
    } yield (ia, ib)).toSet
  }

  test("output equals brute force at t=4/5 (recall AND precision)") {
    val got = Dedup.prefixFilterJoinPairs(docs, "text", "doc_id",
        shingleN = 3, tNum = 4, tDen = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CacheTracker.releaseAll()
    assert(got === bruteForce(4, 5))
    assert(got.nonEmpty) // the fixture really has qualifying pairs
  }

  test("lower threshold t=1/2 widens the pair set, still exact") {
    val got = Dedup.prefixFilterJoinPairs(docs, "text", "doc_id",
        shingleN = 3, tNum = 1, tDen = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CacheTracker.releaseAll()
    val want = bruteForce(1, 2)
    assert(got === want)
    assert(bruteForce(4, 5).subsetOf(want))
  }

  test("containment join finds subset dups Jaccard misses") {
    // doc 20 is a verbatim contiguous slice of doc 0's base text:
    // every 3-shingle of the slice appears in the base, so
    // containment = 1.0 while Jaccard is ~6/18 — invisible to the
    // symmetric join at t=1/2, found by the containment join at 9/10
    val subset = "epsilon zeta eta theta iota kappa lambda mu"
    val withSub = docs.unionByName(
      Seq(20L -> subset).toDF("doc_id", "text"))
    val cont = Dedup.containmentJoinPairs(withSub, "text", "doc_id",
        shingleN = 3, tNum = 9, tDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CacheTracker.releaseAll()
    val jac = Dedup.prefixFilterJoinPairs(withSub, "text", "doc_id",
        shingleN = 3, tNum = 1, tDen = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CacheTracker.releaseAll()
    assert(cont.contains((0L, 20L)))
    assert(!jac.contains((0L, 20L)))
    // and subset pairs against the near-identical variants too
    assert(cont.contains((1L, 20L)) && cont.contains((2L, 20L)))
  }

  test("containment output equals brute force at t=9/10") {
    val got = Dedup.containmentJoinPairs(docs, "text", "doc_id",
        shingleN = 3, tNum = 9, tDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CacheTracker.releaseAll()
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.as[(Long, String)].collect().toSeq
      .map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val want = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      i = (sa & sb).size
      if i * 10 >= math.min(sa.size, sb.size) * 9
    } yield (ia, ib)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("emitted set sizes are the exact intersection/union") {
    val row = Dedup.prefixFilterJoinPairs(docs, "text", "doc_id",
        shingleN = 3, tNum = 4, tDen = 5)
      .filter(col("id_a") === 6L && col("id_b") === 7L)
      .select("n_inter", "n_union").as[(Long, Long)].collect()
    graft.CacheTracker.releaseAll()
    // repeated-phrase docs collapse to tiny distinct-shingle sets;
    // assert against the same sets computed driver-side
    def shingles(t: String): Set[String] = t.toLowerCase
      .split("\\s+").filter(_.nonEmpty).sliding(3).map(_.mkString(" "))
      .toSet
    val sa = shingles(("foo bar " * 12).trim)
    val sb = shingles(("foo bar " * 12).trim + " extra")
    val i = (sa & sb).size.toLong
    val u = sa.size + sb.size - i
    if (i * 5 >= u * 4) assert(row.toSeq === Seq((i, u)))
    else assert(row.isEmpty)
  }
}
