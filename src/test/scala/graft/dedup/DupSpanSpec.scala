package graft.dedup

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

/** dupSpanStats interval semantics + the two new scorers (DSIR,
  * hash-linear) — directional and exact-value properties. */
class DupSpanSpec extends SparkSpec {
  import spark.implicits._

  test("dupSpanStats merges overlapping spans; short docs get zero") {
    // "a b c d" shares trigrams "a b c" (start 1) and "b c d" (start 2)
    // with docs 2 and 3 → intervals [1,3] and [2,4] merge to [1,4]:
    // 4 covered, 1 clean token ("x") in doc 1.
    val docs = Seq(
      (1L, "a b c d x"),
      (2L, "a b c"),
      (3L, "b c d"),
      (4L, "totally unrelated words here"),
      (5L, "so")). // < 3 tokens: no shingles
      toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, "text", "doc_id")
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == ((5L, 4L, 1L)))
    assert(byId(2L) == ((3L, 3L, 0L)))
    assert(byId(3L) == ((3L, 3L, 0L)))
    assert(byId(4L) == ((4L, 0L, 4L))) // unique trigrams: nothing covered
    assert(byId(5L) == ((1L, 0L, 1L))) // no shingles, still in output
  }

  test("dupSpanStats: disjoint duplicated spans don't merge") {
    // doc 1 shares "a b c" at start 1 and "x y z" at start 7 —
    // intervals [1,3] and [7,9]: 6 covered of 9.
    val docs = Seq(
      (1L, "a b c q r s x y z"),
      (2L, "a b c"),
      (3L, "x y z")).toDF("doc_id", "text")
    val r = Dedup.dupSpanStats(docs, "text", "doc_id")
      .filter(col("id") === 1L).head()
    assert(r.getLong(1) == 9L && r.getLong(2) == 6L && r.getLong(3) == 3L)
  }

  test("DSIR weights rank target-like docs above off-target docs") {
    // target domain talks about "alpha beta", raw background about
    // "gamma delta". A fresh doc of target vocabulary must outscore a
    // fresh doc of background vocabulary.
    val docs = Seq(
      (1L, "alpha beta alpha beta", "tgt"),
      (2L, "alpha beta beta alpha", "tgt"),
      (3L, "gamma delta gamma delta", "raw"),
      (4L, "gamma delta delta gamma", "raw"),
      (5L, "alpha beta alpha", "raw"),   // target-like content, raw label
      (6L, "gamma delta gamma", "raw")).toDF("doc_id", "text", "source")
    val w = graft.text.Dsir.importanceWeights(
      docs, "text", "doc_id", col("source") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(5L) > w(6L)) // content decides, not the label
    assert(w(1L) > w(3L))
  }

  test("DSIR per-doc weight is the exact integer sum of bucket ratios") {
    val docs = Seq(
      (1L, "alpha beta", "tgt"),
      (2L, "alpha gamma", "raw")).toDF("doc_id", "text", "source")
    val out = graft.text.Dsir.importanceWeights(
      docs, "text", "doc_id", col("source") === "tgt", buckets = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // recompute per-bucket micro-nat ratios driver-side
    val toks = Map("alpha" -> (2L, 1L), "beta" -> (1L, 1L),
      "gamma" -> (1L, 0L)) // token -> (cf_raw, cf_tgt)
    val byBucket = toks.groupBy { case (t, _) =>
      Text.portableHashLocal(t) % 16
    }.map { case (b, m) =>
      b -> (m.values.map(_._1).sum, m.values.map(_._2).sum)
    }
    val nRaw = 4.0; val nTgt = 2.0
    def lr(b: Long): Long = {
      val (cr, ct) = byBucket(b)
      math.round(1e6 * (math.log(ct + 1.0) - math.log(nTgt + 16.0)
        - math.log(cr + 1.0) + math.log(nRaw + 16.0)))
    }
    def bucket(t: String): Long = Text.portableHashLocal(t) % 16
    assert(out(1L) == ((2L, lr(bucket("alpha")) + lr(bucket("beta")))))
    assert(out(2L) == ((2L, lr(bucket("alpha")) + lr(bucket("gamma")))))
  }

  test("hashLinearScore equals the driver-side weight sum; empty = 0") {
    val docs = Seq((1L, "the quick brown fox"), (2L, ""))
      .toDF("doc_id", "text")
    val out = docs.withColumn("s",
        Text.hashLinearScore(Text.tokens(col("text")), buckets = 4096))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def w(t: String): Long = {
      val b = Text.portableHashLocal(t) % 4096
      Math.floorMod(Text.portableHashLocal(s"w#$b"), 2001L) - 1000L
    }
    val expected = Seq("the", "quick", "brown", "fox").map(w).sum
    assert(out(1L) == expected)
    assert(out(2L) == 0L)
  }
}
