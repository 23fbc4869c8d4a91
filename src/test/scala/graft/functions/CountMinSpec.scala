package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private def toks(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("tok")
  }

  test("estimate never underestimates and is exact without collisions") {
    // 3 distinct terms into a 1024-wide sketch: collision probability
    // over 4 rows is negligible, so est == exact for every term
    val t = toks(Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma"))
    val sk = CountMin.sketch(t, "tok")
    val terms = toks(Seq("alpha", "beta", "gamma")).distinct()
    val got = CountMin.estimate(sk, terms, "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("absent term with an empty bucket estimates 0 (empty rows join the min)") {
    // wide sketch + tiny corpus: an unseen term's buckets are almost
    // surely all empty — the CMS min must include them and report 0,
    // not drop to the populated-bucket collision count (inner-join
    // bug) or vanish from the output
    val sk = CountMin.sketch(toks(Seq("alpha", "beta")), "tok",
      depth = 4, width = 65536)
    val got = CountMin.estimate(sk, toks(Seq("missing")), "tok",
      depth = 4, width = 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("missing" -> 0L))
  }

  test("forced collisions overestimate, never underestimate") {
    // width 1 forces every term into the same bucket of every row:
    // each estimate must be the total instance count
    val t = toks(Seq("a", "a", "b", "c"))
    val sk = CountMin.sketch(t, "tok", depth = 4, width = 1)
    val got = CountMin.estimate(sk, toks(Seq("a", "b")).distinct(),
      "tok", depth = 4, width = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 4L, "b" -> 4L))
  }

  test("sketch is mergeable: union of corpora == sketch of union") {
    val t1 = toks(Seq("x", "y", "x"))
    val t2 = toks(Seq("x", "z"))
    val merged = CountMin.sketch(t1.union(t2), "tok")
    val summed = CountMin.sketch(t1, "tok")
      .union(CountMin.sketch(t2, "tok"))
      .groupBy("j", "b").agg(sum("c").as("c"))
    assert(merged.except(summed).count() == 0 &&
      summed.except(merged).count() == 0)
  }
}
