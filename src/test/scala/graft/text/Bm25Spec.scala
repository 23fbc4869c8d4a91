package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    // "rare" appears in 1 doc, "common" in 4; doc 2 repeats "common".
    Seq((1L, "rare common pad pad"), (2L, "common common pad pad"),
      (3L, "common pad pad pad"), (4L, "common pad pad pad"),
      (5L, "pad pad pad pad"))
      .toDF("doc_id", "text")
  }

  private def bm25(terms: String*): Seq[(Long, Double)] =
    Bm25.score(docs, col("text"), terms, 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).toSeq

  test("hand-computed score for a one-term query") {
    // N=5, df(rare)=1, len=4 for all docs => len/avgdl = 1, so the
    // length normalizer is 1 and score = idf * tf*2.2/(tf+1.2).
    val idf = math.log(1 + (5 - 1 + 0.5) / (1 + 0.5))
    val want = BigDecimal(idf * 1 * 2.2 / (1 + 1.2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(bm25("rare") == Seq((1L, want)))
  }

  test("rarity outweighs repetition; non-matching docs dropped") {
    val got = bm25("rare", "common")
    // doc 1 matches the rare term (+ common once) -> highest;
    // doc 2's doubled common term beats docs 3/4's single hit;
    // doc 5 matches nothing and is absent.
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("tf saturation: doubling tf gains less than doubling score") {
    val Seq((_, s2), (_, s3), _*) = bm25("common").sortBy(_._1).drop(1)
    assert(s2 > s3 && s2 < 2 * s3)
  }
}
