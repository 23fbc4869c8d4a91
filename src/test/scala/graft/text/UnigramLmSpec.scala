package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {

  test("surprisal: rare tokens cost more than common ones") {
    import spark.implicits._
    // "the" appears 6x, "quux" once → ln(8/6) < ln(8/1). Doc 3 is all
    // rare tokens, doc 1 all common — avg_nll must order 1 < 2 < 3.
    val docs = Seq(
      (1L, "the the the"),
      (2L, "the the quux"),
      (3L, "quux2 the")
    ).toDF("doc_id", "text")
    val out = UnigramLm.surprisal(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 3L, 2L))
    val avg = out.map(_.getDouble(3))
    assert(avg(0) < avg(1) && avg(1) < avg(2))
    // doc 1: 3 tokens of cf=6, N=8 → nll_micro = 3*round(1e6*ln(8/6.0))
    val c6 = Math.round(1e6 * Math.log(8 / 6.0))
    assert(out(0).getLong(2) == 3 * c6)
  }

  test("surprisal: zero-token docs are not emitted") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "   ")).toDF("doc_id", "text")
    val ids = UnigramLm.surprisal(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("corpusOverlap: identical corpora agree on every slot") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "A"),
      (2L, "alpha beta gamma delta epsilon", "B"),
      (3L, "zeta eta theta iota kappa", "C")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.corpusOverlap(docs, "text", "source", k = 16)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // A and B hold the same shingle set → all 16 mins agree, est 1.0
    assert(out(("A", "B")) == ((16L, 1.0)))
    // C shares nothing with A → zero agreement
    assert(out(("A", "C"))._1 == 0L)
    assert(out.size == 3)
  }

  test("corpusOverlap: empty-token docs don't break a corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "A"),
      (2L, "", "A"),
      (3L, "alpha beta gamma delta", "B")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.corpusOverlap(docs, "text", "source", k = 8)
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 8L)
  }
}
