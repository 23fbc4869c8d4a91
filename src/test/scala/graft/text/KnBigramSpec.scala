package graft.text

import graft.SparkSpec

/** Kneser–Ney bigram surprisal (catalog d56): hand-computed
  * probabilities and the continuation-count discrimination add-one
  * smoothing is structurally blind to. */
class KnBigramSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed KN costs on a 2-doc corpus") {
    // corpus bigram tokens: (a,b)×2, (b,a)×1 → types T = 2
    // c1(a)=2 n1fw(a)=1; c1(b)=1 n1fw(b)=1; n1bw(b)=1 n1bw(a)=1
    val docs = Seq((1L, "a b a b"), (2L, "b")).toDF("doc_id", "text")
    val out = UnigramLm.knBigramSurprisal(docs, "text", "doc_id")
      .collect()
    // doc 2 has one token → no bigrams → not emitted
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    val r = out.head
    assert(r.getLong(1) === 3L)
    // P(b|a) = (2−.75)/2 + (.75·1/2)·(1/2) = 0.8125
    // P(a|b) = (1−.75)/1 + (.75·1/1)·(1/2) = 0.625
    val exp = 2 * Math.round(1e6 * -Math.log(0.8125)) +
      Math.round(1e6 * -Math.log(0.625))
    assert(r.getLong(2) === exp)
  }

  test("continuation counts: a word seen after MANY contexts gets " +
    "more backoff mass than an equally frequent single-context word") {
    // the "San Francisco" effect: f occurs 4× but 3 of them after s;
    // d occurs 4× after 4 DISTINCT predecessors. From the novel
    // context z (one observation each), KN must prefer d.
    val docs = Seq(
      (1L, "s f"), (2L, "s f"), (3L, "s f"),
      (4L, "p d"), (5L, "q d"), (6L, "r d"),
      (7L, "z f"), (8L, "z d")).toDF("doc_id", "text")
    val nll = UnigramLm.knBigramSurprisal(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 7 = cost(f|z), doc 8 = cost(d|z): same c12=1, same c1(z)=2 —
    // only the continuation count differs (n1bw(f)=2 vs n1bw(d)=4)
    assert(nll(7L) > nll(8L))
    // add-one smoothing scores them IDENTICALLY (same c12, same c1(z))
    val addOne = UnigramLm.bigramSurprisal(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(addOne(7L) === addOne(8L))
  }

  test("observed-bigram probabilities never exceed 1 and are positive") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "a cat sat")).toDF("doc_id", "text")
    val out = UnigramLm.knBigramSurprisal(docs, "text", "doc_id")
      .collect()
    // nll_micro ≥ 0 ⇔ every P ≤ 1 (cost = −ln P ≥ 0); finite ⇔ P > 0
    out.foreach { r =>
      assert(r.getLong(2) >= 0L,
        s"doc ${r.getLong(0)} has negative total cost (some P > 1)")
    }
  }
}
