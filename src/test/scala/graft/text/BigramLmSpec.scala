package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram surprisal (catalog d46): hand-computed smoothed costs,
  * word-order sensitivity (the signal unigrams can't see). */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-one costs on a 2-doc corpus") {
    // corpus bigrams: "a b" x2, "b a" x1; unigrams a=2 b=3, V=2
    val docs = Seq((1L, "a b a b"), (2L, "b")).toDF("doc_id", "text")
    val out = UnigramLm.bigramSurprisal(docs, "text", "doc_id")
      .collect()
    // doc 2 has one token → no bigrams → not emitted
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    val r = out.head
    assert(r.getLong(1) === 3L) // a-b, b-a, a-b
    // cost(a,b) = ln((c(a)+V)/(c(ab)+1)) = ln(4/3)
    // cost(b,a) = ln((c(b)+V)/(c(ba)+1)) = ln(5/2)
    val exp = 2 * Math.round(1e6 * Math.log(4 / 3.0)) +
      Math.round(1e6 * Math.log(5 / 2.0))
    assert(r.getLong(2) === exp)
  }

  test("word order changes the score where unigrams cannot") {
    // same token multiset, different order: doc 2's bigrams are
    // corpus-rare → higher bigram nll; unigram nll identical
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "mat the on sat cat the"),
      (3L, "the cat sat on the mat"),
      (4L, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val bi = UnigramLm.bigramSurprisal(docs, "text", "doc_id")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val uni = UnigramLm.surprisal(docs, "text", "doc_id")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(uni(1L) === uni(2L))      // unigram-blind
    assert(bi(2L) > bi(1L))          // bigram catches the shuffle
    assert(bi(1L) === bi(3L))        // deterministic
  }
}
