package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Porter stemmer: known-vocabulary pairs (hand-derived from the
  * published algorithm, step by step), expression/driver parity, and
  * the searchFeed stem mode end-to-end ("running" matches "run" —
  * the Mongo-$text parity contract, reference db.ts:61-63). */
class StemSpec extends SparkSpec {
  import spark.implicits._

  test("porter stem: known vocabulary pairs") {
    val pairs = Seq(
      // step 1a plurals
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      // step 1b -ed/-ing with cleanup rules
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "sized" -> "size",
      "hopping" -> "hop", "falling" -> "fall", "hissing" -> "hiss",
      "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
      "running" -> "run",
      // step 1c y→i
      "happy" -> "happi", "sky" -> "sky",
      // steps 2-4 suffix chains
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "operator" -> "oper",
      "generalization" -> "gener", "argument" -> "argument",
      "abilities" -> "abil",
      // guards: short words / non-alpha pass through
      "as" -> "as", "is" -> "is", "r0_token" -> "r0_token",
      "42" -> "42", "" -> "")
    pairs.foreach { case (w, expect) =>
      assert(PorterStem.stem(w) == expect,
        s"stem($w) = ${PorterStem.stem(w)}, expected $expect")
    }
  }

  test("StemTokens expression == driver stem per element; nulls and " +
    "empties preserved") {
    val words = Seq("running", "ponies", "nationalization", "the",
      "flies", "died", "owed", "owing", "sky", "crying", "electricity",
      "triplicate", "dependent", "goodness", "hopeful", "radically")
    val df = Seq((1, words)).toDF("id", "toks")
      .select(PorterStem.stemTokens(col("toks")).as("st"))
    val got = df.as[Seq[String]].collect().head
    assert(got == words.map(PorterStem.stem), got.toString)
    // null element + empty array survive the one-pass expression
    val withNull = Seq((1, Seq[String](null, "running", "")))
      .toDF("id", "toks")
      .select(PorterStem.stemTokens(col("toks")).as("st"))
      .collect().head.getSeq[String](0)
    assert(withNull == Seq(null, "run", ""))
    val empty = Seq((1, Seq.empty[String])).toDF("id", "toks")
      .select(PorterStem.stemTokens(col("toks")).as("st"))
      .collect().head.getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("searchFeed stem mode: 'running' matches a document " +
    "containing 'run'; default stays token-exact") {
    val docs = Seq(
      (1L, "they run fast every day"),
      (2L, "a runner was running here"),
      (3L, "nothing relevant")).toDF("doc_id", "text")
    // default (oracle contract): no morphological recall
    val exact = graft.query.Feeds.search(docs, col("text"),
      Seq("running"), requireAll = false)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(2L))
    // stem mode: query and corpus meet at the stem "run"
    val stemmed = graft.query.Feeds.search(docs, col("text"),
      Seq("running"), requireAll = false, stem = true)
      .select("doc_id").as[Long].collect().toSet
    assert(stemmed == Set(1L, 2L))
    // score counts STEM occurrences (doc 2: runner→runner? no —
    // "runner" stems to "runner" (step4 'er' needs m>1), "running"
    // stems to "run": doc 2 contributes exactly its one "running")
    val s2 = graft.query.Feeds.search(docs, col("text"),
      Seq("running"), requireAll = false, stem = true)
      .filter(col("doc_id") === 2L)
      .select("score").as[Long].collect().head
    assert(s2 == 1L)
  }

  test("inverted index stem mode agrees with the brute-force stem " +
    "path (one contract, two plans)") {
    val docs = Seq(
      (1L, "connections connected connecting"),
      (2L, "connection"),
      (3L, "unrelated words here")).toDF("doc_id", "text")
    val idx = graft.text.InvertedIndex.build(docs, "text", "doc_id",
      stem = true)
    val viaIdx = graft.text.InvertedIndex.search(idx,
      Seq("connect"), k = 10, requireAll = true, stem = true)
      .select("id", "score").as[(Long, Long)].collect().toSet
    val viaBrute = graft.query.Feeds.search(docs, col("text"),
      Seq("connect"), requireAll = true, stem = true)
      .select(col("doc_id"), col("score").cast("long"))
      .as[(Long, Long)].collect().toSet
    // "connections/connected/connecting/connection" all stem to
    // "connect": doc 1 scores 3, doc 2 scores 1
    assert(viaIdx == Set((1L, 3L), (2L, 1L)), viaIdx.toString)
    assert(viaBrute == viaIdx)
    // the same index queried WITHOUT the flag misses (the analyzer
    // flags must travel together — documented contract)
    val mixed = graft.text.InvertedIndex.search(idx,
      Seq("connections"), k = 10).collect()
    assert(mixed.isEmpty)
  }
}
