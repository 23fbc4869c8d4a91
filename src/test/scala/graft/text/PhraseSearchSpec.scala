package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional index + exact phrase search (catalog q46). */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    0L -> "the quick brown fox jumps over the lazy dog",
    1L -> "quick brown dog sleeps while the brown fox waits",
    2L -> "the quick brown fox and the quick brown fox again",
    3L -> "brown quick the fox out of order tokens only",
    4L -> "no relevant words at all",
    5L -> "Quick Brown FOX uppercase still matches tokenizer")
    .toDF("doc_id", "text")

  private def search(phrase: String*): Map[Long, Long] =
    InvertedIndex.phraseSearch(
      InvertedIndex.buildPositional(docs, "text", "doc_id"),
      phrase)
      .as[(Long, Long)].collect().toMap

  test("consecutive positions only, case-insensitive, counted per doc") {
    val got = search("quick", "brown", "fox")
    // doc 1 has quick+brown+fox but never consecutive as a trigram;
    // doc 3 has all three words out of order
    assert(got === Map(0L -> 1L, 2L -> 2L, 5L -> 1L))
  }

  test("single-term phrase degenerates to term occurrence counts") {
    val got = search("brown")
    assert(got === Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L, 5L -> 1L))
  }

  test("repeated term in the phrase joins at its own offset") {
    val d = Seq(10L -> "go go go stop", 11L -> "go stop go")
      .toDF("doc_id", "text")
    val got = InvertedIndex.phraseSearch(
      InvertedIndex.buildPositional(d, "text", "doc_id"),
      Seq("go", "go"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 2L)) // positions (0,1) and (1,2)
  }

  test("phrase absent everywhere yields an empty result") {
    assert(search("lazy", "fox").isEmpty)
  }
}
