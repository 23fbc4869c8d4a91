package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stemmed-mode parity AT BENCH SCALE (VERDICT r9 #5): the sf0.1
  * corpus (the bench fixture, 5k docs × ~100 tokens), a stemmed
  * inverted index built over it — including the bucketed persisted
  * layout — and a query set of inflected forms, pinned
  * brute-stemmed == indexed-stemmed result-for-result. The sf-small
  * StemSpec proves the contract on hand-picked vocabulary; this
  * spec proves the two plans cannot diverge on real corpus-scale
  * term distributions (hash-bucketed postings, 64-term WordSetHits
  * chunking, top-k tie-breaks all exercised for real). */
class StemScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.1")

  // inflected queries whose STEMS hit the corpus vocabulary (the
  // corpus says "sort", "value", "query", "group", "filter" — these
  // forms only match through the stemmer)
  private val queries = Seq(
    Seq("sorting"),
    Seq("values", "queries"),
    Seq("grouping", "filtered"),
    Seq("joining", "windows", "streaming"))

  private def bruteTopK(terms: Seq[String], k: Int,
                        requireAll: Boolean): Seq[(Long, Long)] =
    graft.query.Feeds.search(docs, col("text"), terms,
        requireAll = requireAll, stem = true)
      .select(col("doc_id"), col("score").cast("long"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .as[(Long, Long)].collect().toSeq

  test("sf0.1: stemmed inverted index == stemmed brute force for a " +
    "query set, requireAll and any-term, top-k order and scores") {
    val idx = InvertedIndex.build(docs, "text", "doc_id", stem = true)
      .cache()
    try {
      for (terms <- queries; requireAll <- Seq(true, false)) {
        val viaIdx = InvertedIndex.search(idx, terms, k = 50,
            requireAll = requireAll, stem = true)
          .as[(Long, Long)].collect().toSeq
        val viaBrute = bruteTopK(terms, 50, requireAll)
        assert(viaIdx == viaBrute,
          s"terms=$terms requireAll=$requireAll\nidx=$viaIdx\n" +
            s"brute=$viaBrute")
        assert(viaIdx.nonEmpty, s"query set must hit: $terms")
      }
      // the corpus's own surface forms keep working stemmed (a stem
      // mode that broke exact-form recall would be a regression the
      // small spec can't see: "sort" must still find sort-docs)
      val surface = InvertedIndex.search(idx, Seq("sort"), k = 20,
          stem = true).as[(Long, Long)].collect().toSeq
      assert(surface == bruteTopK(Seq("sort"), 20, requireAll = true))
    } finally idx.unpersist()
  }

  test("sf0.1: the BUCKETED persisted stemmed index serves the same " +
    "results as the in-memory build (the scale layout is not a " +
    "different contract)") {
    val dir = java.nio.file.Files
      .createTempDirectory("stem-bucketed").toString + "/idx"
    val idx = InvertedIndex.build(docs, "text", "doc_id", stem = true)
    InvertedIndex.writeBucketed(idx, "graft_stem_scale_idx", dir,
      buckets = 16)
    // see writeBucketed scaladoc
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val stored = InvertedIndex.readBucketed(spark,
        "graft_stem_scale_idx")
      for (terms <- queries) {
        val viaStored = InvertedIndex.search(stored, terms, k = 50,
            requireAll = false, stem = true)
          .as[(Long, Long)].collect().toSeq
        assert(viaStored == bruteTopK(terms, 50, requireAll = false),
          s"terms=$terms")
      }
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_stem_scale_idx")
    }
  }
}
