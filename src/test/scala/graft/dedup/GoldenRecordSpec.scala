package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-record survivorship (catalog d57): attribute-level merge
  * over clusters — composite attributes can come from DIFFERENT
  * members, singletons resolve to themselves, ties deterministic. */
class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  private def run(clusters: Seq[(Long, Long)],
                  recs: Seq[(Long, Long, String)]) =
    Dedup.goldenRecords(
      clusters.toDF("id", "cluster"),
      recs.toDF("doc_id", "n_chars", "lang"),
      "doc_id", "n_chars", "lang")
      .collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("canonical_id"),
          r.getAs[Long]("longest_doc"), r.getAs[Long]("max_len"),
          r.getAs[String]("maj_lang"))))
      .toMap

  test("attributes come from different members of one cluster") {
    // cluster {1,2,3}: min id = 1, longest text = doc 2 (len 50),
    // majority lang = "de" (2 of 3) — three different "winners"
    val out = run(
      clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)),
      recs = Seq((1L, 10L, "en"), (2L, 50L, "de"), (3L, 20L, "de")))
    assert(out(1L) === ((3L, 1L, 2L, 50L, "de")))
  }

  test("singletons (never clustered) resolve to themselves") {
    val out = run(
      clusters = Seq((1L, 1L), (2L, 1L)),
      recs = Seq((1L, 10L, "en"), (2L, 20L, "en"), (7L, 5L, "fr")))
    assert(out.keySet === Set(1L, 7L))
    assert(out(7L) === ((1L, 7L, 7L, 5L, "fr")))
  }

  test("deterministic ties: equal lengths -> smallest id; " +
    "split lang vote -> lexicographically smallest") {
    val out = run(
      clusters = Seq((4L, 4L), (5L, 4L)),
      recs = Seq((4L, 30L, "fr"), (5L, 30L, "de")))
    // len tie 30/30 -> longest_doc = 4; lang vote 1/1 -> "de" < "fr"
    assert(out(4L) === ((2L, 4L, 4L, 30L, "de")))
  }

  test("null attributes never win: null len can't take longest_doc, " +
    "null langs don't vote, all-null keeps the row") {
    val recs = Seq[(Long, java.lang.Long, String)](
      (1L, 10L, null), (2L, null, "en"), (3L, 5L, "en"),
      (7L, 4L, null)) // singleton with null lang
      .toDF("doc_id", "n_chars", "lang")
    val out = Dedup.goldenRecords(
      Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster"),
      recs, "doc_id", "n_chars", "lang").collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    val c = out(1L)
    // doc 2 (null len) must NOT win longest_doc despite struct
    // ordering putting nulls first; max_len likewise ignores it
    assert(c.getAs[Long]("longest_doc") === 1L)
    assert(c.getAs[Long]("max_len") === 10L)
    // null langs don't vote: "en" wins 2-0, not null
    assert(c.getAs[String]("maj_lang") === "en")
    // all-null-lang singleton keeps its golden row, lang null
    assert(out(7L).getAs[String]("maj_lang") === null)
    assert(out(7L).getAs[Long]("max_len") === 4L)
  }

  test("golden rows are total over the corpus") {
    val recs = (1L to 20L).map(i =>
      (i, i * 3L, if (i % 2 == 0) "en" else "de"))
    val out = run(Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)), recs)
    // every record id is covered by exactly one golden row
    val covered = out.map { case (c, (n, _, _, _, _)) => n }.sum
    assert(covered === 20L)
  }
}
