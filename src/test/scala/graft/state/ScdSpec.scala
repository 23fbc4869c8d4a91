package graft.state

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: Seq[(String, Option[String], String, Long)]) =
    Scd.scd2History(
      rows.toDF("k", "state", "ts", "id")
        .selectExpr("k", "state", "CAST(ts AS TIMESTAMP) AS ts", "id"),
      "k", "state", "ts", "id")
      .orderBy("k", "version").collect()
      .map(r => (r.getLong(r.fieldIndex("version")),
        Option(r.getString(r.fieldIndex("state"))),
        r.getString(r.fieldIndex("valid_to"))))

  test("no-op CDC updates collapse; versions and intervals chain") {
    val h = hist(Seq(
      ("k1", Some("A"), "2024-01-01 00:00:00", 1L),
      ("k1", Some("A"), "2024-01-02 00:00:00", 2L), // no-op
      ("k1", Some("B"), "2024-01-03 00:00:00", 3L)))
    assert(h.toSeq === Seq(
      (1L, Some("A"), "2024-01-03 00:00:00"),
      (2L, Some("B"), "current")))
  }

  test("NULL is a legal state: A→NULL versions, NULL→NULL collapses") {
    val h = hist(Seq(
      ("k1", Some("A"), "2024-01-01 00:00:00", 1L),
      ("k1", None, "2024-01-02 00:00:00", 2L),      // real change
      ("k1", None, "2024-01-03 00:00:00", 3L),      // no-op
      ("k1", Some("B"), "2024-01-04 00:00:00", 4L)))
    assert(h.toSeq === Seq(
      (1L, Some("A"), "2024-01-02 00:00:00"),
      (2L, None, "2024-01-04 00:00:00"),
      (3L, Some("B"), "current")))
  }

  test("NULL first state opens version 1 exactly once") {
    val h = hist(Seq(
      ("k1", None, "2024-01-01 00:00:00", 1L),
      ("k1", None, "2024-01-02 00:00:00", 2L)))
    assert(h.toSeq === Seq((1L, None, "current")))
  }
}
