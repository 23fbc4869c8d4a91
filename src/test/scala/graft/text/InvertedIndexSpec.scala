package graft.text

import graft.SparkSpec
import graft.query.Feeds
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "spark join spark agg"), (2L, "join only here"),
      (3L, "spark alone"), (4L, "spark join"), (5L, ""))
      .toDF("doc_id", "text")
  }

  test("index search = brute-force search (same contract, both paths)") {
    val idx = InvertedIndex.build(docs, "text", "doc_id")
    val viaIndex = InvertedIndex.search(idx, Seq("spark", "join"), 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("score")))
    val brute = Feeds.search(docs, col("text"), Seq("spark", "join"))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("score")))
    assert(viaIndex.toSeq == brute.toSeq)
    assert(viaIndex.toSeq == Seq((1L, 3L), (4L, 2L)))
  }

  test("brute search chunks past WordSetHits' 64-list cap") {
    // a raw user query with 65+ distinct words must not throw
    // (WordSetHits carries <=64 lists per expression; Feeds.search
    // chunks and sums) — and tf must still count every term
    val terms = (1 to 70).map(i => s"t$i")
    import spark.implicits._
    val wide = Seq((1L, terms.mkString(" ") + " t1"), (2L, "t1 only"))
      .toDF("doc_id", "text")
    val got = Feeds.search(wide, col("text"), terms,
      requireAll = false)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 71L), (2L, 1L)))
  }

  test("posting list shape: (term, id, tf)") {
    val idx = InvertedIndex.build(docs, "text", "doc_id")
    val sparkPostings = idx.filter(col("term") === "spark")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("tf")))
      .toSet
    assert(sparkPostings == Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("bucketed posting table: search prunes buckets, same results") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bucketed").toString + "/idx"
    val idx = InvertedIndex.build(docs, "text", "doc_id")
    InvertedIndex.writeBucketed(idx, "graft_test_idx", dir, buckets = 8)
    // without this the planner drops the bucketed layout (a term
    // lookup avoids no shuffle) and with it the bucket pruning —
    // see writeBucketed scaladoc
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val bucketed = InvertedIndex.readBucketed(spark, "graft_test_idx")
      val out = InvertedIndex.search(bucketed, Seq("spark", "join"), 10)
      assert(out.collect().map(r =>
        (r.getAs[Long]("id"), r.getAs[Long]("score"))).toSeq
        == Seq((1L, 3L), (4L, 2L)))
      // bucket pruning is visible in the scan: only the buckets of
      // the query terms are selected, not all 8
      val scan = out.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(scan)
      assert(m.isDefined, s"no bucket pruning in plan:\n$scan")
      assert(m.get.group(1).toInt <= 2)
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_test_idx")
    }
  }

  test("single term and absent term") {
    val idx = InvertedIndex.build(docs, "text", "doc_id")
    assert(InvertedIndex.search(idx, Seq("only"), 10).count() == 1)
    assert(InvertedIndex.search(idx, Seq("absent"), 10).count() == 0)
  }
}
