package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupClusterSpec extends SparkSpec {

  test("neardupClusters: components get min-id labels, survivor filter") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3 — needs >1 propagation round),
    // pair 10-11, star 20-21/20-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // driver union-find path (default) and the distributed
    // min-label/pointer-jumping path (forced via driverLimit = 0)
    // must produce identical clusters
    for (limit <- Seq(1L << 20, 0L)) {
      val got = Dedup.neardupClusters(pairs, driverLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.CacheTracker.releaseAll()
      assert(got == expected, s"driverLimit=$limit")
      assert(got.filter { case (id, cl) => id == cl }.keySet ==
        Set(1L, 10L, 20L))
    }
  }

  test("dupNgramStats: corpus-duplicated shingle counts per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),     // {"a b c","b c d"} — both shared
      (2L, "a b c x"),     // {"a b c","b c x"} — one shared
      (3L, "z z"),         // < 3 tokens ⇒ no shingles
      (4L, "b c d e f")    // {"b c d","c d e","d e f"} — one shared
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramStats(docs, "text", "doc_id",
      shingleN = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    graft.CacheTracker.releaseAll()
    assert(got == Set((1L, 2L, 2L), (2L, 2L, 1L), (3L, 0L, 0L),
      (4L, 3L, 1L)))
  }

  test("clusterSurvivors: quality argmax per cluster, ties -> min id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L)).toDF("id", "cluster")
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9),
      (10L, 0.1), (11L, 0.1)).toDF("doc_id", "q")
    val got = Dedup.clusterSurvivors(clusters, scored, "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // cluster 1: q-tie between 2 and 3 -> smaller id 2 (not max-q-any)
    // cluster 10: tie -> 10
    assert(got == Set((1L, 3L, 2L), (10L, 2L, 10L)))
  }

  test("neardupClusters over real minhash pairs at sf0.001") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
      shingleN = 3, k = 32, bands = 8, threshold = 0.2, seed = 42L)
    val clusters = Dedup.neardupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    graft.CacheTracker.releaseAll()
    // every clustered id appears in some pair; labels are component
    // minima (a label is always <= its member ids)
    assert(clusters.nonEmpty)
    assert(clusters.forall { case (id, cl) => cl <= id })
    // labels are themselves members of their own cluster
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1))
    assert(byCluster.forall { case (cl, members) =>
      members.contains(cl) })
  }
}
