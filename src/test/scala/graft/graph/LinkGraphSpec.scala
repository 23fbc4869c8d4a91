package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank invariants on hand-computable graphs. */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  // Symmetric 2-cycle a<->b: each node's whole rank flows to the
  // other every step, so pr stays at the fixpoint 1,000,000 forever.
  test("two-node cycle is a fixpoint of the quantized update") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = LinkGraph.pageRank(edges, iters = 5)
      .orderBy("node").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 1000000L), ("b", 1000000L)))
  }

  // Star a<->{b,c,d}: hub splits rank 3 ways, leaves return all of
  // theirs. Hand-run one quantized iteration:
  //   hub:  150000 + 85*(3 * 1000000) div 100      = 2700000
  //   leaf: 150000 + 85*(1000000 div 3) div 100    = 433333
  // and iteration 2:
  //   hub:  150000 + 85*(3 * 433333) div 100       = 1254999
  //   leaf: 150000 + 85*(2700000 div 3) div 100    = 915000
  test("star hub outranks leaves with exact hand-computed values") {
    val fwd = Seq(("a", "b"), ("a", "c"), ("a", "d"))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val r1 = LinkGraph.pageRank(edges, iters = 1)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(r1 == Seq(("a", 2700000L), ("b", 433333L),
      ("c", 433333L), ("d", 433333L)))
    val r2 = LinkGraph.pageRank(edges, iters = 2)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(r2 == Seq(("a", 1254999L), ("b", 915000L),
      ("c", 915000L), ("d", 915000L)))
  }

  // Total mass is conserved up to the truncation losses, which are
  // strictly bounded: each node loses < outdeg remainders + the
  // damping div's < dampDen units per iteration. On the testdata
  // graph shape (bipartite, symmetrized) the sum must stay within
  // nodes * (maxdeg + 100) * iters of n * scale, and ordering by
  // degree must hold (higher-degree suppliers accumulate more).
  test("mass conservation bound on a bipartite graph") {
    val pairs = for { s <- 0 until 4; p <- 0 until 10
      if (s + p) % 3 != 0 } yield (s"s:$s", s"p:$p")
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val n = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.size
    val out = LinkGraph.pageRank(edges, iters = 5)
    assert(out.count() == n)
    val total = out.agg(sum("pr")).as[Long].head()
    val bound = n.toLong * (10 + 100) * 5
    assert(math.abs(total - n * 1000000L) <= bound,
      s"total=$total n=$n bound=$bound")
  }

  // Scale path: edges persisted bucketBy(src) make every iteration's
  // big-side join exchange-free — the rank side is the only shuffle.
  // Proven on the plan, not asserted from the scaladoc: same update,
  // same results, one Exchange fewer, `Bucketed: true` in the scan.
  test("bucketed edges: iteration joins without shuffling the edge side") {
    val pairs = for { s <- 0 until 5; p <- 0 until 8
      if (s + p) % 4 != 0 } yield (s"s:$s", s"p:$p")
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pr-bucketed").toString + "/edges"
    LinkGraph.writeEdgesBucketed(edges, "graft_test_pr_edges", dir,
      buckets = 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = LinkGraph.pageRankBucketed(spark, "graft_test_pr_edges",
        iters = 3).orderBy("node").as[(String, Long)].collect().toSeq
      val ref = LinkGraph.pageRank(edges, iters = 3)
        .orderBy("node").as[(String, Long)].collect().toSeq
      assert(out == ref)

      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString)
          .length
      val pr0 = Seq(("s:0", 1000000L)).toDF("node", "pr")
      val bucketedStep = LinkGraph.iterate(
        spark.table("graft_test_pr_edges"), pr0, 85L, 100L, 1000000L)
      val plainStep = LinkGraph.iterate(
        spark.read.parquet(dir), pr0, 85L, 100L, 1000000L)
      val bPlan = bucketedStep.queryExecution.executedPlan.toString
      assert(bPlan.contains("Bucketed: true"),
        s"edge scan not bucketed:\n$bPlan")
      assert(exchanges(bucketedStep) == exchanges(plainStep) - 1,
        s"bucketed=${exchanges(bucketedStep)} " +
          s"plain=${exchanges(plainStep)}\n$bPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_test_pr_edges")
    }
  }

  test("deterministic across runs") {
    val pairs = for { s <- 0 until 3; p <- 0 until 7 }
      yield (s"s:$s", s"p:$p")
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val a = LinkGraph.pageRank(edges, iters = 4)
      .orderBy("node").as[(String, Long)].collect().toSeq
    val b = LinkGraph.pageRank(edges, iters = 4)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(a == b)
  }
}
