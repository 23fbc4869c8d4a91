package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where do q29's seconds go? Times the edge build and the
  * full [[graft.graph.LinkGraph.pageRank]] run (broadcast-contrib
  * in-memory path). `args(0)` replicates the sf0.1 bipartite graph
  * reps× with disjoint key spaces — node AND edge count scale
  * linearly, so 100× ≈ 1.2M nodes / 12M directed edges — to show the
  * per-iteration broadcast+aggregate loop holds an order of magnitude
  * up. */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val reps = args.headOption.map(_.toInt).getOrElse(1)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val li0 = Tables.lineitem(spark, d)
      .select(col("l_suppkey").cast("long").as("sk"),
        col("l_partkey").cast("long").as("pk"))
      .distinct()
    val li = graft.CacheTracker.persistTracked(
      if (reps == 1) li0
      else (0 until reps).map(i =>
        li0.select((col("sk") + i * 100000000L).as("sk"),
          (col("pk") + i * 100000000L).as("pk")))
        .reduce(_ unionByName _))
    val edges = li.select(
        concat(lit("s:"), col("sk")).as("src"),
        concat(lit("p:"), col("pk")).as("dst"))
      .unionByName(li.select(
        concat(lit("p:"), col("pk")).as("src"),
        concat(lit("s:"), col("sk")).as("dst")))
    t(s"edges count (${reps}x)")(edges.count())
    val pr = t("pageRank 5 iters (full)") {
      graft.graph.LinkGraph.pageRank(edges, iters = 5)
    }
    t("materialize ranks")(pr.count())
    graft.CacheTracker.releaseAll()
    spark.stop()
  }
}
