package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where do q29's seconds go? Times the edge build and each
  * power iteration separately at sf0.1, and prints the join strategy
  * AQE actually picked for the rank join. */
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val li = graft.CacheTracker.persistTracked(Tables.lineitem(spark, d)
      .select(col("l_suppkey").cast("long").as("sk"),
        col("l_partkey").cast("long").as("pk"))
      .distinct())
    val edges = li.select(
        concat(lit("s:"), col("sk")).as("src"),
        concat(lit("p:"), col("pk")).as("dst"))
      .unionByName(li.select(
        concat(lit("p:"), col("pk")).as("src"),
        concat(lit("s:"), col("sk")).as("dst")))
    t("edges count")(edges.count())
    val es = graft.CacheTracker.persistTracked(edges)
    t("es materialize")(es.count())
    val deg = es.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = graft.CacheTracker.persistTracked(
      es.join(deg, "src").select("src", "dst", "outdeg"))
    t("e materialize")(e.count())
    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    t("iter 0 (rank init)")(pr.count())
    for (i <- 1 to 5) {
      pr = graft.graph.LinkGraph.iterate(e, pr, 85L, 100L, 1000000L)
      val frozen = pr
      t(s"iter $i cumulative")(frozen.count())
    }
    val plan = pr.queryExecution.executedPlan
    val joins = plan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .take(12).mkString("\n")
    println(joins)
    spark.stop()
  }
}
