package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Dev-only: stage decomposition of d43 novelty at sf0.1. */
object D43Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$l%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.Tables.documents(spark, d)
    docs.count()
    val sets = docs
      .withColumn("__toks", Text.tokens(col("text")))
      .select(col("doc_id"), array_distinct(
        Text.wordShingles(col("__toks"), 3)).as("sh"))
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("tk"))
      .persist()
    t("ex build+persist") { println("  rows=" + ex.count()) }
    val first = ex.groupBy("tk").agg(min("doc_id").as("fid"))
    t("first agg") { println("  groups=" + first.count()) }
    t("join + per-doc agg") {
      ex.join(first, "tk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("ns"),
          count(when(col("fid") === col("doc_id"), 1)).as("nv"))
        .write.mode("overwrite").format("noop").save()
    }
    t("whole pipeline again (warm)") {
      val ex2 = sets.select(col("doc_id"), explode(col("sh")).as("tk"))
        .persist()
      val f2 = ex2.groupBy("tk").agg(min("doc_id").as("fid"))
      ex2.join(f2, "tk").groupBy("doc_id")
        .agg(count(lit(1)).as("ns"),
          count(when(col("fid") === col("doc_id"), 1)).as("nv"))
        .write.mode("overwrite").format("noop").save()
      ex2.unpersist()
    }
    spark.stop()
  }
}
