package graft.tools

import graft.functions.{CountMin, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dissect q27 stage by stage. */
object CmsDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val cached = graft.Tables.documents(spark, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
    println("tokens: " + cached.count())
    val sk = CountMin.sketch(cached, "tok")
    println("sketch rows: " + sk.count())
    sk.show(3)
    val top = cached.groupBy("tok")
      .agg(count(lit(1)).cast("long").as("exact"))
      .orderBy(col("exact").desc, col("tok")).limit(20)
    println("top rows: " + top.count())
    val est = CountMin.estimate(sk, top, "tok")
    println("est rows: " + est.count())
    est.show(5)
    val joined = est.join(top, "tok")
    println("joined rows: " + joined.count())
    spark.stop()
  }
}
