package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: profile the queries that dominate the r02 bench. */
object HotProbe {
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
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // warmup
    graft.Tables.names.foreach(t => graft.Tables.load(spark, d, t).count())

    val counts = graft.Tables.lineitem(spark, d)
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
    val joined = graft.Tables.orders(spark, d)
      .join(counts, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("n_items"), lit(0L)).as("n_items"))
    time("q10 with orderBy")(noop(joined.orderBy("o_orderkey")))
    time("q10 no orderBy")(noop(joined))
    time("q10 with orderBy (2nd)")(noop(joined.orderBy("o_orderkey")))

    val docs = graft.Tables.documents(spark, d)
    time("d03 lang_id")(noop(graft.SparkEntry.queries("d03_lang_id")(spark, d)))
    time("d04 quality")(noop(graft.SparkEntry.queries("d04_quality")(spark, d)))
    time("d05 jaccard")(noop(graft.SparkEntry.queries("d05_jaccard_anchor")(spark, d)))
    time("q18 scalars")(noop(graft.SparkEntry.queries("q18_scalar_funcs")(spark, d)))
    spark.stop()
  }
}
