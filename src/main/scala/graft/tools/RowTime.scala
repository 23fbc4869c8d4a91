package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual catalog rows by name (steady-state:
  * each runs twice, second number is quotable).
  * Usage: runMain graft.tools.RowTime d43_novelty d20_dup_ngrams */
object RowTime {
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
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.mode("overwrite").format("noop").save()
      graft.CacheTracker.releaseAll()
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
