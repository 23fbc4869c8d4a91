package graft.tools
import org.apache.spark.sql.SparkSession
object D10Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("d10_corpus_filter", "d03_lang_id", "d04_quality", "d16_top_tfidf_term")) {
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
      val plan = df.queryExecution.executedPlan.toString
      val nTok = "split\\(lower\\(".r.findAllIn(plan).length
      println(s"$n: tokenizer x$nTok")
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
          .write.mode("overwrite").format("noop").save()
        println(f"  run$i: ${(System.nanoTime()-t0)/1e9}%.2f")
        graft.CacheTracker.releaseAll()
      }
    }
    spark.stop()
  }
}
