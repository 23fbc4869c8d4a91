package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: second-run timings (codegen warm) for the bench's
  * apparent hotspots. */
object WarmProbe {
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
    for (name <- Seq("q10_children_count", "q06_search", "q16_union",
      "v01_ann_cosine", "m01_minhash_pairs", "m02_simhash_pairs");
         run <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d).count()
      println(f"$name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
