package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: wall-time arbitrary catalog queries by name against a
  * testdata dir — `QueryTime <sfDir> <runs> <name> [<name>…]` — the
  * generic form of [[WarmProbe]] (run 1 = cold plans, run 2+ = warm
  * codegen/page cache), for one-off forensics like the r10 d42
  * driver-vs-self delta. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: QueryTime <sfDir> <runs> <q> [..]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; run <- 1 to runs) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.write.mode("overwrite").format("noop").save()
      graft.CacheTracker.releaseAll()
      println(f"$name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
