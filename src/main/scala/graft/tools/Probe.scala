package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: drives SparkEntry.entry the way the driver's
  * smoke check does (rows > 0 at sf0.001). Not part of the library. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    println(s"entry rows = ${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
