package graft.tools

import graft.state.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: does the plan shape survive a 16× scale-up?
  *
  * Replicates sf0.1 inputs 16-fold (≈10M lineitem rows, 160k events
  * per replica tagged into distinct key spaces so cardinalities scale
  * too) and runs the shuffle-heavy operator shapes. Wall-clock should
  * grow ~linearly with input; anything superlinear flags a plan that
  * would not survive 100 TB.
  */
object ScaleProbe {
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

    def rep(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame = {
      val factor = explode(array((0 until n).map(lit): _*)).as("__rep")
      var out = df.withColumn("__rep", factor)
      keyCols.foreach { k =>
        out = out.withColumn(k, col(k) + col("__rep") * 100000000L)
      }
      out.drop("__rep")
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"($n%,d rows)")
    }

    val li1 = spark.read.parquet(s"$d/lineitem.parquet")
    val or1 = spark.read.parquet(s"$d/orders.parquet")
    val ev1 = graft.Tables.events(spark, d)
    for (n <- Seq(1, 4, 16)) {
      val li = rep(li1, Seq("l_orderkey"), n)
      val or = rep(or1, Seq("o_orderkey", "o_custkey"), n)
      val ev = rep(ev1, Seq("event_id", "user_id"), n)
      println(s"== replication ×$n ==")
      time(s"groupBy+join (children-count)") {
        val counts = li.groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_items"))
        or.join(counts, col("o_orderkey") === col("l_orderkey"), "left")
          .count()
      }
      time(s"latest-wins window (events by user)") {
        Merge.latestWins(ev, Seq("user_id"), col("ts"),
          Seq(col("event_id"))).count()
      }
      time(s"global rank window (leaderboard shape)") {
        or.withColumn("rk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .filter(col("rk") <= 100).count()
      }
      time(s"top-k page (feed shape)") {
        ev.filter(col("event_type") === "view")
          .orderBy(col("ts").desc, col("event_id").desc)
          .limit(100).count()
      }
    }
    spark.stop()
  }
}
