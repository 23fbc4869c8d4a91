package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-Spark-job breakdown of one micro-batch merge against
  * the 500k-post table built by ScaleEvidence (run that first). */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?"))
            .take(90)))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
        println(f"  job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $desc")
      }
    })
    val postsDir = "/tmp/graft-scale/posts"
    val nPosts = 500000L
    val blocks = spark.range(20)
      .select((col("id") * 6 + 1200).as("id")).select(
        lpad(lower(hex(col("id") + 1 + nPosts * 3)), 8, "0").as("block_id"),
        concat(lit("2024-0"), (col("id") % 6 + 1).cast("string"),
          lit("-01T12:00:00")).as("timestamp"),
        array(struct(
          concat(lit("tx"), col("id")).as("transaction_id"),
          array(struct(lit("comment").as("name"),
            to_json(struct(
              lit("").as("parent_author"), lit("").as("parent_permlink"),
              concat(lit("user"), pmod(col("id"), lit(50000L))).as("author"),
              concat(lit("post"), col("id")).as("permlink"),
              lit("t").as("title"), lit("profiled edit").as("body"),
              lit("""{"app":"3speak/1.0"}""").as("json_metadata")))
              .as("payload"))).as("operations"))).as("transactions"))
    val t0 = System.nanoTime()
    graft.streaming.StreamIngest.mergeBlocksBatch(spark, blocks, postsDir)
    println(f"TOTAL merge: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
