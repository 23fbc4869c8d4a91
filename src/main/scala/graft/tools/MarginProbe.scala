package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: v15-exact vs v16-IVF margin mining at a chosen
  * replication factor (the 100× point the full sweep recorded before
  * v16 existed). Usage: runMain graft.tools.MarginProbe [reps]
  * [alsoExact]. */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.map(_.toInt).getOrElse(100)
    val alsoExact = args.lift(1).contains("exact")
    val e0 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val emb = (0 until reps).map(i => e0
      .withColumn("vec_id", col("vec_id") + i * 100000000L)
      .withColumn("label", col("label") + i * 100))
      .reduce(_ unionByName _)
    val a = emb.filter(col("label") % 100 < 5 &&
      col("vec_id") % reps === 0)
    val b = emb.filter(col("label") % 100 >= 5)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  $n%,10d rows")
    }
    val cents = emb.filter(col("vec_id") < 64)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toSeq)).toSeq
    timed(s"v16 IVF margin (nlist=64 nprobe=4, ${reps}x)") {
      val n = graft.functions.Vectors.marginMiningIvf(a, b,
        "embedding", "vec_id", k = 4, cents, nprobe = 4).count()
      graft.CacheTracker.releaseAll(); n
    }
    if (alsoExact) timed(s"v15 exact margin (${reps}x)") {
      val n = graft.functions.Vectors.marginMining(a, b,
        "embedding", "vec_id", k = 4, allowExact = true).count()
      graft.CacheTracker.releaseAll(); n
    }
    spark.stop()
  }
}
