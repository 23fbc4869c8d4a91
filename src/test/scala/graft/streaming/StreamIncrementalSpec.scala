package graft.streaming

import graft.SparkSpec
import graft.state.Incremental
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming face of [[graft.state.Incremental]]: a foreachBatch
  * sink maintaining the stored partials view per micro-batch — the
  * metrics-refresh pattern where each trigger costs O(batch) and the
  * event history is never rescanned. Batch-boundary invisibility is
  * the claim: the view after any batch split equals the full
  * recompute over everything ingested so far. */
class StreamIncrementalSpec extends SparkSpec {

  test("foreachBatch-maintained view == full recompute at every batch boundary") {
    val dir = Files.createTempDirectory("graft-sivm").toString
    val inDir = s"$dir/in"
    val viewDir = s"$dir/view"
    new java.io.File(inDir).mkdirs()

    def readView(): Option[DataFrame] =
      if (new java.io.File(viewDir).exists())
        Some(spark.read.parquet(viewDir))
      else None

    def run(): Unit = {
      val in = spark.readStream
        .schema("k string, v long")
        .option("maxFilesPerTrigger", 1) // force one file per batch
        .json(inDir)
      val q = in.writeStream
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val updated = readView() match {
            case None => Incremental.partial(batch, Seq("k"), col("v"))
            case Some(view) =>
              Incremental.merge(view, batch, Seq("k"), col("v"))
          }
          // tiny view: rewrite whole (bucketed/merge-scoped at scale)
          val rows = updated.collect()
          val tmp = spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq), updated.schema)
          tmp.coalesce(1).write.mode("overwrite").parquet(viewDir)
        }
        .start()
      q.awaitTermination()
    }

    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"k":"a","v":10}
        |{"k":"b","v":1}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"),
      """{"k":"a","v":2}
        |{"k":"c","v":7}""".stripMargin)
    run()
    val afterTwo = readView().get.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(afterTwo.toSeq ===
      Seq(("a", 2L, 12L), ("b", 1L, 1L), ("c", 1L, 7L)))

    // a third batch in a separate run (restart + checkpoint resume)
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b3.json"),
      """{"k":"b","v":5}""")
    run()
    val afterThree = readView().get.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(afterThree.toSeq ===
      Seq(("a", 2L, 12L), ("b", 2L, 6L), ("c", 1L, 7L)))
  }
}
