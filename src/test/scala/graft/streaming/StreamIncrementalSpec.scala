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
  * event history is never rescanned. Two claims proven here:
  * batch-boundary invisibility (view == full recompute at every
  * split, incl. a checkpoint restart) and replay idempotence (the
  * stored batchId guard makes re-delivering a committed batch a
  * no-op, the failure mode of non-transactional foreachBatch sinks).
  */
class StreamIncrementalSpec extends SparkSpec {

  private def view(viewDir: String): DataFrame =
    spark.read.parquet(viewDir).drop("__last_batch")

  test("foreachBatch-maintained view == full recompute at every batch boundary") {
    val dir = Files.createTempDirectory("graft-sivm").toString
    val inDir = s"$dir/in"
    val viewDir = s"$dir/view"
    new java.io.File(inDir).mkdirs()

    def run(): Unit = {
      val in = spark.readStream
        .schema("k string, v long")
        .option("maxFilesPerTrigger", 1) // force one file per batch
        .json(inDir)
      val q = in.writeStream
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(
          Incremental.maintainParquetView(viewDir, Seq("k"), col("v")) _)
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
    val afterTwo = view(viewDir).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(afterTwo.toSeq ===
      Seq(("a", 2L, 12L), ("b", 1L, 1L), ("c", 1L, 7L)))

    // a third batch in a separate run (restart + checkpoint resume)
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b3.json"),
      """{"k":"b","v":5}""")
    run()
    val afterThree = view(viewDir).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(afterThree.toSeq ===
      Seq(("a", 2L, 12L), ("b", 2L, 6L), ("c", 1L, 7L)))
  }

  test("replayed batchId is a no-op (crash between view write and checkpoint commit)") {
    import spark.implicits._
    val viewDir = Files.createTempDirectory("graft-sivm-replay")
      .toString + "/view"
    val handler = Incremental.maintainParquetView(
      viewDir, Seq("k"), col("v")) _
    handler(Seq(("a", 10L)).toDF("k", "v"), 0L)
    handler(Seq(("a", 2L)).toDF("k", "v"), 1L)
    // the crash-replay: batch 1 delivered again — must not double-count
    handler(Seq(("a", 2L)).toDF("k", "v"), 1L)
    val r = view(viewDir).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(("a", 2L, 12L)))
  }

  test("interrupted swap recovers: tmp-only state is adopted, " +
    "stale tmp beside a live view is discarded") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-sivm-swap").toString
    val viewDir = s"$base/view"
    val handler = Incremental.maintainParquetView(
      viewDir, Seq("k"), col("v")) _
    handler(Seq(("a", 10L)).toDF("k", "v"), 0L)
    handler(Seq(("a", 2L)).toDF("k", "v"), 1L)
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash BETWEEN delete and rename: only tmp has data,
    // already carrying __last_batch = 1
    fs.rename(new org.apache.hadoop.fs.Path(viewDir),
      new org.apache.hadoop.fs.Path(viewDir + "__tmp"))
    // checkpoint replays batch 1 on restart: adopt-on-entry must
    // rename tmp in, then the idempotency guard skips the batch
    handler(Seq(("a", 2L)).toDF("k", "v"), 1L)
    val r = view(viewDir).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(("a", 2L, 12L)))
    // simulate a crash MID-TMP-WRITE: data files but no _SUCCESS
    // (job never committed) — the dead write must be discarded and
    // the live view kept
    val tmpPath = new org.apache.hadoop.fs.Path(viewDir + "__tmp")
    Seq(("zz", 99L)).toDF("k", "v")
      .write.mode("overwrite").parquet(tmpPath.toString)
    fs.delete(new org.apache.hadoop.fs.Path(tmpPath, "_SUCCESS"), false)
    handler(Seq(("b", 5L)).toDF("k", "v"), 2L)
    val r2 = view(viewDir).orderBy("k").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r2.toSeq === Seq(("a", 2L, 12L), ("b", 1L, 5L)))
  }

  test("trailing-slash viewDir keeps tmp a SIBLING (swap must not " +
    "nest tmp inside the view dir and destroy both copies)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-sivm-slash").toString
    val viewDir = s"$base/view/"
    val handler = Incremental.maintainParquetView(
      viewDir, Seq("k"), col("v")) _
    handler(Seq(("a", 1L)).toDF("k", "v"), 0L)
    handler(Seq(("a", 2L)).toDF("k", "v"), 1L)
    val r = view(s"$base/view").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(("a", 2L, 3L)))
  }

  test("an EMPTY first batch (zero-row view) does not wedge the sink") {
    import spark.implicits._
    val viewDir = Files.createTempDirectory("graft-sivm-empty")
      .toString + "/view"
    val handler = Incremental.maintainParquetView(
      viewDir, Seq("k"), col("v")) _
    // batch 0 delivers no rows → stored view has schema but 0 rows;
    // the next batch must read it null-safely (max(__last_batch) is
    // null) instead of NPEing on every replay
    handler(Seq.empty[(String, Long)].toDF("k", "v"), 0L)
    handler(Seq(("a", 3L)).toDF("k", "v"), 1L)
    val r = view(viewDir).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(("a", 1L, 3L)))
  }
}
