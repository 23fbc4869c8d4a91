package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamDedupSpec extends SparkSpec {

  test("first-seen dedup holds across micro-batches AND restarts (state store)") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val inDir = s"$dir/in"; val outDir = s"$dir/out"
    val ckDir = s"$dir/ck"
    new java.io.File(inDir).mkdirs()

    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"doc_id":1,"text":"hello world"}
        |{"doc_id":2,"text":"unique two"}
        |{"doc_id":3,"text":"hello world"}""".stripMargin)
    val q1 = StreamDedup.run(spark, inDir, outDir, ckDir,
      Trigger.AvailableNow())
    q1.awaitTermination()
    val r1 = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(r1 == Set(1L, 2L))    // doc 3 is an in-batch duplicate

    // restart: duplicate of doc 1 arrives in a NEW query run — the
    // checkpointed state store must still reject it
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"),
      """{"doc_id":4,"text":"hello world"}
        |{"doc_id":5,"text":"fresh content"}""".stripMargin)
    val q2 = StreamDedup.run(spark, inDir, outDir, ckDir,
      Trigger.AvailableNow())
    q2.awaitTermination()
    val r2 = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(r2 == Set(1L, 2L, 5L))  // 4 deduped against state from run 1
  }

  test("dropDuplicatesWithinWatermark: built-in bounded-state dedup") {
    // The built-in alternative to StreamDedup's custom state store:
    // duplicates within the watermark horizon are dropped and the
    // key state is EVICTED past it (bounded memory — the property
    // the unbounded first-seen store trades away). Same key arriving
    // within the horizon dedupes; a later-than-horizon repeat would
    // re-emit, which is the documented semantic difference.
    val dir = Files.createTempDirectory("graft-wdedup").toString
    val inDir = s"$dir/in"
    new java.io.File(inDir).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"doc_id":1,"ts":"2024-01-01T00:00:00Z","text":"a"}
        |{"doc_id":1,"ts":"2024-01-01T00:02:00Z","text":"a dup"}
        |{"doc_id":2,"ts":"2024-01-01T00:03:00Z","text":"b"}
        |{"doc_id":2,"ts":"2024-01-01T00:04:00Z","text":"b dup"}
        |{"doc_id":3,"ts":"2024-01-01T00:05:00Z","text":"c"}""".stripMargin)
    val q = spark.readStream
      .schema("doc_id long, ts timestamp, text string")
      .json(inDir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$dir/out")
      .start()
    q.awaitTermination()
    val ids = spark.read.parquet(s"$dir/out").collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L)) // one row per key survives
  }

  test("SyncMetrics listener folds per-batch progress into the stats shape (A10)") {
    val dir = Files.createTempDirectory("graft-metrics").toString
    val inDir = s"$dir/in"
    new java.io.File(inDir).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"doc_id":10,"text":"m one"}
        |{"doc_id":11,"text":"m two"}""".stripMargin)
    val metrics = SyncMetrics.attach(spark)
    try {
      val q = StreamDedup.run(spark, inDir, s"$dir/out", s"$dir/ck",
        Trigger.AvailableNow())
      q.awaitTermination()
      // listener events are async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.current.batches == 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val s = metrics.current
      assert(s.batches >= 1)
      assert(s.rowsIngested == 2)
      assert(metrics.etaSeconds(0) == 0.0)
      assert(metrics.etaSeconds(1000) > 0)
      // Q6: the snapshot materializes as a queryable stats-singleton
      // row (resolvers/index.ts:352-362 shape)
      val row = metrics.stateRow(spark, headHeight = 1500L,
        currentHeight = 1000L, lastLag = 600L).collect().head
      assert(row.getAs[String]("key") == "stats")
      assert(row.getAs[Long]("block_height_current") == 1000L)
      assert(row.getAs[Long]("block_lag") == 500L)
      assert(row.getAs[Long]("block_lag_diff") == -100L)
      assert(row.getAs[Long]("sync_eta_seconds") > 0L)
    } finally spark.streams.removeListener(metrics)
  }

  test("batch mode: same operator on a static DataFrame") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = StreamDedup.firstSeen(docs)(spark).collect()
      .map(_.doc_id).toSet
    assert(out == Set(1L, 3L))
  }
}
