package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class WindowedCountsSpec extends SparkSpec {

  test("streaming session windows: cross-batch merge, gap close, watermark emit") {
    val dir = Files.createTempDirectory("graft-session").toString
    val inDir = s"$dir/in"
    new java.io.File(inDir).mkdirs()
    val in = spark.readStream
      .schema("ts timestamp, user string, value double")
      .json(inDir)
    def run(): Unit = {
      val q = WindowedCounts.sessions(in, "ts", "user",
        gap = "1 minute", lateness = "10 minutes")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", s"$dir/out")
        .start()
      q.awaitTermination()
    }
    // batch 1: one open session for alice
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"ts":"2024-01-01T00:00:10","user":"alice","value":1.0}
        |{"ts":"2024-01-01T00:00:40","user":"alice","value":2.0}"""
        .stripMargin)
    run()
    // batch 2: extends alice's OPEN session across the micro-batch
    // boundary (state-store session merge); bob starts his own
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"),
      """{"ts":"2024-01-01T00:01:30","user":"alice","value":3.0}
        |{"ts":"2024-01-01T00:03:00","user":"bob","value":5.0}"""
        .stripMargin)
    run()
    // batch 3: watermark advancer — finalizes both sessions
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b3.json"),
      """{"ts":"2024-01-01T12:00:00","user":"carol","value":0.1}""")
    run()

    val rows = spark.read.parquet(s"$dir/out").collect()
      .map(r => r.getAs[String]("user") ->
        ((r.getAs[java.sql.Timestamp]("session_start").toString,
          r.getAs[java.sql.Timestamp]("session_end").toString,
          r.getAs[Long]("n_events"), r.getAs[Double]("total"))))
      .toMap
    // alice: 3 events spanning two micro-batches, ONE merged session;
    // end = last event (00:01:30) + 1 min gap
    assert(rows("alice")._3 == 3 && rows("alice")._4 == 6.0)
    assert(rows("alice")._1.startsWith("2024-01-01 00:00:10"))
    assert(rows("alice")._2.startsWith("2024-01-01 00:02:30"))
    assert(rows("bob")._3 == 1)
    // carol's session is still open — watermark hasn't passed it
    assert(!rows.contains("carol"))
  }

  test("streaming tumbling window with watermark: finalized windows emit, late rows drop") {
    val dir = Files.createTempDirectory("graft-window").toString
    val inDir = s"$dir/in"
    new java.io.File(inDir).mkdirs()
    // batch 1: two windows of events + advance the watermark far ahead
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"ts":"2024-01-01T00:00:10","event_type":"view","value":1.0}
        |{"ts":"2024-01-01T00:00:40","event_type":"view","value":2.0}
        |{"ts":"2024-01-01T00:01:10","event_type":"click","value":3.0}
        |{"ts":"2024-01-01T02:00:00","event_type":"view","value":0.5}"""
        .stripMargin)
    val in = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .json(inDir)
    val q = WindowedCounts.tumbling(in, "ts", "event_type",
      "1 minute", "10 minutes")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$dir/out")
      .start()
    q.awaitTermination()

    // batch 2: a very late row for window 00:00 — beyond the
    // watermark, must NOT resurrect the finalized window
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"),
      """{"ts":"2024-01-01T00:00:50","event_type":"view","value":99.0}
        |{"ts":"2024-01-01T03:00:00","event_type":"view","value":1.0}"""
        .stripMargin)
    val q2 = WindowedCounts.tumbling(in, "ts", "event_type",
      "1 minute", "10 minutes")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$dir/out")
      .start()
    q2.awaitTermination()

    val rows = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("total")))
      .sortBy(r => (r._1, r._2))
    // finalized 00:00 view window contains ONLY the on-time rows
    val w0 = rows.filter(r => r._1.startsWith("2024-01-01 00:00")
      && r._2 == "view")
    assert(w0.length == 1)
    assert(w0.head._3 == 2 && w0.head._4 == 3.0)   // 99.0 dropped
    assert(rows.exists(r => r._1.startsWith("2024-01-01 00:01")
      && r._2 == "click"))
  }

  test("batch mode: same operator over the events table") {
    val df = WindowedCounts.tumbling(
      graft.Tables.events(spark, "/root/testdata/sf0.001"),
      "ts", "event_type", "1 day", "1 hour")
    val total = df.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0)
    assert(total == 1000)   // every event lands in exactly one window
  }
}
