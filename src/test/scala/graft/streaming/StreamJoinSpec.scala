package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamJoinSpec extends SparkSpec {

  test("stream-stream attribution: interval match, out-of-window drop") {
    val dir = Files.createTempDirectory("graft-ssjoin").toString
    val inDir = s"$dir/in"
    new java.io.File(inDir).mkdirs()
    val in = spark.readStream
      .schema("event_id long, ts timestamp, user_id long, " +
        "event_type string, value double")
      .json(inDir)
    def run(): Unit = {
      val q = StreamJoin.viewPurchaseAttribution(in,
        window = "1 hour", lateness = "10 minutes")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", s"$dir/out")
        .start()
      q.awaitTermination()
    }
    // user 1: view then a purchase 30 min later (matches);
    // user 2: purchase 2 h after the view (out of window — dropped);
    // user 3: purchase with no view at all (inner join — dropped)
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00","user_id":1,"event_type":"view","value":0.0}
        |{"event_id":2,"ts":"2024-01-01T00:30:00","user_id":1,"event_type":"purchase","value":9.5}
        |{"event_id":3,"ts":"2024-01-01T00:00:00","user_id":2,"event_type":"view","value":0.0}
        |{"event_id":4,"ts":"2024-01-01T02:00:00","user_id":2,"event_type":"purchase","value":1.0}
        |{"event_id":5,"ts":"2024-01-01T01:00:00","user_id":3,"event_type":"purchase","value":2.0}"""
        .stripMargin)
    run()
    // cross-batch: user 4's view arrives in batch 1's file... then the
    // purchase in batch 2 — the buffered view state must still match
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"),
      """{"event_id":6,"ts":"2024-01-01T02:10:00","user_id":4,"event_type":"view","value":0.0}""")
    run()
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b3.json"),
      """{"event_id":7,"ts":"2024-01-01T02:40:00","user_id":4,"event_type":"purchase","value":3.0}"""
        .stripMargin)
    run()

    val rows = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("view_id"), r.getAs[Long]("delay_us")))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((2L, 1L, 1L), (7L, 4L, 6L)))
    assert(rows.head._4 == 30L * 60 * 1000000)   // 30-min delay, µs
  }
}
