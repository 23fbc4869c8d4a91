package graft.query

import graft.SparkSpec
import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** Hopping-window aggregation (catalog q54): Spark's native
  * TimeWindow with slide < length. Membership arithmetic and parity
  * with an independent explode-the-starts formulation. */
class HoppingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("every event lands in exactly length/slide windows") {
    val ev = Seq(
      (1L, "2024-03-01 00:00:00", "a"),
      (2L, "2024-03-01 23:59:59", "a"),
      (3L, "2024-03-02 12:00:00", "b"))
      .toDF("event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val agg = ev.groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("n"))
    // 3 events × (2 days / 1 day) = 6 window memberships
    assert(agg.agg(sum("n")).head().getLong(0) === 6L)
    // event 1's windows start Feb 29 and Mar 1 (2024 is a leap
    // year) — the bare select already expands into both windows
    val starts = ev.filter(col("event_id") === 1)
      .select(window(col("ts"), "2 days", "1 day")("start").cast("date")
        .cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(starts === Set("2024-02-29", "2024-03-01"))
  }

  test("q54 catalog row == explode-the-starts formulation on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val engine = Catalog.all.find(_.name == "q54_hopping_window").get
      .run(spark, d).collect()
      .map(r => (r.getAs[java.sql.Date]("win_start").toString,
        r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_cents"))))
      .toMap
    val indep = graft.Tables.events(spark, d)
      .withColumn("__cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("win_start", explode(array(
        date_sub(to_date(col("ts")), 1), to_date(col("ts")))))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("__cents").as("sum_cents"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("win_start").toString,
        r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_cents"))))
      .toMap
    assert(engine.nonEmpty && engine === indep)
  }
}
