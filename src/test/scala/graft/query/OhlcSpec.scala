package graft.query

import graft.SparkSpec
import graft.queries.Catalog
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OHLC downsample (catalog q53): the single-shuffle min_by/max_by
  * formulation must agree with an independently written
  * row_number-window formulation (the naive two-pass translation)
  * on the real testdata. */
class OhlcSpec extends SparkSpec {

  test("q53 min_by/max_by OHLC == window-formulated OHLC on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val engine = Catalog.all.find(_.name == "q53_ohlc_downsample").get
      .run(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day")
        .toString) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_events")))
      .toMap

    val e = graft.Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value"), col("ts"), col("event_id"))
    val wa = Window.partitionBy("user_id", "day")
      .orderBy(col("ts").asc, col("event_id").asc)
    val wd = Window.partitionBy("user_id", "day")
      .orderBy(col("ts").desc, col("event_id").desc)
    val oracle = e
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rd", row_number().over(wd))
      .groupBy("user_id", "day")
      .agg(max(when(col("__ra") === 1, col("value"))).as("open"),
        max("value").as("high"), min("value").as("low"),
        max(when(col("__rd") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day")
        .toString) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_events")))
      .toMap

    assert(engine.nonEmpty)
    assert(engine === oracle)
    // and the basic OHLC invariant holds everywhere
    engine.values.foreach { case (o, h, l, c, n) =>
      assert(l <= o && o <= h && l <= c && c <= h && n >= 1)
    }
  }
}
