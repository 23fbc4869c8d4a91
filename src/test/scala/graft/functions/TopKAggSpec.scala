package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom bounded top-k Aggregator (§2.12 UDAF surface). */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq( // (group, value, id)
    ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 7.0, 3L), ("a", 9.0, 4L),
    ("a", 1.0, 5L), ("b", 2.0, 6L), ("b", 2.0, 7L), ("c", 4.0, 8L))
    .toDF("g", "v", "id")

  test("top-3 per group: DESC by value, id ASC tie-break") {
    val topk = TopKAgg.topK(3)
    val out = rows.repartition(4) // exercise partial merge across partitions
      .groupBy("g").agg(topk(col("v"), col("id")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t._1").as("v"), col("t._2").as("id"))
      .orderBy("g", "pos")
      .as[(String, Int, Double, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 0, 9.0, 2L), ("a", 1, 9.0, 4L), ("a", 2, 7.0, 3L),
      ("b", 0, 2.0, 6L), ("b", 1, 2.0, 7L),
      ("c", 0, 4.0, 8L)))
  }

  test("matches the row_number window form on random data") {
    val data = (1 to 500).map { i =>
      (s"g${i % 7}", ((i * 37) % 23).toDouble, i.toLong)
    }.toDF("g", "v", "id")
    val topk = TopKAgg.topK(5)
    val viaAgg = data.repartition(8)
      .groupBy("g").agg(topk(col("v"), col("id")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("t._1").as("v"), col("t._2").as("id"))
    val viaWindow = data
      .withColumn("rk", row_number().over(Window.partitionBy("g")
        .orderBy(col("v").desc, col("id").asc)))
      .filter(col("rk") <= 5).select("g", "rk", "v", "id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("reduce rejects below-bar rows without resorting") {
    val agg = new TopKAgg(2)
    val full = agg.merge(agg.reduce(agg.reduce(agg.zero, (9.0, 1L)),
      (8.0, 2L)), agg.zero)
    // below the bar: buffer unchanged (same instance semantics: eq)
    assert(agg.reduce(full, (1.0, 3L)) eq full)
    // ties enter by id order
    assert(agg.reduce(full, (8.0, 0L)) === List((9.0, 1L), (8.0, 0L)))
  }
}
