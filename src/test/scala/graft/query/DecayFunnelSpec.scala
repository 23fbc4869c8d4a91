package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Time-decay scoring (catalog q41) and the ordered conversion funnel
  * (catalog q42). */
class DecayFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("decay terms are exact integers; clamp holds at both ends") {
    // ages: 0 weeks (full 2^26), 26 weeks (2^0), and far past the
    // clamp (still 2^0) — the exact-arithmetic contract of q41
    val rows = Seq(
      (1L, "2024-07-01", 1.00), // age 0w  -> 100 * 2^26
      (1L, "2023-12-28", 2.00), // 186d -> 26w -> 200 * 2^0
      (1L, "2020-01-01", 3.00)) // clamped   -> 300 * 2^0
      .toDF("user_id", "day", "value")
      .select(col("user_id"), col("value"),
        least(lit(26L), greatest(lit(0L),
          expr("datediff(DATE'2024-07-01', to_date(day)) DIV 7")
            .cast("long"))).as("aw"))
    val score = rows
      .select((round(col("value") * 100, 0).cast("long") *
        pow(lit(2.0d), lit(26L) - col("aw"))).cast("long").as("t"))
      .agg(sum("t")).as[Long].head()
    assert(score === 100L * (1L << 26) + 200L + 300L)
  }

  test("funnel counts only in-order stage progressions") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE first view — never reaches stage 2
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      // user 3: view then purchase, no click — stops at stage 1
      (3L, "view", 10L), (3L, "purchase", 20L),
      // user 4: purchase before click — reaches click only
      (4L, "view", 10L), (4L, "purchase", 15L), (4L, "click", 20L),
      // user 5: no view at all — not even stage 1
      (5L, "click", 10L), (5L, "purchase", 20L))
      .toDF("user_id", "event_type", "us")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    assert(v.count() === 4) // users 1,2,3,4
    assert(c.select("user_id").as[Long].collect().toSet === Set(1L, 4L))
    assert(p.select("user_id").as[Long].collect().toSet === Set(1L))
  }
}
