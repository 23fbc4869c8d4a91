package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GROUPING SETS surface (catalog q40): the one-pass Expand plan must
  * equal the naive union of independent groupBys. */
class GroupingSetsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("click", "2024-01", 3L), ("click", "2024-02", 5L),
    ("view", "2024-01", 2L), ("view", "2024-01", 7L),
    ("error", "2024-02", 1L))
    .toDF("et", "m", "cents")

  test("((et),(m),()) equals the union of the three groupBys") {
    val gs = rows
      .groupingSets(
        Seq(Seq(col("et")), Seq(col("m")), Seq.empty),
        col("et"), col("m"))
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .select(coalesce(col("et"), lit("ALL")).as("et"),
        coalesce(col("m"), lit("ALL")).as("m"), col("n"), col("c"))
      .as[(String, String, Long, Long)].collect().toSet

    val byEt = rows.groupBy("et").agg(count(lit(1)).as("n"),
      sum("cents").as("c"))
      .select(col("et"), lit("ALL").as("m"), col("n"), col("c"))
    val byM = rows.groupBy("m").agg(count(lit(1)).as("n"),
      sum("cents").as("c"))
      .select(lit("ALL").as("et"), col("m"), col("n"), col("c"))
    val tot = rows.agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .select(lit("ALL").as("et"), lit("ALL").as("m"), col("n"),
        col("c"))
    val want = byEt.unionAll(byM).unionAll(tot)
      .as[(String, String, Long, Long)].collect().toSet

    assert(gs === want)
  }

  test("one Expand + one aggregate — no second pass over the input") {
    val plan = rows
      .groupingSets(Seq(Seq(col("et")), Seq(col("m"))), col("et"),
        col("m"))
      .agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    // the naive form would scan the input once per set; Expand scans once
    assert(!plan.contains("Union"))
  }
}
