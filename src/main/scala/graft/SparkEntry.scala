package graft

import graft.queries.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: trending feed with author hydration — the reference's
    * trendingFeed (resolvers/index.ts:224-267) + profile join (J6),
    * expressed over the events/customer testdata analogs. Driver
    * smoke-checks rows > 0 at sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val trending = graft.query.Feeds.trending(
      Tables.events(spark, d), col("event_type") === "purchase",
      col("ts"), expr("INTERVAL 7 DAYS"),
      Seq(col("value").desc, col("event_id").asc), limit = 100)
    trending.join(broadcast(Tables.customer(spark, d)),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("value"),
        col("c_name"), col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2 / §7.5. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** DuckDB-runnable oracle per query (omitted ⇒ rows-only check). */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
