package graft.query

import graft.SparkSpec
import graft.queries.Catalog
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing (catalog d58): the distributed
  * prefix-sum formulation must agree with an independently written
  * unpartitioned-window formulation, and shards must actually carry
  * ≈budget tokens. */
class ShardPackSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val engineOut =
    Catalog.all.find(_.name == "d58_shard_pack").get.run(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum_tokens"), r.getAs[Long]("shard"))))
      .toMap

  test("d58 == unpartitioned-window formulation on sf0.001") {
    val draw = graft.functions.Text.portableTokenHash(
      concat(lit("pack#"), col("doc_id").cast("string")))
    val w = Window.orderBy(col("__draw"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val indep = graft.Tables.documents(spark, d)
      .withColumn("__draw", draw)
      .withColumn("__tok",
        size(graft.functions.Text.tokens(col("text"))).cast("long"))
      .withColumn("cum_tokens", sum("__tok").over(w))
      .withColumn("shard",
        floor((col("cum_tokens") - col("__tok")) / lit(4000L)))
      .select(col("doc_id"), col("cum_tokens"), col("shard"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum_tokens"), r.getAs[Long]("shard"))))
      .toMap
    assert(engineOut.nonEmpty && engineOut === indep)
  }

  test("shards are balanced by TOKENS: all but the last carry at " +
    "least budget minus one document") {
    val toks = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxTok = toks.values.max
    // the ±maxTok slack below is vacuous once any doc reaches the
    // budget — guard the assumption so a fixture regeneration can't
    // silently disarm the test
    assert(maxTok < 4000L / 2,
      s"fixture docs too large for the balance bounds (max $maxTok)")
    val byShard = engineOut.toSeq.groupBy(_._2._2)
      .map { case (s, xs) => s -> xs.map(x => toks(x._1)).sum }
    val last = byShard.keys.max
    byShard.filter(_._1 != last).foreach { case (s, total) =>
      // a shard closes only once the running total crosses its
      // budget boundary, so it can fall short of the budget by at
      // most the straddling document
      assert(total > 4000L - maxTok, s"shard $s under-packed: $total")
      assert(total < 4000L + maxTok, s"shard $s over-packed: $total")
    }
    // packing preserves every token exactly once
    assert(byShard.values.sum === toks.values.sum)
  }
}
