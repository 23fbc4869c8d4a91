package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Efraimidis–Spirakis weighted top-k sampling (catalog d40). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 60L)
    .map(i => (i, (i % 7).toInt)) // weights 0..6; the w=0 rows excluded
    .toDF("id", "w")

  /** Driver-side replay of the exact key math. */
  private def keyOf(id: Long, w: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"es#$id".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) /
      math.pow(2, 60)
    math.log(u) / w
  }

  test("selects exactly the k largest u^(1/w) keys, w<=0 excluded") {
    val got = Sampling
      .weightedTopK(docs.repartition(4), col("w"), col("id"),
        k = 10, seedTag = "es")
      .select("id").as[Long].collect().toSet
    val want = (0L until 60L).filter(_ % 7 != 0)
      .sortBy(i => (-keyOf(i, (i % 7).toInt), i)).take(10).toSet
    assert(got === want)
  }

  test("k larger than the weighted population returns all of it") {
    val got = Sampling
      .weightedTopK(docs, col("w"), col("id"), k = 1000, seedTag = "es")
      .count()
    assert(got === 60L - 9L) // sixty rows minus the nine w=0 rows
  }

  test("the plan is a TakeOrderedAndProject, not a global sort") {
    val plan = Sampling
      .weightedTopK(docs, col("w"), col("id"), k = 10, seedTag = "es")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("higher weight wins at equal draw (key monotone in w)") {
    assert(keyOf(3L, 5) > keyOf(3L, 2))
  }
}
