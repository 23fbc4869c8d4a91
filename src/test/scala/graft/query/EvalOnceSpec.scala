package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Predicates.evalOnce: a filter above must not re-evaluate the
  * computed column below the Generate barrier. */
class EvalOnceSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "a b"), (2L, "c d e"), (3L, ""))
    .toDF("id", "text")

  test("results match the plain formulation") {
    val plain = df
      .withColumn("n", size(split(col("text"), " ")).cast("long"))
      .filter(col("n") > 1)
      .select("id", "n")
      .as[(Long, Long)].collect().toSet
    val once = Predicates.evalOnce(df, Seq(col("id")),
        "n" -> size(split(col("text"), " ")).cast("long"))
      .filter(col("n") > 1)
      .select("id", "n")
      .as[(Long, Long)].collect().toSet
    assert(once === plain)
  }

  test("the expensive expression appears once in the physical plan") {
    // regexp_replace is a recognizable marker for the expensive dag.
    // Parquet-backed base: over a LocalRelation the optimizer folds
    // the whole query to literal rows and there is no plan to read.
    val dir = java.nio.file.Files
      .createTempDirectory("evalonce").toString
    df.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    def marker(c: org.apache.spark.sql.Column) =
      length(regexp_replace(c, "x", "y")).cast("long")
    val plain = pq.withColumn("n", marker(col("text")))
      .filter(col("n") > 0).select("id", "n")
      .queryExecution.executedPlan.toString
    val once = Predicates.evalOnce(pq, Seq(col("id")),
        "n" -> marker(col("text")))
      .filter(col("n") > 0).select("id", "n")
      .queryExecution.executedPlan.toString
    def count(s: String) = "regexp_replace".r.findAllIn(s).size
    // plain: the dag appears in the pushed filter AND the projection
    // (scan DataFilters + Filter + Project print >= 2 copies)
    assert(count(plain) >= 2)
    assert(count(once) === 1) // the barrier holds: exactly one dag
  }
}
