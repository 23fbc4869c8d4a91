package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Dev-only: does an explode-of-one barrier stop predicate pushdown
  * from re-evaluating an expensive computed column (the d23/d10
  * 2x-evaluation cost)? A filter on a generator OUTPUT cannot be
  * pushed below the Generate, so the expensive struct evaluates
  * exactly once per row. */
object FilterEvalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(l: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$l%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = graft.Tables.documents(spark, d)
    docs.count() // warm scan
    def qExpr = {
      val toks = col("__toks")
      Text.qualityScoreFromToks(col("text"), toks)
    }
    def drawExpr = Text.portableTokenHash(
      concat(lit("qs#"), col("doc_id").cast("string")))
    // warm JIT on both shapes once
    for (round <- Seq("warmup", "timed")) {
      t(s"[$round] d23 current (pushed filter, 2x eval)") {
        docs.withColumn("__toks", Text.tokens(col("text")))
          .withColumn("q", qExpr)
          .withColumn("__draw", drawExpr)
          .filter(col("__draw").cast("double") <
            col("q") * lit(math.pow(2, 60)))
          .select(col("doc_id"), col("q"))
          .write.mode("overwrite").format("noop").save()
      }
      t(s"[$round] d23 explode barrier (1x eval)") {
        docs.withColumn("__toks", Text.tokens(col("text")))
          .select(col("doc_id"),
            explode(array(struct(qExpr.as("q"), drawExpr.as("dr"))))
              .as("__m"))
          .filter(col("__m.dr").cast("double") <
            col("__m.q") * lit(math.pow(2, 60)))
          .select(col("doc_id"), col("__m.q").as("q"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    // prove the barrier plan really has one quality dag: count
    // regexp_replace occurrences in each physical plan
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val cur = planOf(docs.withColumn("__toks", Text.tokens(col("text")))
      .withColumn("q", qExpr).withColumn("__draw", drawExpr)
      .filter(col("__draw").cast("double") <
        col("q") * lit(math.pow(2, 60)))
      .select(col("doc_id"), col("q")))
    val bar = planOf(docs.withColumn("__toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        explode(array(struct(qExpr.as("q"), drawExpr.as("dr"))))
          .as("__m"))
      .filter(col("__m.dr").cast("double") <
        col("__m.q") * lit(math.pow(2, 60)))
      .select(col("doc_id"), col("__m.q").as("q")))
    def n(s: String) = "regexp_replace".r.findAllIn(s).size
    println(s"regexp_replace occurrences: current=${n(cur)} barrier=${n(bar)}")
    spark.stop()
  }
}
