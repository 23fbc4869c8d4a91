package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native CharEntropyMicro vs the composed HOF formulation: the
  * bit-parity contract the d55 oracle relies on, checked over random
  * strings and the real gate corpus. */
class CharEntropyExprSpec extends SparkSpec {
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val native = df
      .select(col("id"), CharEntropyMicro.charEntropyMicro(col("text"))
        .as("e"))
      .select(col("id"), element_at(col("e"), 1), element_at(col("e"), 2))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val composed = df
      .withColumn("__chars", split(col("text"), ""))
      .select(col("id"), Text.charEntropyParts(col("__chars")).as("e"))
      .select(col("id"), col("e.n_uniq_chars"), col("e.ent_micro"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    (native, composed)
  }

  test("native == composed on random ASCII + accented strings") {
    val rnd = new scala.util.Random(7)
    val alpha = ('a' to 'z') ++ ('0' to '9') ++ " .,!?éüλ—"
    val docs = (1L to 200L).map { i =>
      (i, (0 until (1 + rnd.nextInt(300)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("id", "text")
    val (n, c) = both(docs)
    assert(n === c)
  }

  test("native == composed on the sf0.001 corpus") {
    val docs = graft.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("id"), col("text"))
    val (n, c) = both(docs)
    assert(n.nonEmpty && n === c)
  }

  test("interpreted eval matches codegen path") {
    // nullSafeEval directly (the interpreted path) vs the hand value
    val out = CharEntropyHelper.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab"))
    assert(out.toSeq === Seq(2L, -1000000L))
    assert(CharEntropyHelper.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(""))
      .toSeq === Seq(0L, 0L))
  }

  test("code-point alphabet: astral chars count once (oracle parity)") {
    // "a😀" = 2 code points (DuckDB string_split counts the emoji as
    // ONE element), both unique → exactly 1 bit. The composed
    // split(text, "") form counts UTF-16 units and diverges here —
    // the native/oracle alphabet is authoritative.
    assert(CharEntropyHelper.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a😀"))
      .toSeq === Seq(2L, -1000000L))
    // repeated astral char: histogram {😀: 2, a: 1, b: 1} over L=4
    val h = CharEntropyHelper.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a😀b😀"))
    assert(h(0) === 3L)
  }
}
