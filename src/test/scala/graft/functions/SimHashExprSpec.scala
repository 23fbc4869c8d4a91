package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashExprSpec extends SparkSpec {

  test("codegen SimHash64 matches the composed-builtin formulation bit-for-bit") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox", "the quick brown fox", "lorem ipsum dolor",
      "", "single", "a b c d e f g h i j k l m n o p")
      .toDF("text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("hashes", transform(col("toks"), t => xxhash64(t)))
    val rows = docs.select(
      Text.simhash64(col("toks")).as("slow"),
      Text.simhash64Fast(col("hashes")).as("fast")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"mismatch: ${r.getLong(0)} vs ${r.getLong(1)}")
    }
    // identical docs → identical sig; different docs → different sig
    val sigs = rows.map(_.getLong(1))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("hamming distance small for near-identical docs, large for unrelated") {
    import spark.implicits._
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog entirely"),
      ("b", "the quick brown fox jumps over the lazy cat entirely"),
      ("c", "completely unrelated text about database query engines"))
      .toDF("id", "text")
      .withColumn("hashes",
        transform(Text.tokens(col("text")), t => xxhash64(t)))
      .withColumn("sig", Text.simhash64Fast(col("hashes")))
    val m = df.collect().map(r =>
      r.getAs[String]("id") -> r.getAs[Long]("sig")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("a"), m("b")) < ham(m("a"), m("c")))
  }
}
