package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("SQL functions match the DataFrame-API native expressions") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a b c d", 1L), ("x y z", 2L)).toDF("text", "id")
      .createOrReplaceTempView("ext_docs")
    // graft_simhash64 over per-token hashes == Text.simhash64Fast
    val viaSql = spark.sql(
      """SELECT id, graft_simhash64(transform(split(lower(text), '\\s+'),
        t -> xxhash64(t))) AS sig FROM ext_docs""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = spark.table("ext_docs")
      .withColumn("h", transform(Text.tokens(col("text")),
        t => xxhash64(t)))
      .select(col("id"), Text.simhash64Fast(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)

    // graft_minhash_sig == SigExprs.minhashSigFromHashes, default seed
    val sqlSig = spark.sql(
      """SELECT graft_minhash_sig(array(1L, 2L, 3L), 8) AS s""")
      .head().getAs[scala.collection.Seq[Long]]("s").toSeq
    val apiSig = spark.range(1)
      .select(SigExprs.minhashSigFromHashes(
        array(lit(1L), lit(2L), lit(3L)), 8).as("s"))
      .head().getAs[scala.collection.Seq[Long]]("s").toSeq
    assert(sqlSig == apiSig)

    // explicit seed variant + arity validation
    assert(spark.sql(
      "SELECT graft_minhash_sig(array(7L), 4, 99) AS s")
      .head().getAs[scala.collection.Seq[Long]]("s").length == 4)
    intercept[Exception] { spark.sql("SELECT graft_simhash64()") }
    // a bigint k that overflows Int must be REJECTED, not wrapped
    // (4294967297.toInt == 1 would yield a 1-wide signature)
    intercept[Exception] { spark.sql(
      "SELECT graft_minhash_sig(array(7L), 4294967297)") }
  }
}
