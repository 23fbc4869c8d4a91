package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BloomExprSpec extends SparkSpec {

  test("build/probe: zero false negatives; fp rate near nominal") {
    val members = (0 until 2000).map(i => s"member_$i")
    val bits = BloomOverlapCount.build(members)
    val m = bits.length.toLong * 64L
    assert(members.forall(s => BloomOverlapCount.mightContain(
      bits, m, 5, UTF8String.fromString(s))))
    val probes = (0 until 10000).map(i => s"absent_$i")
    val fp = probes.count(s => BloomOverlapCount.mightContain(
      bits, m, 5, UTF8String.fromString(s)))
    // 10 bits/item + 5 hashes ⇒ ~1% nominal; allow generous slack
    assert(fp < 400, s"false-positive rate too high: $fp/10000")
  }

  test("bloomOverlap column: counts possible members; codegen parity") {
    import spark.implicits._
    val bits = BloomOverlapCount.build(Seq("a b", "b c"))
    val df = Seq(
      (1L, Seq("a b", "b c", "zzz")),
      (2L, Seq("nope", "also nope")),
      (3L, Seq.empty[String])
    ).toDF("id", "sh")
    def run() = df.select(col("id"),
      BloomOverlapCount.bloomOverlap(col("sh"), bits).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val codegen = run()
    assert(codegen(1L) >= 2 && codegen(3L) == 0) // no false negatives
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == codegen)
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("decontaminateBloom == exact path on sf0.001") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("__toks", Text.tokens(col("text")))
      .withColumn("__sh", Text.wordShingles(col("__toks"), 3))
    val hold = docs.filter(col("doc_id") < 5)
      .select(explode(col("__sh")).as("sh")).distinct()
      .collect().map(_.getString(0)).toSeq
    val train = docs.filter(col("doc_id") >= 5)
    val exact = train.select(col("doc_id"),
      SigExprs.anchorOverlap(col("__sh"), hold)
        .getField("n_inter").cast("long").as("n_contam"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = graft.dedup.Dedup.decontaminateBloom(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .filter(col("doc_id") >= 5),
      "text", "doc_id", hold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom == exact)   // fp only adds verification, never output
    assert(exact.values.exists(_ > 0)) // the fixture really overlaps
  }
}
