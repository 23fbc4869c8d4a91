package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeExprSpec extends SparkSpec {
  import NormalizeText.normalizeText

  // decomposed é (e + U+0301) and the NFC precomposed form
  private val decomposed = "cafe\u0301"
  private val precomposed = "caf\u00e9"

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    import spark.implicits._
    val df = Seq(
      (1L, decomposed),
      (2L, precomposed),
      (3L, "ﬁle"),          // ﬁ ligature — NFKC → "file"
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "s")
      .select(col("id"),
        normalizeText(col("s")).as("nfc"),
        normalizeText(col("s"), "NFD").as("nfd"),
        normalizeText(col("s"), "NFKC").as("nfkc"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == precomposed)       // NFC composes
    assert(rows(1).getString(2) == decomposed)        // NFD decomposes
    assert(rows(2).getString(3) == "file")            // NFKC folds ﬁ
    assert(rows(3).getString(1) == "plain ascii")
    assert(rows(4).isNullAt(1) && rows(4).isNullAt(2))
  }

  test("interpreted eval matches codegen; unknown form rejected") {
    import spark.implicits._
    val df = Seq(decomposed, precomposed, "ﬁle", "x", "")
      .toDF("s")
    def run() = df.select(normalizeText(col("s")).as("n"),
      normalizeText(col("s"), "nfkd").as("k"))   // form case-folded
      .collect().map(_.toSeq).toSeq
    val codegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == codegen)
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    intercept[IllegalArgumentException] {
      normalizeText(col("s"), "NFX")
    }
  }

  test("SQL surface: graft_normalize with and without form") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      s"SELECT graft_normalize('$decomposed') AS a, " +
        "graft_normalize('ﬁle', 'NFKC') AS b")
      .head()
    assert(got.getString(0) == precomposed)
    assert(got.getString(1) == "file")
  }
}
