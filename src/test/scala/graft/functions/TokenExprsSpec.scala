package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native tokenizer/shingler ([[TokenExprs]]) to the composed
  * higher-order-function forms they replaced (r14 guide-§4 hot-path
  * work): same values on every edge the regex/HOF semantics have. */
class TokenExprsSpec extends SparkSpec {

  // Edge corpus: the six java-regex \s chars (0x20 09 0A 0B 0C 0D) in
  // every position, unicode whitespace that \s must NOT split on,
  // multi-byte code points, case folding left to lower() itself.
  private val texts: Seq[String] = Seq(
    null,
    "",
    " ",
    "\t\n\r ",
    "hello",
    "hello world",
    "  leading",
    "trailing  ",
    "  both  ",
    "a\tb\ncde\rf",
    "double  space\t\ttab",
    "nbsp stays line sep ideographic　space",
    "Ünïcödé STRAßE İstanbul ΣΙΓΜΑ",
    "emoji 🙂 mixed 漢字 text",
    "x",
    "a b c d e f g h i j")

  test("native tokens == composed filter(split(lower)) on edge corpus") {
    import spark.implicits._
    val df = texts.zipWithIndex.map(_.swap).toDF("i", "text")
      .select(col("i"),
        Text.tokens(col("text")).as("nat"),
        Text.tokensComposed(col("text")).as("ref"))
    df.collect().foreach { r =>
      val nat = Option(r.getAs[scala.collection.Seq[String]]("nat"))
      val ref = Option(r.getAs[scala.collection.Seq[String]]("ref"))
      assert(nat == ref, s"row ${r.getAs[Int]("i")}: $nat != $ref")
    }
  }

  test("native wordShingles == composed transform/slice/concat_ws") {
    import spark.implicits._
    val toks = Seq(
      Seq.empty[String],
      Seq("a"),
      Seq("a", "b"),
      Seq("a", "b", "c"),
      Seq("a", "b", "c", "d"),
      Seq("multi", "byte", "漢字", "tökens", "here"),
      (1 to 40).map(i => s"tok$i"))
    for (n <- Seq(1, 2, 3, 5)) {
      val df = toks.zipWithIndex.map(_.swap).toDF("i", "toks")
        .select(col("i"),
          Text.wordShingles(col("toks"), n).as("nat"),
          Text.wordShinglesComposed(col("toks"), n).as("ref"))
      df.collect().foreach { r =>
        val nat = r.getAs[scala.collection.Seq[String]]("nat")
        val ref = r.getAs[scala.collection.Seq[String]]("ref")
        assert(nat == ref, s"n=$n row ${r.getAs[Int]("i")}: $nat != $ref")
      }
    }
  }

  test("wordShingles of a NULL token array is [] (composed guard parity)") {
    import spark.implicits._
    val df = Seq(("x", null: String)).toDF("id", "text")
      .select(
        Text.wordShingles(Text.tokens(col("text")), 3).as("nat"),
        Text.wordShinglesComposed(Text.tokensComposed(col("text")), 3)
          .as("ref"))
    val r = df.collect().head
    assert(r.getAs[scala.collection.Seq[String]]("nat") == Seq.empty)
    assert(r.getAs[scala.collection.Seq[String]]("ref") == Seq.empty)
  }

  test("interpreted eval matches codegen (both expressions)") {
    import graft.functions.{TokenExprsHelper => H}
    import org.apache.spark.unsafe.types.UTF8String
    // direct helper calls = the interpreted path (nullSafeEval/eval)
    val t = H.splitWs(UTF8String.fromString(" a  bb\tc "))
    assert((0 until t.numElements()).map(t.getUTF8String(_).toString)
      == Seq("a", "bb", "c"))
    val sh = H.shingles(t, 2)
    assert((0 until sh.numElements()).map(sh.getUTF8String(_).toString)
      == Seq("a bb", "bb c"))
  }
}
