package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Gopher-rule gate (Text.gopherStats) + the frame-spec window and
  * pivot catalog shapes (q35/q36) on hand-checked inputs. */
class GopherAndWindowSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String): Row = {
    val df = Seq(text).toDF("text")
      .withColumn("__toks", Text.tokens(col("text")))
      .select(Text.gopherStats(col("__toks")).as("g"))
      .select("g.*")
    df.collect().head
  }

  // 50 words, all alphabetic, mean length in [3,10], >=2 stopwords.
  private val goodDoc =
    (Seq.fill(24)("the") ++ Seq.fill(24)("and") ++
      Seq("table", "value")).mkString(" ")

  test("gopherStats passes a compliant doc and counts exactly") {
    val r = statsOf(goodDoc)
    assert(r.getAs[Long]("n_words") === 50L)
    assert(r.getAs[Long]("n_chars") === 24 * 3 + 24 * 3 + 5 + 5)
    assert(r.getAs[Long]("n_alpha") === 50L)
    assert(r.getAs[Long]("stop_hits") === 2L) // the, and
    assert(r.getAs[Boolean]("passes"))
  }

  test("gopherStats fails below 50 words") {
    val r = statsOf(goodDoc.split(" ").drop(1).mkString(" ")) // 49
    assert(r.getAs[Long]("n_words") === 49L)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("gopherStats fails when mean word length < 3") {
    // 50 single-char words -> mean 1
    val r = statsOf((Seq.fill(48)("a") ++ Seq("the", "is")).mkString(" "))
    assert(!r.getAs[Boolean]("passes"))
  }

  test("gopherStats fails when alpha fraction < 0.8") {
    // 11 of 50 tokens numeric -> 39/50 = 0.78 < 0.8
    val toks = Seq.fill(37)("the") ++ Seq("and", "row") ++
      Seq.fill(11)("123")
    val r = statsOf(toks.mkString(" "))
    assert(r.getAs[Long]("n_alpha") === 39L)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("gopherStats fails with fewer than 2 distinct stopwords") {
    val r = statsOf(Seq.fill(50)("the").mkString(" "))
    assert(r.getAs[Long]("stop_hits") === 1L)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("gopherStats on empty text: zeros, no crash") {
    val r = statsOf("")
    assert(r.getAs[Long]("n_words") === 0L)
    assert(r.getAs[Long]("n_chars") === 0L)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("rolling frame window: 3-preceding sum, count, running total") {
    import org.apache.spark.sql.expressions.Window
    val e = Seq( // (event_id, user_id, cents) in ts order = id order
      (1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 300L),
      (4L, 7L, 400L), (5L, 7L, 500L), (6L, 8L, 50L))
      .toDF("event_id", "user_id", "cents")
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val out = e
      .withColumn("win_sum",
        sum("cents").over(w.rowsBetween(-3, Window.currentRow)))
      .withColumn("win_n",
        count(lit(1)).over(w.rowsBetween(-3, Window.currentRow)))
      .withColumn("run_sum", sum("cents").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("event_id")
      .select("event_id", "win_sum", "win_n", "run_sum")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(
      (1L, 100L, 1L, 100L), (2L, 300L, 2L, 300L), (3L, 600L, 3L, 600L),
      (4L, 1000L, 4L, 1000L),
      (5L, 1400L, 4L, 1500L), // frame drops event 1
      (6L, 50L, 1L, 50L))) // separate user
  }

  test("gopherStats matches an independent Scala reference on random text") {
    import org.scalacheck.Gen
    val word = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString),
      Gen.nonEmptyListOf(Gen.numChar).map(_.mkString),
      Gen.oneOf("the", "and", "a", "is", "...", "†‡", "x9", "ÆØ"))
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val texts = Gen.listOfN(60, textGen).pureApply(
      Gen.Parameters.default, org.scalacheck.rng.Seed(42L)) :+
      "" :+ "   "
    def ref(text: String) = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = toks.length.toLong
      val chars = toks.map(_.length.toLong).sum
      val alpha = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val stops = Text.gopherStopwords.count(toks.contains).toLong
      (n, chars, alpha, stops,
        n >= 50 && n <= 100000 && 3 * n <= chars && chars <= 10 * n &&
          5 * alpha >= 4 * n && stops >= 2)
    }
    val got = texts.toDF("text")
      .withColumn("__toks", Text.tokens(col("text")))
      .select(col("text"), Text.gopherStats(col("__toks")).as("g"))
      .select("text", "g.*")
      .collect()
      .map(r => (r.getAs[String]("text"),
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_alpha"), r.getAs[Long]("stop_hits"),
          r.getAs[Boolean]("passes"))))
    got.foreach { case (text, actual) =>
      assert(actual === ref(text), s"text=<$text>")
    }
  }

  test("unpivot inverts pivot back to the long form") {
    val e = Seq((1L, "click"), (1L, "click"), (1L, "view"), (2L, "error"))
      .toDF("user_id", "event_type")
    val types = Seq("click", "error", "view")
    val wide = e.groupBy("user_id").pivot("event_type", types)
      .agg(count(lit(1))).na.fill(0L)
    val long = wide.unpivot(Array(col("user_id")),
        types.map(col).toArray, "event_type", "n")
      .orderBy("user_id", "event_type")
      .as[(Long, String, Long)].collect().toSeq
    assert(long === Seq(
      (1L, "click", 2L), (1L, "error", 0L), (1L, "view", 1L),
      (2L, "click", 0L), (2L, "error", 1L), (2L, "view", 0L)))
  }

  test("correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
      .createOrReplaceTempView("cust_t")
    Seq((1L, 10.0), (2L, 500.0), (3L, 500.0), (3L, 900.0))
      .toDF("ck", "price").createOrReplaceTempView("ord_t")
    val q = spark.sql("""SELECT k, name FROM cust_t c
      WHERE EXISTS (SELECT 1 FROM ord_t o
          WHERE o.ck = c.k AND o.price > 100)
        AND NOT EXISTS (SELECT 1 FROM ord_t o
          WHERE o.ck = c.k AND o.price > 800)
      ORDER BY k""")
    assert(q.as[(Long, String)].collect().toSeq === Seq((2L, "b")))
    // the scale property: no per-row subquery — the plan is joins
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("pivot with explicit values: zero-filled wide counts") {
    val e = Seq((1L, "click"), (1L, "click"), (1L, "view"), (2L, "error"))
      .toDF("user_id", "event_type")
    val out = e.groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "view"))
      .agg(count(lit(1))).na.fill(0L)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L, 0L, 1L), (2L, 0L, 1L, 0L)))
  }
}
