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
