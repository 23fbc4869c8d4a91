package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Custom as-of join operator (LogicalPlan + Strategy + SparkPlan):
  * merge semantics vs a brute-force window reference, edge cases,
  * and the planned physical shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades (left) and quotes (right) — the canonical as-of shape
  private def trades: DataFrame = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 25L),
    (4L, "b", 5L), (5L, "b", 50L),
    (6L, "c", 100L)) // no quotes for c at all
    .toDF("trade_id", "sym", "t_ts")

  private def quotes: DataFrame = Seq(
    (101L, "a", 10L, 1.0), (102L, "a", 15L, 2.0), (103L, "a", 30L, 3.0),
    (104L, "b", 6L, 4.0), (105L, "b", 40L, 5.0))
    .toDF("quote_id", "sym", "q_ts", "px")

  private def run(l: DataFrame, r: DataFrame): Map[Long, Option[Long]] =
    AsOf.join(l, r, Seq("sym"), Seq("sym"), "t_ts", "q_ts", "quote_id")
      .select(col("trade_id"), col("quote_id"))
      .as[(Long, Option[Long])].collect().toMap

  test("largest right time <= left time per key, left outer") {
    assert(run(trades, quotes) === Map(
      1L -> Some(101L),  // q_ts 10 <= 10 (inclusive)
      2L -> Some(102L),  // 15, not 30
      3L -> Some(102L),
      4L -> None,        // quote at 6 is after trade at 5
      5L -> Some(105L),
      6L -> None))       // key never quoted
  }

  test("equal right times resolve by the tie-break column") {
    val dup = Seq(
      (101L, "a", 10L, 1.0), (109L, "a", 10L, 9.0), (105L, "a", 10L, 5.0))
      .toDF("quote_id", "sym", "q_ts", "px")
    val got = run(Seq((1L, "a", 10L)).toDF("trade_id", "sym", "t_ts"), dup)
    assert(got === Map(1L -> Some(109L))) // largest tie-break wins
  }

  test("null times never match") {
    val l = Seq((1L, "a", Some(10L)), (2L, "a", None))
      .toDF("trade_id", "sym", "t_ts")
    val r = Seq((101L, "a", Some(5L), 1.0), (102L, "a", None, 2.0))
      .toDF("quote_id", "sym", "q_ts", "px")
    assert(run(l, r) === Map(1L -> Some(101L), 2L -> None))
  }

  test("empty right side leaves every left row unmatched") {
    assert(run(trades, quotes.filter(lit(false))) ===
      Map(1L -> None, 2L -> None, 3L -> None, 4L -> None,
        5L -> None, 6L -> None))
  }

  test("self as-of join (same source both sides) does not collide ids") {
    val ev = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("event_id", "sym", "t_ts")
    // each event joined to the latest event at-or-before it (itself)
    val got = AsOf.join(
      ev, ev.select(col("event_id").as("prev_id"), col("sym"),
        col("t_ts").as("p_ts")),
      Seq("sym"), Seq("sym"), "t_ts", "p_ts", "prev_id")
      .select(col("event_id"), col("prev_id"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("matches the d19-style window formulation on random-ish data") {
    import org.apache.spark.sql.expressions.Window
    val l = (1 to 200).map(i =>
      (i.toLong, s"k${i % 7}", (i * 13 % 97).toLong))
      .toDF("lid", "k", "lt")
    val r = (1 to 150).map(i =>
      (1000L + i, s"k${i % 5}", (i * 29 % 89).toLong))
      .toDF("rid", "k", "rt")
    val got = AsOf.join(l, r, Seq("k"), Seq("k"), "lt", "rt", "rid")
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // reference: union trick + last ignoreNulls window
    val w = Window.partitionBy("k")
      .orderBy(col("ts"), col("is_l"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = l.select(col("lid"), col("k"), col("lt").as("ts"),
        lit(1).as("is_l"), lit(null).cast("long").as("rid"))
      .unionByName(r.select(lit(null).cast("long").as("lid"), col("k"),
        col("rt").as("ts"), lit(0).as("is_l"), col("rid")))
      .withColumn("m", last(col("rid"), ignoreNulls = true).over(w))
      .filter(col("is_l") === 1)
      .select(col("lid"), col("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === ref)
  }

  test("tolerance bounds the lookback (pandas merge_asof parity)") {
    def runTol(tol: Long): Map[Long, Option[Long]] =
      AsOf.join(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts", "quote_id", tolerance = Some(tol))
        .select(col("trade_id"), col("quote_id"))
        .as[(Long, Option[Long])].collect().toMap
    // trade 3 (t=25) matches quote 102 (t=15): age 10
    assert(runTol(10L)(3L) === Some(102L))
    assert(runTol(9L)(3L) === None)     // too old at tol=9
    assert(runTol(0L)(1L) === Some(101L)) // exact-time match survives
    // an in-tolerance OLDER quote never substitutes for the
    // out-of-tolerance latest one (largest-rt-only semantics)
    val q2 = Seq((101L, "a", 1L, 1.0), (102L, "a", 15L, 2.0))
      .toDF("quote_id", "sym", "q_ts", "px")
    val got = AsOf.join(
      Seq((1L, "a", 30L)).toDF("trade_id", "sym", "t_ts"), q2,
      Seq("sym"), Seq("sym"), "t_ts", "q_ts", "quote_id",
      tolerance = Some(5L))
      .select(col("quote_id")).as[Option[Long]].collect().head
    assert(got === None)
  }

  test("direction=forward matches the smallest right time >= left time") {
    def fwd(tol: Option[Long] = None): Map[Long, Option[Long]] =
      AsOf.join(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts", "quote_id", tolerance = tol,
        direction = "forward")
        .select(col("trade_id"), col("quote_id"))
        .as[(Long, Option[Long])].collect().toMap
    assert(fwd() === Map(
      1L -> Some(101L),  // exact-time rows match forward too
      2L -> Some(103L),  // next quote at 30
      3L -> Some(103L),
      4L -> Some(104L),  // quote at 6 is ahead of trade at 5
      5L -> None,        // nothing after 50 for b
      6L -> None))
    // tolerance bounds the look-AHEAD: trade 2 (t=20) → quote at 30
    // is 10 away
    assert(fwd(Some(10L))(2L) === Some(103L))
    assert(fwd(Some(9L))(2L) === None)
  }

  test("forward equal-TIME ties return the group's FIRST tie-break " +
    "(pandas first-duplicate), backward its last") {
    val q = Seq(
      (301L, "a", 30L, 1.0), (309L, "a", 30L, 2.0))
      .toDF("quote_id", "sym", "q_ts", "px")
    def pick(dir: String, ts: Long): Option[Long] =
      AsOf.join(Seq((1L, "a", ts)).toDF("trade_id", "sym", "t_ts"), q,
        Seq("sym"), Seq("sym"), "t_ts", "q_ts", "quote_id",
        direction = dir)
        .select(col("quote_id")).as[Option[Long]].collect().head
    // strictly-future forward: first of the tied group
    assert(pick("forward", 20L) === Some(301L))
    // equal-time forward: STILL the first of the group — the tie
    // policy must not flip between the two cases
    assert(pick("forward", 30L) === Some(301L))
    // backward at-or-before: last of the group
    assert(pick("backward", 30L) === Some(309L))
  }

  test("mismatched key or time types are rejected, not mis-compared") {
    val l = Seq((1, "a", 10L)).toDF("id", "k", "ts") // int id
    val rLongKey = Seq((1L, "a", 5L, 9L))
      .toDF("rid", "k", "rts", "tie")
    // key type mismatch: k string vs rid long
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(l, rLongKey, Seq("k"), Seq("rid"), "ts", "rts", "tie")
    }
    assert(e1.getMessage.contains("type mismatch"))
    // time type mismatch: long vs int
    val rIntTime = Seq(("a", 5, 9L)).toDF("k", "rts", "tie")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(l, rIntTime, Seq("k"), Seq("k"), "ts", "rts", "tie")
    }
    assert(e2.getMessage.contains("time type mismatch"))
  }

  test("direction=nearest picks the closer side, ties to backward") {
    val q = Seq(
      (201L, "a", 10L, 1.0), (202L, "a", 40L, 2.0))
      .toDF("quote_id", "sym", "q_ts", "px")
    def near(ts: Long): Option[Long] =
      AsOf.join(Seq((1L, "a", ts)).toDF("trade_id", "sym", "t_ts"), q,
        Seq("sym"), Seq("sym"), "t_ts", "q_ts", "quote_id",
        direction = "nearest")
        .select(col("quote_id")).as[Option[Long]].collect().head
    assert(near(20L) === Some(201L)) // 10 back vs 20 ahead
    assert(near(31L) === Some(202L)) // 21 back vs 9 ahead
    assert(near(25L) === Some(201L)) // exact tie → backward
    assert(near(5L) === Some(201L))  // nothing behind → forward side
  }

  test("left-only filters push below the join; right filters do not") {
    val df = AsOf.join(trades, quotes, Seq("sym"), Seq("sym"),
      "t_ts", "q_ts", "quote_id")
    // left-only predicate: must land under AsOfJoinPlan's left child
    val lOpt = df.filter(col("trade_id") > 2)
      .queryExecution.optimizedPlan
    val pushedLeft = lOpt.collect {
      case j: AsOfJoinPlan => j.left
    }.head
    assert(pushedLeft.toString.contains("trade_id"),
      s"filter not pushed into left child:\n$lOpt")
    assert(!lOpt.exists {
      case org.apache.spark.sql.catalyst.plans.logical
        .Filter(_, _: AsOfJoinPlan) => true
      case _ => false
    }, s"left-only filter stayed above the join:\n$lOpt")
    // right-referencing predicate: pushing would CHANGE which quote
    // is latest-at-or-before — must stay above
    val rOpt = df.filter(col("px") > 2.0)
      .queryExecution.optimizedPlan
    assert(rOpt.exists {
      case org.apache.spark.sql.catalyst.plans.logical
        .Filter(_, _: AsOfJoinPlan) => true
      case _ => false
    }, s"right filter was pushed (unsound):\n$rOpt")
    // and results agree with filter-after-join semantics either way
    val got = df.filter(col("trade_id") > 2)
      .select(col("trade_id"), col("quote_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(3L -> Some(102L), 4L -> None,
      5L -> Some(105L), 6L -> None))
  }

  test("physical plan is the custom exec over co-partitioned sorted children") {
    val df = AsOf.join(trades, quotes, Seq("sym"), Seq("sym"),
      "t_ts", "q_ts", "quote_id")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"))
    // both children shuffled on their keys and sorted (key, time)
    assert("Exchange hashpartitioning".r
      .findAllIn(phys).size === 2)
    assert(phys.contains("Sort ["))
  }

  test("bucketed tables make the join exchange-free (the 100 TB claim)") {
    val wh = java.nio.file.Files.createTempDirectory("asofb").toString
    def writeBucketed(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").format("parquet")
        .option("path", s"$wh/$table")
        .bucketBy(4, "sym").sortBy("sym")
        .saveAsTable(table)
    writeBucketed(trades, "asof_trades")
    writeBucketed(quotes, "asof_quotes")
    try {
      val df = AsOf.join(spark.table("asof_trades"),
        spark.table("asof_quotes"),
        Seq("sym"), Seq("sym"), "t_ts", "q_ts", "quote_id")
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("AsOfJoin"))
      // ClusteredDistribution is satisfied by the bucketed layout on
      // BOTH sides: zero exchanges, only in-partition sorts remain
      assert(!phys.contains("Exchange"),
        s"expected an exchange-free plan, got:\n$phys")
      assert(phys.contains("Sort ["))
      // and the results still match the shuffled-plan run
      val got = df.select(col("trade_id"), col("quote_id"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got === run(trades, quotes))
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_trades")
      spark.sql("DROP TABLE IF EXISTS asof_quotes")
    }
  }
}
