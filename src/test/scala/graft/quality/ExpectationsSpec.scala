package graft.quality

import graft.SparkSpec
import graft.quality.Expectations.{report, Check}
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("report: one row, per-check counters, dup counts") {
    val df = Seq[(Long, Option[Double], String)](
      (1L, Some(5.0), "ok"), (2L, Some(-1.0), "ok"),
      (3L, None, "bad"), (3L, Some(2.0), "ok"))
      .toDF("id", "v", "t")
    val r = report(df, Seq(
      Check("null_v", col("v").isNull, nullIsBad = false),
      Check("neg_v", col("v") < 0, nullIsBad = false),
      Check("bad_t", col("t") =!= "ok")),
      uniqueKeys = Seq("id")).head()
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("null_v") === 1L)
    assert(r.getAs[Long]("neg_v") === 1L) // null v NOT counted
    assert(r.getAs[Long]("bad_t") === 1L)
    assert(r.getAs[Long]("dup_id") === 1L)
    assert(r.getAs[Long]("nullkey_id") === 0L)
  }

  test("null uniqueness keys are reported separately, not as duplicates") {
    val df = Seq[(Option[Long], String)](
      (Some(1L), "a"), (Some(1L), "b"), (None, "c"), (None, "d"))
      .toDF("id", "s")
    val r = report(df, Nil, uniqueKeys = Seq("id")).head()
    assert(r.getAs[Long]("dup_id") === 1L)     // only the real 1L dup
    assert(r.getAs[Long]("nullkey_id") === 2L) // nulls counted apart
  }

  test("nullIsBad: null predicate results count as violations") {
    val df = Seq[(Long, Option[Double])]((1L, Some(1.0)), (2L, None))
      .toDF("id", "v")
    val strict = report(df, Seq(Check("low_v", col("v") < 10))).head()
    assert(strict.getAs[Long]("low_v") === 2L) // null v flagged
    val lax = report(df,
      Seq(Check("low_v", col("v") < 10, nullIsBad = false))).head()
    assert(lax.getAs[Long]("low_v") === 1L)
  }
}
