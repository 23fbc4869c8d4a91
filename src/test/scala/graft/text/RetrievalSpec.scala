package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: doc in both rankings outranks single-list docs near it") {
    // ranking A: 1,2,3 ; ranking B: 3,4,5 — doc 3 appears in both
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((3L, 1L), (4L, 2L), (5L, 3L)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "id", k = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("rrf")))
    assert(fused.head._1 === 3L) // 1/63 + 1/61 beats any single 1/61
    assert(fused.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 5L))
    // exact fixed-dag value for the winner
    val expected = BigDecimal(1.0 / 63 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused.head._2 === expected)
  }

  test("rrfFuse: per-ranking rank columns survive with nulls for absences") {
    val a = Seq((1L, 1L)).toDF("id", "rank")
    val b = Seq((2L, 1L)).toDF("id", "rank")
    val rows = Retrieval.rrfFuse(Seq(a, b), "id", k = 5)
      .orderBy("id").collect()
    assert(rows(0).getLong(rows(0).fieldIndex("rank_0")) === 1L)
    assert(rows(0).isNullAt(rows(0).fieldIndex("rank_1")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("rank_0")))
    assert(rows(1).getLong(rows(1).fieldIndex("rank_1")) === 1L)
  }

  test("rrfFuse: ties broken by id ascending") {
    val a = Seq((9L, 1L), (4L, 2L)).toDF("id", "rank")
    val b = Seq((4L, 1L), (9L, 2L)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "id", k = 2)
      .collect().map(_.getLong(0))
    assert(fused.toSeq === Seq(4L, 9L)) // equal rrf → id asc
  }
}
