package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("flags corpus vectors near an eval vector; best-match id; " +
    "threshold excludes the rest") {
    val evalSet = emb(100L -> Seq(1f, 0f), 101L -> Seq(0f, 1f))
    val corpus = emb(
      1L -> Seq(2f, 0f),      // sim 1.0 to eval 100
      2L -> Seq(1f, 1f),      // sim ~0.707 to both (tie → eval 100)
      3L -> Seq(-1f, 0f),     // sim -1 / 0 → max 0 vs eval 101
      4L -> Seq(0f, 0f))      // zero norm → sim 0
    val out = Vectors.semanticDecontamFlags(corpus, evalSet,
      "embedding", "vec_id", simMicroThreshold = 700000L)
      .orderBy("corpus_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) == ((100L, 1000000L)))
    // tie on quantized sim breaks to the SMALLER eval id
    assert(byId(2L)._1 == 100L)
  }

  test("the operator is a pure map: no Exchange in the physical plan") {
    val evalSet = emb(100L -> Seq(1f, 0f))
    val corpus = emb(1L -> Seq(2f, 0f), 2L -> Seq(0f, 3f))
    val q = Vectors.semanticDecontamFlags(corpus, evalSet,
      "embedding", "vec_id", 0L)
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), phys)
  }
}
