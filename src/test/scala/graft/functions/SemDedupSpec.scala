package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  // Unit vectors chosen so similarity structure is obvious: within
  // group 1, ids 1/2/3 are identical (cos 1), id 4 is orthogonal;
  // group 2's id 5 duplicates id 1's direction but sits in another
  // group so it must survive.
  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (1L, 1, Seq(1f, 0f, 0f)),
      (2L, 1, Seq(1f, 0f, 0f)),
      (3L, 1, Seq(1f, 0f, 0f)),
      (4L, 1, Seq(0f, 1f, 0f)),
      (5L, 2, Seq(1f, 0f, 0f)),
      (6L, 2, Seq(0f, 0f, 1f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("drops every later member of a neighborhood, keeps the first") {
    val kept = Vectors.semdedupKeep(vecs, "embedding", "vec_id",
      "label", threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 6L))
  }

  test("threshold above all similarities keeps everything") {
    val noDrop = Vectors.semdedupKeep(vecs, "embedding", "vec_id",
      "label", threshold = 1.1)
    assert(noDrop.count() == 6)
  }

  test("centroidOutliers: farthest-from-mean member ranks first") {
    import spark.implicits._
    // group 1: three vectors near +x and one at -x; the -x vector is
    // the clear outlier. k=1 must return exactly it.
    val g = Seq(
      (1L, 1, Seq(1f, 0.1f, 0f)),
      (2L, 1, Seq(1f, -0.1f, 0f)),
      (3L, 1, Seq(0.9f, 0f, 0.1f)),
      (4L, 1, Seq(-1f, 0f, 0f)),
      (5L, 2, Seq(0f, 1f, 0f)),
      (6L, 2, Seq(0f, 0.9f, 0.2f))
    ).toDF("vec_id", "label", "embedding")
    val got = Vectors.centroidOutliers(g, "embedding", "vec_id",
      "label", k = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got.contains((1, 4L)))
    assert(got.size == 2) // one outlier per group
  }

  test("jlProject: deterministic, right arity, sign-structure sane") {
    import spark.implicits._
    val v = Seq((1L, Seq.fill(8)(1f)), (2L, Seq.fill(8)(1f)),
      (3L, (1 to 8).map(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val p = v.select(col("vec_id"),
      Vectors.jlProject(col("embedding"), 8, 4).as("pv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // arity and determinism: identical inputs project identically
    assert(p(1L).length == 4 && p(1L) == p(2L))
    // ±1 matrix over an all-ones vector: each slot is an integer in
    // [-8, 8] (the column-sum of 8 signs)
    assert(p(1L).forall(x => x == Math.rint(x) && Math.abs(x) <= 8))
    // distinct inputs must not collapse to the same projection
    assert(p(1L) != p(3L))
  }

  test("group boundary is respected even for identical vectors") {
    // ids 1 and 5 are identical but in different groups: both kept
    val kept = Vectors.semdedupKeep(vecs, "embedding", "vec_id",
      "label", threshold = 0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(5L))
  }
}
