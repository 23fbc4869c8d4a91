package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDiffSpec extends SparkSpec {
  import spark.implicits._

  test("incremental merge law: fold of batches == full recompute") {
    val b1 = Seq(("a", 10L), ("a", 5L), ("b", 1L)).toDF("k", "v")
    val b2 = Seq(("a", 2L), ("c", 7L)).toDF("k", "v")
    val b3 = Seq(("b", 4L), ("c", 0L), ("c", 3L)).toDF("k", "v")
    val inc = Incremental.refreshAll(Seq(b1, b2, b3), Seq("k"), col("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val full = Incremental.partial(b1.union(b2).union(b3), Seq("k"), col("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(inc.toSeq === full.toSeq)
    assert(inc.toSeq === Seq(("a", 3L, 17L), ("b", 2L, 5L), ("c", 3L, 10L)))
  }

  test("incremental merge: untouched keys pass through unchanged") {
    val view = Incremental.partial(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), Seq("k"), col("v"))
    val merged = Incremental.merge(view,
      Seq(("b", 8L)).toDF("k", "v"), Seq("k"), col("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged.toSeq === Seq(("a", 1L, 1L), ("b", 2L, 10L)))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
      .toDF("id", "s", "v")
    val neu = Seq((2L, "y", 20L), (3L, "z", 99L), (4L, "w", 40L))
      .toDF("id", "s", "v")
    val diff = Diff.snapshotDiff(old, neu, Seq("id"),
      Seq(col("s"), col("v")))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // id 2 unchanged → absent; 1 removed, 3 changed, 4 added
    assert(diff.toSeq === Seq((1L, "removed"), (3L, "changed"),
      (4L, "added")))
  }

  test("snapshotDiff null column values fingerprint distinctly") {
    val old = Seq[(Long, Option[String])]((1L, Some("x")), (2L, None))
      .toDF("id", "s")
    val neu = Seq[(Long, Option[String])]((1L, None), (2L, None))
      .toDF("id", "s")
    val diff = Diff.snapshotDiff(old, neu, Seq("id"), Seq(col("s")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // id 1: "x" → null is a CHANGE; id 2: null → null is unchanged
    assert(diff.toSeq === Seq((1L, "changed")))
  }
}
