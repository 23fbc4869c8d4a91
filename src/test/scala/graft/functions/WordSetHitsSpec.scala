package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity net for the native one-pass membership counter: it must
  * return exactly what the composed
  * `size(filter(toks, t => array_contains(list, t)))` form returns —
  * occurrence counting, multi-list membership, null-token skipping —
  * on both the codegen and interpreted evaluation paths. */
class WordSetHitsSpec extends SparkSpec {
  import spark.implicits._

  private val lists = Seq(
    Seq("the", "la", "shared"),   // 0
    Seq("el", "la", "shared"),    // 1
    Seq.empty[String])            // 2: empty list → always 0

  private def composed(toks: org.apache.spark.sql.Column) =
    lists.map { ws =>
      val wl = array(ws.map(lit): _*)
      size(filter(toks, t => array_contains(wl, t))).cast("long")
    }

  test("native counts == composed filter counts (incl. dups, overlap)") {
    val df = Seq(
      Seq("the", "la", "la", "x", "shared"), // dups + multi-list words
      Seq("x", "y"),                         // zero hits
      Seq.empty[String]                      // empty tokens
    ).toDF("toks")
    val out = df.select(
      WordSetHits.wordSetHits(col("toks"), lists).as("h") +:
        composed(col("toks")).zipWithIndex.map { case (c, i) =>
          c.as(s"c$i") }: _*)
      .collect()
    out.foreach { r =>
      val h = r.getSeq[Long](0)
      assert(h.length === lists.length)
      for (i <- lists.indices)
        assert(h(i) === r.getLong(i + 1), s"list $i diverged on $r")
    }
  }

  test("null tokens are skipped; null array gives null") {
    val df = Seq(
      (1L, Seq[String]("la", null, "the")),
      (2L, null: Seq[String])
    ).toDF("id", "toks")
    val out = df.select(col("id"),
      WordSetHits.wordSetHits(col("toks"), lists).as("h"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) === Seq(2L, 1L, 0L))
    assert(out(1).isNullAt(1))
  }

  test("interpreted eval matches codegen") {
    // interpreted path directly via the helper
    val t = new WordSetHitsHelper.Table(
      lists.map(_.toIndexedSeq).toIndexedSeq)
    val toks = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(
        org.apache.spark.unsafe.types.UTF8String.fromString("la"),
        org.apache.spark.unsafe.types.UTF8String.fromString("shared"),
        org.apache.spark.unsafe.types.UTF8String.fromString("la")))
    // la×2 + shared×1 hit both lists
    val viaHelper = WordSetHitsHelper.compute(toks, t).toLongArray.toSeq
    assert(viaHelper === Seq(3L, 3L, 0L))
    // case-class equality holds across separately-built instances
    // sharing a child (the IndexedSeq convention — an Array lists
    // field would compare referentially and break semanticEquals /
    // subexpression elimination)
    val child = org.apache.spark.sql.graftbridge.GraftBridge
      .expression(col("toks"))
    val e1 = WordSetHits(child, lists.map(_.toIndexedSeq).toIndexedSeq)
    val e2 = WordSetHits(child, lists.map(_.toIndexedSeq).toIndexedSeq)
    assert(e1 == e2)
  }
}
