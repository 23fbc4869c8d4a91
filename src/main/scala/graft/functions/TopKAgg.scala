package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a custom `Aggregator` — the §2.12 UDAF
  * surface (SURVEY.md: "UDAF-shaped … the north-star extensions will
  * need `Aggregator`").
  *
  * Semantics: top `k` (value, id) pairs per group, ordered by value
  * DESC with id ASC as the total tie-break — identical to the
  * `row_number() <= k` window shape (catalog q19).
  *
  * Why it exists next to the window form: aggregation state is
  * BOUNDED at k entries per group *per partial aggregate* — the
  * map-side combine ships at most k rows per group per partition into
  * the shuffle, and merge is k-bounded list fusion. Spark ≥3.5's
  * WindowGroupLimit gives window top-k the same partial truncation,
  * so for a plain per-group top-k the window form is already
  * scale-safe; the Aggregator is the API for top-k-shaped state where
  * a window filter cannot reach — inside another aggregation,
  * `KeyValueGroupedDataset.agg` typed pipelines, or
  * `mapGroupsWithState` streaming state. It also demonstrates the
  * full custom-UDAF machinery (zero/reduce/merge/finish with
  * ExpressionEncoder buffers) that the engine's native expressions
  * (`SigExprs`) cover on the scalar side.
  *
  * The buffer keeps a DESC-sorted list; reduce inserts only if the
  * candidate beats the current k-th (O(1) reject on the hot path —
  * rows below the bar never allocate).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k >= 1, "k must be >= 1")

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
                      in: (Double, Long)): List[(Double, Long)] =
    if (buf.sizeIs >= k && !lt(in, buf.last)) buf
    else (in :: buf).sortWith(lt).take(k)

  override def merge(x: List[(Double, Long)],
                     y: List[(Double, Long)]): List[(Double, Long)] =
    (x ++ y).sortWith(lt).take(k)

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** Column function: `topK(3)(valueCol, idCol)` → array of
    * struct<_1: value double, _2: id bigint>, DESC by value, id
    * tie-break. posexplode the result for (rank, value, id) rows. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    (value, id) => fn(value, id)
  }
}
