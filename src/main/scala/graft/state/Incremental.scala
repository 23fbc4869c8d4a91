package graft.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained grouped aggregates (self-maintainable
  * materialized views): the stored view keeps per-key PARTIALS
  * (count + sum), so refreshing with a new batch costs
  * O(batch) + O(touched keys) — the history is NEVER rescanned.
  *
  * This is the batch twin of what Structured Streaming's state store
  * does for `groupBy().agg()` (and of classic self-maintainable-view
  * theory: count/sum are distributive, avg is algebraic over them):
  *
  *   view ⊕ batch  =  combine(view, partial(batch))
  *
  * At 100 TB the difference is structural, not constant-factor: a
  * daily metrics refresh over an append-only event table is one
  * partition's scan + a keys-sized shuffle instead of a full-table
  * re-aggregation. The catalog row (q32) proves the algebra: a fold
  * of month-batches through [[merge]] hash-matches the full-table
  * GROUP BY oracle exactly (integer sums, so combine order can't
  * perturb the result).
  *
  * Deletes/retractions: for append-only sources (the reference's
  * block stream) they don't arise; a CDC source would carry a ±1 sign
  * column — multiply it into `n` and the value before [[partial]] and
  * the same combine maintains the view (counts are then net counts).
  */
object Incremental {

  /** Per-key partials of one batch: `n` (count) + `total` (sum of
    * `valueExpr`, which should be integer-typed for exact
    * order-independent combining — quantize doubles first). */
  def partial(batch: DataFrame, keys: Seq[String],
              valueExpr: org.apache.spark.sql.Column): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valueExpr).as("total"))

  /** Combine the stored view with one new batch. Both sides are in
    * partials form after [[partial]]; combining is itself a partial
    * aggregation (map-side combine applies), and the shuffle is keyed
    * the same as the view — a co-partitioned stored layout (bucketed
    * by the keys) makes the exchange one-sided. */
  def merge(view: DataFrame, batch: DataFrame, keys: Seq[String],
            valueExpr: org.apache.spark.sql.Column): DataFrame =
    view.unionByName(partial(batch, keys, valueExpr))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))

  /** Fold a sequence of batches through the view — the replay/backfill
    * path. Equivalent to `partial(union of batches)` by the combine
    * law; spec + catalog row assert exactly that. */
  def refreshAll(batches: Seq[DataFrame], keys: Seq[String],
                 valueExpr: org.apache.spark.sql.Column): DataFrame = {
    require(batches.nonEmpty, "refreshAll needs at least one batch")
    batches.tail.foldLeft(partial(batches.head, keys, valueExpr))(
      (view, b) => merge(view, b, keys, valueExpr))
  }
}
