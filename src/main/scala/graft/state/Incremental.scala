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

  /** foreachBatch sink maintaining the partials view in a parquet dir
    * — IDEMPOTENT under micro-batch replay: the view stores the
    * last-applied `batchId` (constant `__last_batch` column), and a
    * batch at or below it is skipped, so a crash between the view
    * write and the streaming checkpoint commit (which replays that
    * batch on restart) cannot double-count. This is the canonical
    * exactly-once-effect recipe for non-transactional foreachBatch
    * sinks; a Delta/JDBC sink would put the same guard in a
    * transaction.
    *
    * The refresh stays DISTRIBUTED end to end: the updated view is
    * written to a SIBLING tmp dir (the write's lineage reads the
    * CURRENT view dir, so there is no read-overwrite cycle and
    * nothing is ever collected to the driver — the view can be
    * arbitrarily many keys), then swapped in with delete + rename.
    *
    * Crash recovery keys off parquet's own job-commit marker: a tmp
    * dir whose write job COMMITTED (`_SUCCESS` present) is always
    * exactly `view ⊕ lastBatch` — no other state can produce one,
    * because every entry adopts or deletes tmp before writing a new
    * one — so adoption unconditionally prefers a committed tmp. That
    * covers every crash point, including a crash HALFWAY through the
    * recursive delete of the old view (a partially deleted old dir
    * can still "have data", so any old-view-is-authoritative rule
    * would resurrect a corrupted view):
    *
    *   - crash mid-tmp-write → no `_SUCCESS` → tmp discarded, old
    *     view intact, batch replays;
    *   - crash after tmp commit (before/during/after the old-view
    *     delete, before the rename) → committed tmp adopted; it
    *     already carries `__last_batch = batchId`, so the replayed
    *     batch hits the idempotency guard;
    *   - crash after the rename → no tmp; nothing to do.
    *
    * At 100 TB the swap would additionally bucket the view by the
    * keys (one-sided merge exchange, see [[merge]]) — layout, not
    * structure. */
  def maintainParquetView(viewDir: String, keys: Seq[String],
                          valueExpr: org.apache.spark.sql.Column)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(viewDir)
    // sibling of the NORMALIZED path — string concat on viewDir
    // would nest tmp INSIDE the view dir for a trailing-slash
    // viewDir, and the swap's delete would then destroy both copies
    val tmp = new org.apache.hadoop.fs.Path(
      path.getParent, path.getName + "__tmp")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // "exists" = has DATA (the StreamIngest/StreamNearDedup hasData
    // pattern): a dir holding only _SUCCESS/_temporary — an empty
    // first write or a crash mid-overwrite — must be treated as
    // absent, or the schema-less read wedges every restart
    def hasData(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) && fs.listStatus(p).exists { st =>
        val nm = st.getPath.getName
        !nm.startsWith("_") && !nm.startsWith(".")
      }
    def committed(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    // adopt-on-entry: a COMMITTED tmp is the updated view (see
    // scaladoc) — swap it in; an uncommitted tmp is a dead write
    if (fs.exists(tmp)) {
      if (committed(tmp)) {
        fs.delete(path, true)
        if (!fs.rename(tmp, path))
          throw new java.io.IOException(
            s"view recovery failed: could not rename $tmp to $path")
      } else fs.delete(tmp, true)
    }
    val existing =
      if (hasData(path)) Some(spark.read.parquet(viewDir)) else None
    // null-safe: a zero-ROW stored view (empty first batch) yields
    // max = null — getLong would NPE and wedge the replay loop
    val lastApplied = existing.flatMap(v =>
      Option(v.agg(max(col("__last_batch"))).head().get(0))
        .map(_.asInstanceOf[Long]))
    if (lastApplied.exists(_ >= batchId)) return // replay: already in
    val updated = existing match {
      case None => partial(batch, keys, valueExpr)
      case Some(view) =>
        merge(view.drop("__last_batch"), batch, keys, valueExpr)
    }
    updated.withColumn("__last_batch", lit(batchId))
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(path, true)
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(
        s"view swap failed: could not rename $tmp to $path")
  }
}
